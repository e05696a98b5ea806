"""int8 quantized convolution path (ops/qconv.py + network.quantize_int8).

Checks the quantization math against a numpy oracle, the STE gradient
contract (adjoints == the un-quantized conv's), nn.Conv parameter-name
compatibility, and bounded output drift of a full quantized U-Net forward
vs its f32 twin (same params).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from buddy_tpu.ops.qconv import QConv, quantized_conv


def _conv_ref(x, w, b, strides=(1, 1)):
    """numpy oracle of the quantized conv (SAME padding)."""
    s_x = np.abs(x).max() / 127.0 + 1e-12
    x_q = np.clip(np.round(x / s_x), -127, 127)
    s_w = np.abs(w).max(axis=(0, 1, 2)) / 127.0 + 1e-12
    w_q = np.clip(np.round(w / s_w), -127, 127)
    B, H, W, Ci = x.shape
    kh, kw, _, Co = w.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x_q, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((B, H, W, Co))
    for i in range(kh):
        for j in range(kw):
            out += np.einsum("bhwc,co->bhwo",
                             xp[:, i:i + H, j:j + W, :], w_q[i, j])
    return out * (s_x * s_w) + b


def test_quantized_conv_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 5, 8)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 8, 4)) * 0.2).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    got = quantized_conv((1, 1), ((1, 1), (1, 1)), "int32", False, (1, 1),
                         jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), None)
    want = _conv_ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_quantized_conv_accuracy_vs_f32():
    """Quantization error of one conv stays ~1% for well-scaled inputs."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 16, 16)) * 0.1).astype(np.float32)
    b = np.zeros(16, np.float32)
    q = np.asarray(quantized_conv((1, 1), ((1, 1), (1, 1)), "int32", False, (1, 1),
                                  jnp.asarray(x), jnp.asarray(w),
                                  jnp.asarray(b), None))
    f = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))) + b)
    rel = np.linalg.norm(q - f) / np.linalg.norm(f)
    assert rel < 0.02, rel


def test_ste_gradients_match_plain_conv():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 5, 5, 6)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 6, 3)) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 5, 5, 3)).astype(np.float32))

    def loss_q(x, w, b):
        return jnp.sum(quantized_conv((1, 1), ((1, 1), (1, 1)), "int32", False, (1, 1),
                                       x, w, b, None) * g)

    def loss_f(x, w, b):
        dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                         dimension_numbers=dn) + b
        return jnp.sum(y * g)

    gq = jax.grad(loss_q, argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gq, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-5)


def test_qconv_param_names_match_nn_conv():
    import flax.linen as nn
    x = jnp.ones((1, 4, 4, 3))
    q = QConv(5, (3, 3), padding=((1, 1), (1, 1)))
    c = nn.Conv(5, (3, 3), padding=((1, 1), (1, 1)))
    pq = q.init(jax.random.PRNGKey(0), x)
    pc = c.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pc)
    shapes = lambda t: jax.tree.map(lambda l: l.shape, t)
    assert shapes(pq) == shapes(pc)


@pytest.mark.parametrize("dtype", [None, "bfloat16"])
def test_quantized_unet_forward_bounded_drift(dtype):
    """Full tiny U-Net: int8 output stays close to the f32/bf16 twin with
    identical params (quantization must not change the param pytree)."""
    from buddy_tpu.models.ncsnpp import NCSNpp

    kw = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(0,),
              image_size=16, compute_dtype=dtype)
    net_f = NCSNpp(**kw)
    net_q = NCSNpp(**kw, quantize_int8=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.standard_normal((1, 1, 16, 32))
                     + 1j * rng.standard_normal((1, 1, 16, 32))
                     ).astype(np.complex64)) * 0.1
    t = jnp.asarray([0.3], jnp.float32)
    params = net_f.init(jax.random.PRNGKey(0), x, t)
    out_f = np.asarray(net_f.apply(params, x, t))
    out_q = np.asarray(net_q.apply(params, x, t))
    rel = np.linalg.norm(out_q - out_f) / (np.linalg.norm(out_f) + 1e-12)
    assert np.isfinite(out_q).all()
    # random-init net: per-conv ~1% quant noise compounds over depth; the
    # gate catches wiring errors (wrong scales explode this to >>1)
    assert rel < 0.25, rel

    grad_f = jax.grad(lambda xx: jnp.sum(jnp.abs(net_f.apply(params, xx, t)) ** 2))(x)
    grad_q = jax.grad(lambda xx: jnp.sum(jnp.abs(net_q.apply(params, xx, t)) ** 2))(x)
    g_rel = (np.linalg.norm(np.asarray(grad_q - grad_f))
             / (np.linalg.norm(np.asarray(grad_f)) + 1e-12))
    assert np.isfinite(np.asarray(grad_q)).all()
    assert g_rel < 0.5, g_rel


@pytest.mark.parametrize("accum", ["bfloat16", "float32"])
def test_accum_dtype_close_to_int32(accum):
    """Low-precision dequant-inside-conv stays within bf16 rounding of the
    exact int32 accumulation (the int8 products are exact in the MXU; only
    the final convert differs)."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 16, 16)) * 0.1).astype(np.float32)
    exact = np.asarray(quantized_conv(
        (1, 1), ((1, 1), (1, 1)), "int32", False, (1, 1),
        jnp.asarray(x), jnp.asarray(w), None, None))
    got = np.asarray(quantized_conv(
        (1, 1), ((1, 1), (1, 1)), accum, False, (1, 1),
        jnp.asarray(x), jnp.asarray(w), None, None), np.float32)
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < (6e-3 if accum == "bfloat16" else 1e-6), rel


@pytest.mark.parametrize("ks,pad", [((3, 3), ((1, 1), (1, 1))),
                                    ((1, 1), "SAME")])
def test_bwd_quant_adjoint_close_to_plain(ks, pad):
    """int8 dL/dx (g conv w-flipped) tracks the exact adjoint within
    quantization noise; dw/db stay exact (still the plain adjoints)."""
    rng = np.random.default_rng(5)
    kh, kw = ks
    x = jnp.asarray(rng.standard_normal((1, 6, 7, 8)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((kh, kw, 8, 4)) * 0.2
                     ).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 6, 7, 4)).astype(np.float32))

    def loss(bwd):
        return lambda xx, ww, bb: jnp.sum(quantized_conv(
            (1, 1), pad, "int32", bwd, (1, 1), xx, ww, bb, None) * g)

    dq = jax.grad(loss(True), argnums=(0, 1, 2))(x, w, b)
    df = jax.grad(loss(False), argnums=(0, 1, 2))(x, w, b)
    rel = (np.linalg.norm(np.asarray(dq[0] - df[0]))
           / np.linalg.norm(np.asarray(df[0])))
    assert rel < 0.02, rel
    for a, c in zip(dq[1:], df[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-5)


def test_static_scale_calibration_per_channel():
    """Calibration observes per-input-channel |x| maxima; the static apply
    (scales folded into the weights) must quantize at least as accurately
    as the dynamic per-tensor path on the same input."""
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 8, 8, 8)).astype(np.float32)
    # give channels wildly different ranges — the case per-channel wins
    x = x * (10.0 ** np.linspace(-2, 1, 8, dtype=np.float32))[None, None, None]
    x = jnp.asarray(x)
    dyn = QConv(4, (3, 3), padding=((1, 1), (1, 1)))
    sta = QConv(4, (3, 3), padding=((1, 1), (1, 1)), static_scale=True)
    variables = sta.init(jax.random.PRNGKey(0), x)
    assert variables["quant"]["a_scale"].shape == (8,)
    assert float(jnp.max(jnp.abs(variables["quant"]["a_scale"]))) == 0.0
    # calibrate: one observing pass records the per-channel maxima
    _, mut = sta.apply(variables, x, mutable=["quant"])
    np.testing.assert_allclose(
        np.asarray(mut["quant"]["a_scale"]),
        np.asarray(jnp.max(jnp.abs(x), axis=(0, 1, 2))), rtol=1e-6)
    out_sta = sta.apply({"params": variables["params"],
                         "quant": mut["quant"]}, x)
    out_dyn = dyn.apply({"params": variables["params"]}, x)
    # float reference: plain conv with the same kernel
    w = variables["params"]["kernel"]
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))
    err = lambda a: float(jnp.linalg.norm(a - ref) / jnp.linalg.norm(ref))
    e_sta, e_dyn = err(out_sta), err(out_dyn)
    assert e_sta < 0.02, e_sta
    # per-channel calibrated scales (smooth-quant alpha=0.5) should beat
    # per-tensor dynamic on channel-heterogeneous inputs (measured ~0.55x)
    assert e_sta < 0.75 * e_dyn, (e_sta, e_dyn)


def test_network_calibrate_quant_roundtrip():
    """NetworkBundle.calibrate_quant fills every QConv's a_scale; the
    static-scale forward stays close to the dynamic one on the same data."""
    import os
    from buddy_tpu.models.ncsnpp import NCSNpp
    from buddy_tpu.models import NetworkBundle

    kw = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(0,),
              image_size=16, quantize_int8=True)
    rng = np.random.default_rng(7)
    x = jnp.asarray((rng.standard_normal((1, 1, 16, 32))
                     + 1j * rng.standard_normal((1, 1, 16, 32))
                     ).astype(np.complex64)) * 0.1
    t = jnp.asarray([0.3], jnp.float32)

    os.environ["BUDDY_PARAM_CACHE"] = "0"
    try:
        dyn = NetworkBundle(NCSNpp(**kw))
        dyn.init(jax.random.PRNGKey(0), x, t)
        sta = NetworkBundle(NCSNpp(**kw, quantize_static=True))
        sta.init(jax.random.PRNGKey(0), x, t)
    finally:
        os.environ.pop("BUDDY_PARAM_CACHE")
    scales = jax.tree.leaves(sta.params["quant"])
    assert len(scales) > 0
    assert all((np.asarray(s) == 0.0).all() for s in scales)

    sta.calibrate_quant([x], [t])
    scales = jax.tree.leaves(sta.params["quant"])
    assert all((np.asarray(s) > 0.0).all() for s in scales)

    out_dyn = np.asarray(dyn(x, t))
    out_sta = np.asarray(sta(x, t))
    rel = (np.linalg.norm(out_sta - out_dyn)
           / (np.linalg.norm(out_dyn) + 1e-12))
    # same data as calibration: scales match the dynamic per-layer maxima
    # only for the first conv; downstream activations shift slightly
    assert np.isfinite(out_sta).all()
    assert rel < 0.05, rel
