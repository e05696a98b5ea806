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
    got = quantized_conv((1, 1), ((1, 1), (1, 1)),
                         jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    want = _conv_ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_quantized_conv_accuracy_vs_f32():
    """Quantization error of one conv stays ~1% for well-scaled inputs."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 16, 16)) * 0.1).astype(np.float32)
    b = np.zeros(16, np.float32)
    q = np.asarray(quantized_conv((1, 1), ((1, 1), (1, 1)),
                                  jnp.asarray(x), jnp.asarray(w),
                                  jnp.asarray(b)))
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
        return jnp.sum(quantized_conv((1, 1), ((1, 1), (1, 1)), x, w, b) * g)

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
