"""Tests for the upfirdn resampling ops (vs the reference's pure-PyTorch
upfirdn2d_native fallback, op/upfirdn2d.py:171-212)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# upfirdn resampling vs reference torch fallback
# ---------------------------------------------------------------------------

def _torch_upfirdn2d_native(input, kernel, up_x, up_y, down_x, down_y,
                            pad_x0, pad_x1, pad_y0, pad_y1):
    """The reference's CPU fallback (op/upfirdn2d.py:171-212), reproduced
    numerically with torch ops for golden comparison."""
    _, channel, in_h, in_w = input.shape
    input = input.reshape(-1, in_h, in_w, 1)
    _, in_h, in_w, minor = input.shape
    kernel_h, kernel_w = kernel.shape

    out = input.view(-1, in_h, 1, in_w, 1, minor)
    out = torch.nn.functional.pad(out, [0, 0, 0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.view(-1, in_h * up_y, in_w * up_x, minor)

    out = torch.nn.functional.pad(
        out, [0, 0, max(pad_x0, 0), max(pad_x1, 0), max(pad_y0, 0), max(pad_y1, 0)])
    out = out[:, max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
              max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]

    out = out.permute(0, 3, 1, 2)
    out = out.reshape([-1, 1, in_h * up_y + pad_y0 + pad_y1,
                       in_w * up_x + pad_x0 + pad_x1])
    w = torch.flip(kernel, [0, 1]).view(1, 1, kernel_h, kernel_w)
    out = torch.nn.functional.conv2d(out, w)
    out = out.reshape(-1, minor, in_h * up_y + pad_y0 + pad_y1 - kernel_h + 1,
                      in_w * up_x + pad_x0 + pad_x1 - kernel_w + 1)
    out = out.permute(0, 2, 3, 1)
    out = out[:, ::down_y, ::down_x, :]
    return out.reshape(-1, channel, out.shape[1], out.shape[2])


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)),
                                         (1, 2, (1, 1))])
def test_upfirdn2d_parity(rng, up, down, pad):
    from buddy_tpu.ops.resample import upfirdn2d

    x = rng.standard_normal((2, 3, 8, 10)).astype(np.float32)  # NCHW
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32) / 64

    ref = _torch_upfirdn2d_native(torch.from_numpy(x), torch.from_numpy(k),
                                  up, up, down, down,
                                  pad[0], pad[1], pad[0], pad[1]).numpy()
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    out = upfirdn2d(x_nhwc, jnp.asarray(k), up=up, down=down, pad=pad)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fir_upsample_downsample_roundtrip(rng):
    """FIR up then down recovers a smooth signal approximately."""
    from buddy_tpu.ops.resample import upsample_2d, downsample_2d

    x = jnp.asarray(np.ones((1, 8, 8, 4), np.float32))
    u = upsample_2d(x)
    assert u.shape == (1, 16, 16, 4)
    d = downsample_2d(u)
    assert d.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(d)[0, 2:-2, 2:-2], 1.0, atol=1e-3)


def test_up2_conv3x3_fused_matches_naive(rng):
    """Fused lhs-dilated up2+conv3x3 == conv3x3(pad1)(nearest_up2(x)),
    values AND input grads, at float tolerance."""
    from buddy_tpu.models.layers import naive_upsample_2d
    from buddy_tpu.ops.resample import up2_conv3x3

    x = jnp.asarray(rng.standard_normal((2, 5, 7, 6)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 6, 4)) * 0.3
                     ).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def naive(xx, ww, bb):
        u = naive_upsample_2d(xx)
        return jax.lax.conv_general_dilated(
            u, ww, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + bb

    want = naive(x, w, b)
    got = up2_conv3x3(x, w, b)
    assert got.shape == want.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    g = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
    gn = jax.grad(lambda *a: jnp.sum(naive(*a) * g), argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(lambda *a: jnp.sum(up2_conv3x3(*a) * g),
                  argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-4, rtol=2e-4)


def test_up2_conv1x1_fused_matches_naive(rng):
    from buddy_tpu.models.layers import naive_upsample_2d
    from buddy_tpu.ops.resample import up2_conv1x1

    x = jnp.asarray(rng.standard_normal((1, 4, 6, 8)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((1, 1, 8, 3)) * 0.5
                     ).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(
        naive_upsample_2d(x), w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=dn)
    got = up2_conv1x1(x, w, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_resblock_fuse_up_parity(rng):
    """ResnetBlockBigGANpp(up=True, fuse_up=True) reuses the same param tree
    and reproduces the naive path output at float tolerance."""
    from buddy_tpu.models.layers import ResnetBlockBigGANpp, get_act

    act = get_act("swish")
    kw = dict(act=act, out_ch=12, up=True, dropout=0.0, skip_rescale=True,
              init_scale=0.0, temb=True)
    naive = ResnetBlockBigGANpp(**kw)
    fused = ResnetBlockBigGANpp(**kw, fuse_up=True)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 16)).astype(np.float32))
    temb = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    params = naive.init(jax.random.PRNGKey(0), x, temb)
    pf = fused.init(jax.random.PRNGKey(0), x, temb)
    assert (jax.tree_util.tree_structure(pf)
            == jax.tree_util.tree_structure(params))
    assert (jax.tree.map(lambda l: l.shape, pf)
            == jax.tree.map(lambda l: l.shape, params))
    a = naive.apply(params, x, temb)
    c = fused.apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                               atol=2e-5, rtol=2e-5)


def test_resblock_fuse_up_qconv_parity(rng):
    """int8 + fuse_up compose: same param tree as the unfused int8 block,
    output within quantization tolerance of the unfused int8 path, and
    STE input-gradients flow (finite, close to the float-fused block's)."""
    from buddy_tpu.models.layers import ResnetBlockBigGANpp, get_act

    act = get_act("swish")
    kw = dict(act=act, out_ch=12, up=True, dropout=0.0, skip_rescale=True,
              init_scale=0.0, temb=True)
    q_naive = ResnetBlockBigGANpp(**kw, qconv=True)
    q_fused = ResnetBlockBigGANpp(**kw, qconv=True, fuse_up=True)
    f_fused = ResnetBlockBigGANpp(**kw, fuse_up=True)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 16)).astype(np.float32) * 0.3)
    temb = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    params = q_naive.init(jax.random.PRNGKey(0), x, temb)
    pf = q_fused.init(jax.random.PRNGKey(0), x, temb)
    assert (jax.tree_util.tree_structure(pf)
            == jax.tree_util.tree_structure(params))

    a = np.asarray(q_naive.apply(params, x, temb))
    c = np.asarray(q_fused.apply(params, x, temb))
    f = np.asarray(f_fused.apply(params, x, temb))
    rel_q = np.linalg.norm(c - a) / np.linalg.norm(a)
    rel_f = np.linalg.norm(c - f) / np.linalg.norm(f)
    assert rel_q < 0.05, rel_q   # two int8 quantization points differ
    assert rel_f < 0.05, rel_f   # and both stay near the float output

    g = jnp.asarray(rng.standard_normal(c.shape).astype(np.float32))
    gq = jax.grad(lambda xx: jnp.sum(q_fused.apply(params, xx, temb) * g))(x)
    gf = jax.grad(lambda xx: jnp.sum(f_fused.apply(params, xx, temb) * g))(x)
    assert np.isfinite(np.asarray(gq)).all()
    rel_g = (np.linalg.norm(np.asarray(gq - gf))
             / np.linalg.norm(np.asarray(gf)))
    assert rel_g < 0.05, rel_g   # STE backward == float-fused adjoint


def test_up2_conv1x1_custom_vjp_matches_plain():
    """up2_conv1x1 (lhs-dilated) and its autodiff adjoints match the plain
    conv1x1(nearest_up2(x)) formulation fwd and grad-wise."""
    from buddy_tpu.models.layers import naive_upsample_2d
    from buddy_tpu.ops.resample import up2_conv1x1
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 16, 12)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((12,)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.standard_normal((2, 12, 16, 12)).astype(np.float32))

    def plain(x, w, b):
        up = naive_upsample_2d(x)
        y = jax.lax.conv_general_dilated(
            up, w, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                up.shape, w.shape, ("NHWC", "HWIO", "NHWC")))
        return y + b

    for fn in (plain, up2_conv1x1):
        np.testing.assert_allclose(np.asarray(fn(x, w, b)),
                                   np.asarray(plain(x, w, b)),
                                   atol=1e-5, rtol=1e-5)
    gx_p, gw_p, gb_p = jax.grad(
        lambda *a: jnp.sum(plain(*a) * g), argnums=(0, 1, 2))(x, w, b)
    gx_c, gw_c, gb_c = jax.grad(
        lambda *a: jnp.sum(up2_conv1x1(*a) * g), argnums=(0, 1, 2))(x, w, b)
    for pa, cu in ((gx_p, gx_c), (gw_p, gw_c), (gb_p, gb_c)):
        np.testing.assert_allclose(np.asarray(cu), np.asarray(pa),
                                   atol=1e-4, rtol=1e-4)


def test_remat_is_exact():
    """network.remat=true (jax.checkpoint over each ResBlock) must leave the
    param pytree, forward output, and input/param grads unchanged — it only
    reschedules the backward (recompute instead of store).  Note: measured
    on-chip remat does NOT fix the batch-16 f32 HBM fit (20.0 GB of temps
    WITH it vs 18.2 without — XLA already remats); exp.grad_accum is the
    lever that fits that config.  remat stays as a general knob."""
    from buddy_tpu.models.ncsnpp import NCSNpp

    kw = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(0,),
              image_size=16)
    net = NCSNpp(**kw)
    net_r = NCSNpp(**kw, remat=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray((rng.standard_normal((1, 1, 16, 32))
                     + 1j * rng.standard_normal((1, 1, 16, 32))
                     ).astype(np.complex64)) * 0.1
    t = jnp.asarray([0.3], jnp.float32)

    params = net.init(jax.random.PRNGKey(0), x, t)
    params_r = net_r.init(jax.random.PRNGKey(0), x, t)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_r))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_allclose(np.asarray(net_r.apply(params, x, t)),
                               np.asarray(net.apply(params, x, t)),
                               atol=1e-6, rtol=1e-6)

    def loss(p, net):
        return jnp.sum(jnp.abs(net.apply(p, x, t)) ** 2)

    g = jax.grad(loss)(params, net)
    g_r = jax.grad(loss)(params_r, net_r)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)
