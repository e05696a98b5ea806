"""Fused GroupNorm + activation Pallas kernels.

Every ResBlock in NCSN++ runs GroupNorm -> (+temb) -> SiLU twice
(layerspp.py:243-264).  This module fuses the normalize+affine+activation
chain into a single streaming kernel so the activation tensor makes exactly
two HBM reads (stats pass, normalize pass) and one write — no intermediate
tensors between the three ops.

Layout: NHWC flattened to (B, N, C) with channels on lanes; rows are tiled
through VMEM, so arbitrarily large feature maps (the 256x528 top level)
never exceed VMEM.  Groups are contiguous channel blocks (torch GroupNorm
semantics).  Backward: recompute-based custom VJP via the pure-JAX
formulation (XLA fuses the backward well; the forward is the hot path in
sampling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _stats_kernel(x_ref, sums_ref, *, n_rows: int, tile: int):
    """Per-(batch, row-tile): per-channel sum and sum-of-squares."""
    rows = x_ref[0].astype(jnp.float32)  # (tile, C)
    i = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0) + i * tile
    rows = jnp.where(row_ids < n_rows, rows, 0.0)
    sums_ref[0, 0, 0] = jnp.sum(rows, axis=0)
    sums_ref[0, 0, 1] = jnp.sum(rows * rows, axis=0)


def _norm_kernel(x_ref, a_ref, b_ref, o_ref, *, act: str | None):
    out = x_ref[0].astype(jnp.float32) * a_ref[0] + b_ref[0]
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _gn_reference(x, scale, bias, num_groups, epsilon, act):
    shape = x.shape
    c = shape[-1]
    g = num_groups
    xg = x.reshape(shape[:-1] + (g, c // g))
    axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = xg.mean(axis=axes, keepdims=True)
    var = xg.var(axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + epsilon)
    out = xg.reshape(shape) * scale + bias
    if act == "silu":
        out = jax.nn.silu(out)
    return out


def _gn_forward_impl(x, scale, bias, num_groups, epsilon, act):
    B, H, W, C = x.shape
    N = H * W
    tile = min(_round_up(N, 8), 1024)
    Np = _round_up(N, tile)
    n_tiles = Np // tile
    xr = x.reshape(B, N, C)
    if Np != N:
        xr = jnp.pad(xr, ((0, 0), (0, Np - N), (0, 0)))

    sums = pl.pallas_call(
        functools.partial(_stats_kernel, n_rows=N, tile=tile),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 2, C), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xr)

    cpg = C // num_groups
    s = sums[:, :, 0, :].sum(axis=1).reshape(B, num_groups, cpg).sum(-1)
    ss = sums[:, :, 1, :].sum(axis=1).reshape(B, num_groups, cpg).sum(-1)
    count = float(N * cpg)
    mean = s / count                      # (B, G)
    var = ss / count - mean * mean
    inv = jax.lax.rsqrt(var + epsilon)
    mean_c = jnp.repeat(mean, cpg, axis=-1)   # (B, C)
    inv_c = jnp.repeat(inv, cpg, axis=-1)
    a = inv_c * scale[None, :]
    b = bias[None, :] - mean_c * a

    out = pl.pallas_call(
        functools.partial(_norm_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bb, i: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bb, i: (bb, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
    )(xr, a, b)
    return out[:, :N, :].reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_act(x, scale, bias, num_groups: int, epsilon: float = 1e-6,
                         act: str | None = None):
    """GroupNorm (+ optional SiLU) on (B, H, W, C), fused on TPU."""
    return _gn_forward_impl(x, scale, bias, num_groups, epsilon, act)


def _gn_fwd(x, scale, bias, num_groups, epsilon, act):
    return _gn_forward_impl(x, scale, bias, num_groups, epsilon, act), (x, scale, bias)


def _gn_bwd(num_groups, epsilon, act, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _gn_reference(x_, s_, b_, num_groups, epsilon, act),
        x, scale, bias)
    return vjp(g)


fused_group_norm_act.defvjp(_gn_fwd, _gn_bwd)
