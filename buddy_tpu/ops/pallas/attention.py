"""Fused spatial self-attention kernel (U-Net bottleneck).

The reference materializes the full (H*W)^2 attention tensor through two
einsums + softmax (layerspp.py:82-86) — O(N^2) HBM traffic.  This kernel
keeps K/V resident in VMEM and streams query tiles, computing
softmax(QK^T/sqrt(C)) V per tile without ever writing the score matrix to
HBM.  At bottleneck sizes (N ~ 2k, C = 256) K/V fit comfortably in VMEM, so
no online-softmax pass is needed.

Differentiation: wrapped in jax.custom_vjp with a recompute-based backward
(scores are cheap to recompute; residuals are just q, k, v).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[0]          # (TQ, C)
    k = k_ref[0]          # (N, C)
    v = v_ref[0]          # (N, C)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (TQ, N)
    n = scores.shape[-1]
    if n_valid < n:  # mask padded keys
        key_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(key_ids < n_valid, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _attention_nd(q, k, v, scale, *, tile_q: int = 256):
    """q,k,v: (B, N, C) -> (B, N, C)."""
    B, N, C = q.shape
    Np = _round_up(N, tile_q)
    if Np != N:
        pad = [(0, 0), (0, Np - N), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    grid = (B, Np // tile_q)
    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, n_valid=N),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v)
    return out[:, :N, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_core(q, k, v, scale):
    return _attention_nd(q, k, v, scale)


def _reference_attention(q, k, v, scale):
    scores = jnp.einsum("bnc,bmc->bnm", q, k) * scale
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", p, v)


def _attention_fwd(q, k, v, scale):
    return _attention_nd(q, k, v, scale), (q, k, v)


def _attention_bwd(scale, res, g):
    # recompute-based backward via the reference einsum formulation (XLA
    # fuses it well; the forward saves the HBM traffic on the hot path)
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_attention(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


_attention_core.defvjp(_attention_fwd, _attention_bwd)


def spatial_attention(q, k, v, *, scale: float) -> jax.Array:
    """(B, H, W, C) spatial attention over the flattened H*W positions,
    numerically matching AttnBlockpp's einsum-softmax-einsum."""
    B, H, W, C = q.shape
    out = _attention_core(q.reshape(B, H * W, C), k.reshape(B, H * W, C),
                          v.reshape(B, H * W, C), scale)
    return out.reshape(B, H, W, C)
