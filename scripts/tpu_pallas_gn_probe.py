"""Probe: Pallas two-kernel GroupNorm+SiLU forward vs the XLA formulation.

Round-4 profile truth: GN costs ~13 ms/step of the U-Net forward while its
pure-bandwidth floor is ~2.8 ms — XLA's reduce/elementwise loops run at
~185 GB/s effective on this backend (4.4x below HBM spec).  This probe
asks whether hand-tiled Pallas streaming kernels (stats pass + normalize
pass, both VMEM-tiled) get closer to spec at the real NCSN++ GN shapes.
Round 1's Pallas GN lost 2.7x end-to-end; this is the measured re-check
with flat (B, S, C) tiling before any integration.

Usage: python scripts/tpu_pallas_gn_probe.py [B]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

# (H, W, C, G) — the NCSN++ GN shapes (num_groups = min(C//4, 32))
SHAPES = [
    (256, 512, 128, 32),
    (128, 256, 256, 32),
    (64, 128, 256, 32),
    (32, 64, 256, 32),
]

TS = 1024  # spatial tile (rows of the flattened (B, S, C) view)


def _stats_kernel(x_ref, out_ref):
    s = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)            # (TS, C)
    su = jnp.sum(xf, axis=0, keepdims=True)      # (1, C)
    sq = jnp.sum(xf * xf, axis=0, keepdims=True)
    acc = jnp.concatenate([su, sq], axis=0)      # (2, C)

    @pl.when(s == 0)
    def _init():
        out_ref[0] = acc

    @pl.when(s != 0)
    def _acc():
        out_ref[0] += acc


def _norm_kernel(x_ref, a_ref, b_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)             # (TS, C)
    y = x * a_ref[0] + b_ref[0]                  # (1, C) broadcast
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def pallas_gn(x, scale, bias, G, eps=1e-6):
    b, h, w, c = x.shape
    s = h * w
    xs = x.reshape(b, s, c)
    n_t = s // TS
    stats = pl.pallas_call(
        _stats_kernel,
        grid=(b, n_t),
        in_specs=[pl.BlockSpec((1, TS, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
    )(xs)
    m_c = stats[:, 0, :] / s
    m2_c = stats[:, 1, :] / s
    m_g = m_c.reshape(b, G, c // G).mean(-1)
    m2_g = m2_c.reshape(b, G, c // G).mean(-1)
    inv_g = jax.lax.rsqrt(m2_g - m_g * m_g + eps)
    inv_c = jnp.repeat(inv_g, c // G, axis=-1)
    mean_c = jnp.repeat(m_g, c // G, axis=-1)
    a = (inv_c * scale[None, :])[:, None, :]            # (b, 1, c) f32
    bb = (bias[None, :] - mean_c * inv_c * scale[None, :])[:, None, :]
    out = pl.pallas_call(
        _norm_kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, TS, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TS, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
    )(xs, a, bb)
    return out.reshape(b, h, w, c)


def xla_gn(x, scale, bias, G, eps=1e-6):
    b, h, w, c = x.shape
    m_c = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
    m2_c = jnp.mean(x * x, axis=(1, 2), dtype=jnp.float32)
    m_g = m_c.reshape(-1, G, c // G).mean(-1)
    m2_g = m2_c.reshape(-1, G, c // G).mean(-1)
    inv_g = jax.lax.rsqrt(m2_g - m_g * m_g + eps)
    inv_c = jnp.repeat(inv_g, c // G, axis=-1)
    mean_c = jnp.repeat(m_g, c // G, axis=-1)
    a = (inv_c * scale[None, :]).astype(x.dtype)
    bb = (bias[None, :] - mean_c * inv_c * scale[None, :]).astype(x.dtype)
    out = x * a[:, None, None, :] + bb[:, None, None, :]
    return jax.nn.silu(out)


def timeit(fn, *a, n=20):
    out = jax.block_until_ready(fn(*a))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def main():
    print(f"B={B} TS={TS}", flush=True)
    for (H, W, C, G) in SHAPES:
        x = (jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C)) * 0.5
             ).astype(jnp.bfloat16)
        scale = jnp.ones((C,), jnp.float32) * 1.3
        bias = jnp.ones((C,), jnp.float32) * 0.1
        REPS = 20

        def chain(fn):
            # chain REPS calls by data dependency inside ONE jit: per-call
            # device time without the ~1.5 ms tunnel dispatch floor
            def run(x, scale, bias):
                def body(c, _):
                    return fn(c, scale, bias, G=G), None
                y, _ = jax.lax.scan(body, x, None, length=REPS)
                return y
            return jax.jit(run)

        fx = chain(xla_gn)
        fp = chain(pallas_gn)
        t_x, ox = timeit(fx, x, scale, bias, n=3)
        t_p, op = timeit(fp, x, scale, bias, n=3)
        t_x, t_p = t_x / REPS, t_p / REPS
        ox = jax.jit(functools.partial(xla_gn, G=G))(x, scale, bias)
        op = jax.jit(functools.partial(pallas_gn, G=G))(x, scale, bias)
        err = jax.jit(lambda a, b: jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))(ox, op)
        gb = (B * H * W * C * 2 * 3) / 1e9  # stats read + norm read/write
        print(f"({H},{W},{C}) xla={t_x:.3f}ms ({gb/t_x*1e3:.0f}GB/s) "
              f"pallas={t_p:.3f}ms ({gb/t_p*1e3:.0f}GB/s) "
              f"maxdiff={float(err):.2e}", flush=True)


if __name__ == "__main__":
    main()
