"""Probe: WPE's per-bin Hermitian solve — complex LU (current) vs real-block
alternatives on the axon backend.

The WPE warm init costs ~260 ms one-time per batch, of which the batched
complex (taps x taps) LU is ~174 ms (xprof r5) — running at ~40 GFLOP/s
(LU is pivot-sequential and the complex kernels are poor on this backend).
A Hermitian system Rx=P is equivalent to the real SPD 2n system
[[Rr,-Ri],[Ri,Rr]][xr;xi] = [Pr;Pi]; real cholesky / real LU may be
implemented better.  Timing: scan-chained in-program reps, min of 3.

Usage: python scripts/tpu_wpe_solve_probe.py   (CPU: correctness only)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

NB = 8 * 257   # batch x bins at the WPE shape (size=512 -> 257 bins)
N = 50         # taps
REPS = int(os.environ.get("PROBE_REPS", "5"))

rng = np.random.default_rng(0)
A = rng.standard_normal((NB, N, 2 * N)).astype(np.float32) / np.sqrt(N)
Rr_np = (A @ A.transpose(0, 2, 1) + np.eye(N, dtype=np.float32)[None] * 1e-3)
S = rng.standard_normal((NB, N, N)).astype(np.float32) / N
Ri_np = (S - S.transpose(0, 2, 1))   # antisymmetric -> R Hermitian
Pr_np = rng.standard_normal((NB, N)).astype(np.float32)
Pi_np = rng.standard_normal((NB, N)).astype(np.float32)


def solve_complex_lu(rr, ri, pr, pi):
    R = jax.lax.complex(rr, ri)
    P = jax.lax.complex(pr, pi)
    return jnp.linalg.solve(R, P[..., None])[..., 0]


def solve_real_lu(rr, ri, pr, pi):
    top = jnp.concatenate([rr, -ri], axis=-1)
    bot = jnp.concatenate([ri, rr], axis=-1)
    M = jnp.concatenate([top, bot], axis=-2)          # (NB, 2N, 2N) SPD
    b = jnp.concatenate([pr, pi], axis=-1)
    x = jnp.linalg.solve(M, b[..., None])[..., 0]
    return jax.lax.complex(x[..., :N], x[..., N:])


def solve_real_chol(rr, ri, pr, pi):
    top = jnp.concatenate([rr, -ri], axis=-1)
    bot = jnp.concatenate([ri, rr], axis=-1)
    M = jnp.concatenate([top, bot], axis=-2)
    b = jnp.concatenate([pr, pi], axis=-1)
    L = jnp.linalg.cholesky(M)
    z = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        L, z, lower=True, trans="T")[..., 0]
    return jax.lax.complex(x[..., :N], x[..., N:])


ref = jax.jit(solve_complex_lu)(Rr_np, Ri_np, Pr_np, Pi_np)
for name, fn in [("real_lu", solve_real_lu), ("real_chol", solve_real_chol)]:
    got = jax.jit(fn)(Rr_np, Ri_np, Pr_np, Pi_np)
    err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))(
        ref, got)
    print(f"{name} rel err vs complex LU: {float(err):.3e}", flush=True)


def chain(body):
    def run(rr, ri, pr, pi):
        def step(c, _):
            x = body(rr + c * 1e-12, ri, pr, pi)
            return c + jnp.real(jnp.sum(x)) * 1e-12, None
        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=REPS)
        return c
    return jax.jit(run)


args = [jax.device_put(a) for a in (Rr_np, Ri_np, Pr_np, Pi_np)]
for name, fn in [("complex_lu", solve_complex_lu), ("real_lu", solve_real_lu),
                 ("real_chol", solve_real_chol)]:
    f = chain(fn)
    try:
        out = f(*args)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} {best / REPS * 1e3:8.2f} ms/solve-batch", flush=True)
    except Exception as e:
        print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
print("done", flush=True)
