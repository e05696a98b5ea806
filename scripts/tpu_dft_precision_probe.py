"""Probe: cost of the DFT matmul shapes at DEFAULT/HIGH/HIGHEST precision.

The r3 trace showed the ops/dft.py matmuls costing ~42 ms/step at
Precision.HIGHEST — as much as the FFTs they replaced.  This times the two
dominant shapes (per-frame 1024-point STFT, 625-point frame conv) at each
precision with the chained-loop + scalar-readback methodology
(block_until_ready does not sync through the tunnel).

Usage: python scripts/tpu_dft_precision_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

K1, K2 = 4, 28

# (M, K, N): real matmul pairs the dft module issues (x2 for cos+sin,
# x4 for complex-complex)
SHAPES = [
    ("stft_frames", 4160, 1024, 513),
    ("conv_inverse", 4104, 625, 520),
    ("conv_forward", 4104, 100, 625),
]

PRECS = [("default", jax.lax.Precision.DEFAULT),
         ("high", jax.lax.Precision.HIGH),
         ("highest", jax.lax.Precision.HIGHEST)]


def run(tag, M, K, N, pname, prec):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    W = jnp.asarray((rng.standard_normal((K, N)) * (K ** -0.5))
                    .astype(np.float32))
    P = jnp.asarray((rng.standard_normal((N, K)) * (N ** -0.5))
                    .astype(np.float32))

    def chained(k, x):
        def body(_, h):
            y = jnp.matmul(h, W, precision=prec)   # the probed matmul
            return jnp.matmul(y, P, precision=prec)  # back to (M, K)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    fns = {k: jax.jit(lambda xx, kk=k: chained(kk, xx)) for k in (K1, K2)}
    try:
        for k in (K1, K2):
            float(fns[k](x))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"shape": tag, "prec": pname,
                          "error": str(e)[:120]}), flush=True)
        return
    ts = {}
    for k in (K1, K2):
        reps = [0.0] * 3
        for i in range(3):
            t0 = time.perf_counter()
            float(fns[k](x))
            reps[i] = time.perf_counter() - t0
        ts[k] = min(reps)
    per_iter = (ts[K2] - ts[K1]) / (K2 - K1)  # = probed matmul + return mm
    flops = 2 * M * K * N * 2                  # both matmuls per iteration
    print(json.dumps({"shape": tag, "prec": pname,
                      "ms_per_pair": round(per_iter * 1e3, 3),
                      "tflops": round(flops / per_iter / 1e12, 1)}),
          flush=True)


for tag, M, K, N in SHAPES:
    for pname, prec in PRECS:
        run(tag, M, K, N, pname, prec)
print("done", flush=True)
