"""Probe: are int8 convolutions faster than bf16 on the axon TPU backend?
(VERDICT r2 item 3 — decide the >10x north-star.)

Timing methodology: block_until_ready does NOT reliably sync through the
axon tunnel (a 310-GFLOP conv "finished" in 27 us), so each measurement
chains K data-dependent convs inside one jitted lax.fori_loop and reads one
scalar back (readback is the only true sync).  Per-conv time is
(t(K2) - t(K1)) / (K2 - K1), cancelling dispatch/readback overhead.  Each
iteration also pays one elementwise re-normalization pass (cast back to the
input dtype) — identical across dtypes, so the comparison stays fair.

Usage:  python scripts/tpu_int8_probe.py
Prints one JSON line per (shape, dtype) with per-conv ms and TFLOP/s.
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

K1, K2 = 4, 36

# (B, H, W, C): chained conv3x3 C->C at the dominant NCSN++ resblock shapes
# (production nf=128, ch_mult [1,2,2,2], 4 s utterance -> 256x520 spec, B=8)
SHAPES = [
    (8, 256, 520, 128),
    (8, 128, 260, 256),
    (8, 64, 130, 256),
]

dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))


def chained(k, x, w, in_dtype, acc_dtype):
    def body(_, h):
        out = jax.lax.conv_general_dilated(
            h, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=dn, preferred_element_type=acc_dtype)
        if in_dtype == jnp.int8:
            return jnp.clip(out >> 7, -127, 127).astype(jnp.int8)
        return (out * 0.05).astype(in_dtype)
    h = jax.lax.fori_loop(0, k, body, x)
    if in_dtype == jnp.int8:
        return jnp.sum(h.astype(jnp.int32))
    return jnp.sum(h.astype(jnp.float32))


def run(shape, in_dtype, acc_dtype, tag):
    B, H, W, C = shape
    rng = np.random.default_rng(0)
    if in_dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-50, 50, (B, H, W, C), dtype=np.int8))
        w = jnp.asarray(rng.integers(-8, 8, (3, 3, C, C), dtype=np.int8))
    else:
        x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32),
                        dtype=in_dtype)
        w = jnp.asarray((rng.standard_normal((3, 3, C, C)) * 0.03)
                        .astype(np.float32), dtype=in_dtype)
    fns = {}
    try:
        for k in (K1, K2):
            fns[k] = jax.jit(lambda xx, ww, kk=k: chained(kk, xx, ww,
                                                          in_dtype, acc_dtype))
            float(fns[k](x, w))  # compile + first run
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"shape": shape, "dtype": tag,
                          "error": str(e)[:160]}), flush=True)
        return
    ts = {}
    for k in (K1, K2):
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fns[k](x, w))  # readback = true sync
            reps.append(time.perf_counter() - t0)
        ts[k] = min(reps)
    per_conv = (ts[K2] - ts[K1]) / (K2 - K1)
    flops = 2 * B * H * W * C * C * 9
    print(json.dumps({
        "shape": shape, "dtype": tag, "ms": round(per_conv * 1e3, 3),
        "tflops": round(flops / per_conv / 1e12, 1),
        "t_k1_s": round(ts[K1], 4), "t_k2_s": round(ts[K2], 4)}), flush=True)


for shape in SHAPES:
    run(shape, jnp.bfloat16, jnp.bfloat16, "bf16")
    run(shape, jnp.int8, jnp.int32, "int8")
    run(shape, jnp.float32, jnp.float32, "f32")
print("done", flush=True)
