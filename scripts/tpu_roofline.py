"""Roofline / MFU report for the flagship programs on the attached TPU.

Prints, for the B-utterance bf16 serving config:
  * XLA cost-analysis FLOPs + bytes for denoiser fwd and fwd+vjp,
  * measured wall time per compiled call (min over reps),
  * achieved FLOP rate, MFU vs the chip's bf16 peak, and the compute/memory
    rooflines for one blind-DPS step,
  * the implied RTF ceiling for the T-step blind program.

Usage: python scripts/tpu_roofline.py [B] [T] [peak_tflops] [hbm_gbps]
(defaults: 8 50 197 819 — TPU v5e.)
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle
from buddy_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
T = int(sys.argv[2]) if len(sys.argv) > 2 else 50
PEAK_TFLOPS = float(sys.argv[3]) if len(sys.argv) > 3 else 197.0
HBM_GBPS = float(sys.argv[4]) if len(sys.argv) > 4 else 819.0
AUDIO_LEN = 65536
SR = 16000

args = compose("conf_VCTK.yaml", ["network.compute_dtype=bfloat16"])
module = instantiate(args["network"])
edm = instantiate(args["diff_params"])
network = NetworkBundle(module)
network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, AUDIO_LEN)), jnp.zeros((1,)))
print("net ready", flush=True)

x = jnp.zeros((B, AUDIO_LEN))
sigma = jnp.full((B,), 0.3)


def fwd(params, xx, sig):
    net = lambda z, cn: module.apply(params, z, cn)
    return edm.denoiser(xx[:, None, :], net, sig)[:, 0, :]


def fwdbwd(params, xx, sig):
    return jax.grad(lambda z: jnp.sum(fwd(params, z, sig) ** 2))(xx)


def report(name, fn):
    c = jax.jit(fn).lower(network.params, x, sigma).compile()
    ca = c.cost_analysis()
    tf = ca.get("flops", 0.0) / 1e12
    gb = ca.get("bytes accessed", 0.0) / 1e9
    out = c(network.params, x, sigma)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = c(network.params, x, sigma)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 5)
    mfu = tf / best / PEAK_TFLOPS
    print(f"{name}: {tf:.2f} TFLOP, {gb:.1f} GB, {best*1e3:.1f} ms "
          f"-> {tf/best:.0f} TFLOP/s ({100*mfu:.0f}% MFU)", flush=True)
    return tf, gb, best


tf_f, gb_f, t_f = report(f"denoiser fwd     (B={B})", fwd)
tf_b, gb_b, t_b = report(f"denoiser fwd+vjp (B={B})", fwdbwd)

sol_compute = tf_b / PEAK_TFLOPS
sol_memory = gb_b / HBM_GBPS
audio_s = B * AUDIO_LEN / SR
print(f"\nper blind step (~= fwd+vjp): compute floor {sol_compute*1e3:.0f} ms, "
      f"memory floor {sol_memory*1e3:.0f} ms")
print(f"T={T} blind program: RTF ceiling = "
      f"{audio_s / (T * max(sol_compute, sol_memory)):.1f}x "
      f"(achieved fwd+vjp alone -> {audio_s / (T * t_b):.1f}x)")
