"""Calibrate int8-vs-f32 divergence of the blind-DPS trajectory by horizon
(CPU) — sets the gates for tests/test_int8.py's e2e test, mirroring the
bf16 methodology of scripts/calibrate_tolerances.py.

Usage: python scripts/calibrate_int8.py [T ...]   (default 2 10)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle
from buddy_tpu.operators.subband import BlindSubbandFiltering

N = 16384
TINY = ["network.nf=8", "network.ch_mult=[1,2]", "network.num_res_blocks=1",
        "network.image_size=256"]


def run(int8: bool, T: int, dtype: str = "null"):
    args = compose("conf_VCTK.yaml", [
        "tester=blind_dereverberation_BUDDy", *TINY,
        f"network.compute_dtype={dtype}",
        f"network.quantize_int8={'true' if int8 else 'false'}",
        f"tester.sampling_params.T={T}",
        "tester.posterior_sampling.warm_initialization.wpe.taps=10",
    ])
    net = NetworkBundle(instantiate(args["network"]))
    net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, N)), jnp.zeros((1,)))
    diff_params = instantiate(args["diff_params"])
    sampler = instantiate(args["tester"]["sampler"], net, diff_params, args)
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.standard_normal((1, N)).astype(np.float32) * 0.05)
    op = BlindSubbandFiltering(args["tester"]["informed_dereverberation"]["op_hp"],
                               sample_rate=16000)
    op.reset(jax.random.PRNGKey(3))
    return np.asarray(sampler.predict_conditional(
        y, op, shape=(1, N), blind=True, rng=jax.random.PRNGKey(4)))


horizons = [int(a) for a in sys.argv[1:]] or [2, 10]
for T in horizons:
    p32 = run(False, T)
    p8 = run(True, T)
    rel = np.linalg.norm(p8 - p32) / (np.linalg.norm(p32) + 1e-12)
    corr = np.corrcoef(p8.ravel(), p32.ravel())[0, 1]
    print(f"T={T}: int8-vs-f32 rel={rel:.4f} corr={corr:.4f}", flush=True)
