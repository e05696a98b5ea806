"""Time U-Net forward variants: baseline, pallas-fused, bf16."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle
from buddy_tpu.diffusion.edm import EDM

AUDIO_LEN = 65536


def timeit(name, fn, *a, n=10):
    out = fn(*a)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)


x = jax.random.normal(jax.random.PRNGKey(1), (1, AUDIO_LEN)) * 0.05

for variant in sys.argv[1:] or ["base", "bf16"]:
    overrides = []
    if variant == "bf16":
        overrides = ["network.compute_dtype=bfloat16"]
    args = compose("conf_VCTK.yaml", overrides)
    module = instantiate(args["network"])
    edm = EDM(sde_hp=dict(args["diff_params"]["sde_hp"]))
    network = NetworkBundle(module)
    network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, AUDIO_LEN)), jnp.zeros((1,)))

    @jax.jit
    def fwd(params, xx):
        net = lambda z, cn: module.apply(params, z, cn)
        return edm.denoiser(xx[:, None, :], net, jnp.float32(0.3))[:, 0, :]

    timeit(f"fwd_{variant}", fwd, network.params, x)

    @jax.jit
    def fwdbwd(params, xx):
        def f(z):
            net = lambda zz, cn: module.apply(params, zz, cn)
            return jnp.sum(edm.denoiser(z[:, None, :], net, jnp.float32(0.3)) ** 2)
        return jax.grad(f)(xx)

    timeit(f"fwdbwd_{variant}", fwdbwd, network.params, x)
