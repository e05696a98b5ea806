"""Bisect within the informed guided step on the axon backend."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle
from buddy_tpu.diffusion.edm import EDM
from buddy_tpu.operators.subband import BlindSubbandFiltering
from buddy_tpu.losses import get_loss


def step(name, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{name}: OK ({time.time()-t0:.0f}s)", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:100]}", flush=True)
        return False


AUDIO_LEN = 65536
args = compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy"])
op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
op = BlindSubbandFiltering(op_hp, sample_rate=16000)
op.reset(jax.random.PRNGKey(0))
module = instantiate(args["network"])
edm = EDM(sde_hp=dict(args["tester"]["sampling_params"]["sde_hp"]))
network = NetworkBundle(module)
network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, AUDIO_LEN)), jnp.zeros((1,)))
print("init done", flush=True)

rec = get_loss(args["tester"]["posterior_sampling"]["rec_loss"], operator=op)
x_hat = jnp.ones((1, AUDIO_LEN)) * 0.01
y = jax.jit(lambda xx, H: op.degradation(xx, H=H, mode="waveform"))(x_hat, op.H)
t_hat = jnp.float32(0.5)


def denoise(params, xh):
    net = lambda xx, cn: module.apply(params, xx, cn)
    return edm.denoiser(xh[:, None, :], net, t_hat)[:, 0, :]


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "a"):
    def no_guidance(params, xh, H):
        xd, vjp = jax.vjp(lambda z: denoise(params, z), xh)
        d = (xh - jax.lax.stop_gradient(xd)) / t_hat
        return xh + 0.1 * d
    step("a_no_guidance_vjp", lambda: jax.jit(no_guidance)(network.params, x_hat, op.H))

if which in ("all", "b"):
    def manual_vjp_guidance(params, xh, H, yy):
        xd, vjp = jax.vjp(lambda z: denoise(params, z), xh)
        g_xd = jax.grad(lambda z: rec(yy, op.degradation(z, H=H, mode="waveform")))(xd)
        g = vjp(g_xd)[0]
        ng = jnp.linalg.norm(g) / (AUDIO_LEN ** 0.5)
        return xh + 0.5 / (ng + 1e-8) * g
    step("b_manual_vjp_guidance", lambda: jax.jit(manual_vjp_guidance)(
        network.params, x_hat, op.H, y))

if which in ("all", "c"):
    def composed_guidance(params, xh, H, yy):
        def full(z):
            xd = denoise(params, z)
            return rec(yy, op.degradation(xd, H=H, mode="waveform")), xd
        g, xd = jax.grad(full, has_aux=True)(xh)
        ng = jnp.linalg.norm(g) / (AUDIO_LEN ** 0.5)
        return xh + 0.5 / (ng + 1e-8) * g
    step("c_composed_guidance", lambda: jax.jit(composed_guidance)(
        network.params, x_hat, op.H, y))

if which in ("all", "d"):
    def ingraph_H_guidance(params, xh, pdict, yy):
        H = jax.lax.stop_gradient(op.compute_H(pdict))
        xd, vjp = jax.vjp(lambda z: denoise(params, z), xh)
        g_xd = jax.grad(lambda z: rec(yy, op.degradation(z, H=H, mode="waveform")))(xd)
        g = vjp(g_xd)[0]
        ng = jnp.linalg.norm(g) / (AUDIO_LEN ** 0.5)
        return xh + 0.5 / (ng + 1e-8) * g
    p0 = {k: jnp.asarray(v) for k, v in op.params.items()}
    step("d_ingraph_H_guidance", lambda: jax.jit(ingraph_H_guidance)(
        network.params, x_hat, p0, y))

if which in ("e",):
    def full_step(params, xh, H, yy, rng, empty_d, empty_t):
        t_i = jnp.float32(0.5); t_ip1 = jnp.float32(0.45); gamma = jnp.float32(0.2)
        rng, k = jax.random.split(rng)
        t_hat2 = t_i + gamma * t_i
        eps = jax.random.normal(k, xh.shape, xh.dtype)
        xh2 = xh + jnp.sqrt(jnp.maximum(t_hat2**2 - t_i**2, 0.0)) * eps
        xd, vjp = jax.vjp(lambda z: denoise(params, z), xh2)
        g_xd = jax.grad(lambda z: rec(yy, op.degradation(z, H=H, mode="waveform")))(xd)
        g = vjp(g_xd)[0]
        ng = jnp.linalg.norm(g) / (AUDIO_LEN ** 0.5)
        lh = 0.5 / (ng + 1e-8) * g
        xd = jax.lax.stop_gradient(xd)
        xd = 0.05 / jnp.std(xd, ddof=1) * xd
        d = (xh2 - xd) / t_hat2 + lh
        x_next = xh2 + (t_ip1 - t_hat2) * d
        return (x_next, rng, empty_d, empty_t, H), xd
    step("e_full_step_inline", lambda: jax.jit(full_step)(
        network.params, x_hat, op.H, y, jax.random.PRNGKey(1), {}, ()))
