"""Bisect which blind-pipeline component fails on the axon TPU backend."""
import sys
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.operators.subband import BlindSubbandFiltering
from buddy_tpu.losses import get_loss


def step(name, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{name}: OK ({time.time()-t0:.0f}s)", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:150]}", flush=True)
        return None


AUDIO_LEN = 65536
args = compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy"])
op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
op = BlindSubbandFiltering(op_hp, sample_rate=16000)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "wpe"):
    from buddy_tpu.sampling.wpe import wpe_dereverb
    y = jnp.asarray(np.random.default_rng(0).standard_normal((1, AUDIO_LEN)).astype(np.float32))
    step("wpe", lambda: wpe_dereverb(y, taps=50, delay=2, iterations=5))

if which in ("all", "op"):
    op.reset(jax.random.PRNGKey(0))
    print("reset ok", flush=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, AUDIO_LEN)).astype(np.float32) * 0.05)

    deg = step("degradation", lambda: jax.jit(
        lambda xx, H: op.degradation(xx, H=H, mode="waveform"))(x, op.H))

    rec = get_loss(args["tester"]["posterior_sampling"]["rec_loss_params"], operator=op)

    def inner_loss(p, xx, yy):
        H = op.compute_H(p)
        y_hat = op.degradation(xx, H=H, mode="waveform")
        loss = rec(yy, y_hat)
        rt = op.get_time_RIR(H=H)
        rn = rt + 0.01 * jnp.ones_like(rt)
        loss = loss + rec(rt, jax.lax.stop_gradient(rn))
        return loss

    params = {k: jnp.asarray(v) for k, v in op.params.items()}
    step("inner_grad", lambda: jax.jit(jax.grad(inner_loss))(params, x, deg if deg is not None else x))

if which in ("all", "reg_project"):
    params = {k: jnp.asarray(v) for k, v in op.params.items()}
    step("project", lambda: jax.jit(op.project)(params))

if which in ("all2", "step", "scan"):
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.diffusion.edm import EDM
    from buddy_tpu.sampling.dps import EulerHeunSamplerDPS

    module = instantiate(args["network"])
    edm = EDM(sde_hp=dict(args["tester"]["sampling_params"]["sde_hp"]))
    network = NetworkBundle(module)
    x0 = jnp.zeros((1, 1, AUDIO_LEN), jnp.float32)
    network.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.float32))
    print("network init done", flush=True)

    sampler = EulerHeunSamplerDPS(network, edm, args)
    op.reset(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, AUDIO_LEN)).astype(np.float32) * 0.05)
    y = jax.jit(lambda xx, H: op.degradation(xx, H=H, mode="waveform"))(x, op.H)
    sampler._build_losses(op, blind=True)
    sampler.y = y
    opt = sampler._make_opt()
    op_params = {k: jnp.asarray(v) for k, v in op.params.items()}
    opt_state = opt.init(op_params)

    if which in ("all2", "step"):
        def one_step(x, rng, op_params, opt_state, H, net_params, y):
            sampler.y = y
            carry = (x, rng, op_params, opt_state, H)
            carry, xden = sampler._scan_step(op, opt, True, carry,
                                             (jnp.float32(0.5), jnp.float32(0.4),
                                              jnp.float32(0.2)), net_params)
            return carry[0], xden
        step("one_blind_step", lambda: jax.jit(one_step)(
            x, jax.random.PRNGKey(2), op_params, opt_state, op.H,
            network.params, y))

    if which in ("all2", "scan"):
        def scan2(net_params, y, rng):
            return sampler._run(op, True, (1, AUDIO_LEN), net_params, y, rng,
                                op_params, op.H)
        sampler.T = 2
        step("scan_T2", lambda: jax.jit(scan2)(network.params, y, jax.random.PRNGKey(3)))

if which in ("scan_nowpe", "scan_reverb"):
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.diffusion.edm import EDM
    from buddy_tpu.sampling.dps import EulerHeunSamplerDPS

    mode = "none" if which == "scan_nowpe" else "reverb_scaled"
    args["tester"]["posterior_sampling"]["warm_initialization"]["mode"] = mode

    module = instantiate(args["network"])
    edm = EDM(sde_hp=dict(args["tester"]["sampling_params"]["sde_hp"]))
    network = NetworkBundle(module)
    x0 = jnp.zeros((1, 1, AUDIO_LEN), jnp.float32)
    network.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.float32))
    print("network init done", flush=True)

    sampler = EulerHeunSamplerDPS(network, edm, args)
    op.reset(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, AUDIO_LEN)).astype(np.float32) * 0.05)
    y = jax.jit(lambda xx, H: op.degradation(xx, H=H, mode="waveform"))(x, op.H)
    sampler._build_losses(op, blind=True)
    op_params = {k: jnp.asarray(v) for k, v in op.params.items()}

    def scan2(net_params, y, rng):
        return sampler._run(op, True, (1, AUDIO_LEN), net_params, y, rng,
                            op_params, op.H)
    sampler.T = 2
    step(f"scan_T2_{mode}", lambda: jax.jit(scan2)(network.params, y, jax.random.PRNGKey(3)))
