"""Steady-state timing of blind-pipeline components on the TPU."""
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

AUDIO_LEN = 65536
args = compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy"])


def timeit(name, fn, *a, n=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


which = sys.argv[1] if len(sys.argv) > 1 else "all"

op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
op = BlindSubbandFiltering(op_hp, sample_rate=16000)
op.reset(jax.random.PRNGKey(0))
x = jnp.ones((1, AUDIO_LEN)) * 0.01

if which in ("all", "net"):
    module = instantiate(args["network"])
    edm = EDM(sde_hp=dict(args["tester"]["sampling_params"]["sde_hp"]))
    network = NetworkBundle(module)
    network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, AUDIO_LEN)), jnp.zeros((1,)))
    print("network ready", flush=True)

    @jax.jit
    def fwd(params, xx):
        net = lambda z, cn: module.apply(params, z, cn)
        return edm.denoiser(xx[:, None, :], net, jnp.float32(0.3))[:, 0, :]

    timeit("unet_fwd", fwd, network.params, x)

    @jax.jit
    def fwdbwd(params, xx):
        def f(z):
            net = lambda zz, cn: module.apply(params, zz, cn)
            return jnp.sum(edm.denoiser(z[:, None, :], net, jnp.float32(0.3)) ** 2)
        return jax.grad(f)(xx)

    timeit("unet_fwd+bwd", fwdbwd, network.params, x)

    # model STFT/ISTFT alone
    from buddy_tpu.ops.stft import stft, istft, hann_window, pad_spec_frames
    w510 = hann_window(510)

    @jax.jit
    def model_stft_roundtrip(xx):
        S = pad_spec_frames(stft(xx, w510, n_fft=510, hop_length=128), 16)
        return istft(S, w510, n_fft=510, hop_length=128, length=AUDIO_LEN)

    timeit("model_stft+istft_510", model_stft_roundtrip, x)

if which in ("all", "op"):
    rec = get_loss(args["tester"]["posterior_sampling"]["rec_loss_params"], operator=op)
    y = jax.jit(lambda xx, H: op.degradation(xx, H=H, mode="waveform"))(x, op.H)
    p0 = {k: jnp.asarray(v) for k, v in op.params.items()}

    timeit("compute_H", jax.jit(op.compute_H), p0)
    timeit("degradation", jax.jit(lambda H: op.degradation(x, H=H, mode="waveform")), op.H)
    timeit("get_time_RIR", jax.jit(lambda H: op.get_time_RIR(H=H)), op.H)

    @jax.jit
    def inner_grad(p, yy):
        def loss_fn(pp):
            H = op.compute_H(pp)
            y_hat = op.degradation(x, H=H, mode="waveform")
            loss = rec(yy, y_hat)
            rt = op.get_time_RIR(H=H)
            return loss + rec(rt, jax.lax.stop_gradient(rt + 0.01))
        return jax.grad(loss_fn)(p)

    timeit("inner_grad(1 update)", inner_grad, p0, y)

    from buddy_tpu.ops.minphase import minimum_phase_version
    h = jnp.ones((12928,))
    timeit("minphase_12928", jax.jit(minimum_phase_version), h)

if which in ("all", "wpe"):
    from buddy_tpu.sampling.wpe import wpe_dereverb
    timeit("wpe", lambda yy: wpe_dereverb(yy, taps=50, delay=2, iterations=5), x, n=3)
