"""CPU-runnable HLO cost proxy for the blind-DPS hot programs.

When the TPU tunnel is unreachable, this is the auditable evidence that an
optimization shrinks the compiled program (VERDICT r2 item 1 fallback):
XLA cost-analysis FLOPs / bytes accessed / transcendentals for

  * one blind inner-loop operator update (grad of rec_loss_params through
    filter design + subband degradation) — runs 10x per diffusion step;
  * the guidance-side degradation + rec-loss gradient wrt x_den.

Both are compiled at the production operator config (NFFT 1024, win 512,
hop 128, Nf 100, 65536-sample audio) on the host CPU backend, under each
FFT size policy, so policy changes are directly comparable.

Usage: JAX_PLATFORMS=cpu python scripts/hlo_proxy.py [audio_len]
Prints one JSON line per (program, policy).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# sitecustomize (/root/.axon_site) imports jax and pins the platform to the
# axon TPU tunnel before any env var can take effect; the live config object
# is the only switch that works after that.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from buddy_tpu.config import ConfigDict
from buddy_tpu.losses import get_loss
from buddy_tpu.operators.subband import BlindSubbandFiltering

AUDIO_LEN = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

OP_HP = ConfigDict({
    "fix_EQ_extremes": True, "NFFT": 1024, "win_length": 512, "hop": 128,
    "window": "hann", "Nf": 100,
    "EQ_freqs": [31.5, 63, 125, 250, 500, 1000, 2000, 4000, 8000],
    "init_single_value": True,
    "init_params": {"T60_breakpoints": [0.4], "multiexp_weighting": [2]},
    "init_phases": "random_coherent", "minimum_phase": True,
    "fix_direct_path": True, "num_GL_iter": 1, "cumulative_decays": False,
    "decay_scale": 1, "Amin": 0, "Amax": 40, "T60min": 0.05, "T60max": 3,
    "clamp_A": True, "clamp_decay": True, "strictly_decreasing_decay": False,
    "enforce_long_decay_in_second_exponential": True, "n_iter_PR": 5,
})
REC_CFG = ConfigDict({"name": "l2_comp_stft_summean", "weight": 512,
                      "compression_factor": 0.667})


def build(policy):
    os.environ["BUDDY_FFT_SIZE_POLICY"] = policy
    op = BlindSubbandFiltering(OP_HP, sample_rate=16000)
    rng = np.random.default_rng(0)
    op.reset(jax.random.PRNGKey(0))
    params = {k: jnp.asarray(v) for k, v in op.params.items()}
    x = jnp.asarray(rng.standard_normal((1, AUDIO_LEN)).astype(np.float32) * 0.05)
    y = jnp.asarray(rng.standard_normal((1, AUDIO_LEN)).astype(np.float32) * 0.05)
    loss = get_loss(REC_CFG, operator=op)
    X = op.apply_stft(x)
    Xf = op.frame_fft(X)
    Y = op.apply_stft(y)

    def inner_update(p, Xc, Xfc, Yc):
        def f(pp):
            H = op.compute_H(pp)
            y_hat = op.degradation(None, H=H, mode="waveform", X=Xc, Xf=Xfc,
                                   length=AUDIO_LEN)
            return loss(Yc, y_hat)
        return jax.grad(f)(p)

    def guidance(xd, H, Yc):
        def f(z):
            return loss(Yc, op.degradation(z, H=H, mode="waveform"))
        return jax.grad(f)(xd)

    H0 = op.compute_H(params)
    return {
        "inner_update": (inner_update, (params, X, Xf, Y)),
        "guidance": (guidance, (x, H0, Y)),
    }


def analyze(name, fn, args, policy):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    rec = {
        "program": name, "policy": policy, "audio_len": AUDIO_LEN,
        "gflops": round(ca.get("flops", 0.0) / 1e9, 3),
        "gbytes": round(ca.get("bytes accessed", 0.0) / 1e9, 4),
        "transcendentals_m": round(ca.get("transcendentals", 0.0) / 1e6, 3),
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    out = []
    for policy in ("pow2", "smooth5"):
        progs = build(policy)
        for name, (fn, args) in progs.items():
            out.append(analyze(name, fn, args, policy))
    for name in ("inner_update", "guidance"):
        a = next(r for r in out if r["program"] == name and r["policy"] == "pow2")
        b = next(r for r in out if r["program"] == name and r["policy"] == "smooth5")
        if a["gflops"]:
            print(f"# {name}: smooth5/pow2 flops {b['gflops']/a['gflops']:.3f}, "
                  f"bytes {b['gbytes']/a['gbytes']:.3f}")
