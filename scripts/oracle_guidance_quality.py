"""Recovery-quality comparison: full DPS vjp vs identity-Jacobian guidance.

The only lever past the measured ~6.2x bf16 roofline is skipping the U-Net
backward (``guidance_jacobian="identity"``, MPGD/PiGDM-style).  Wiring
correctness is already tested (tests/test_samplers.py:299,341); this script
answers the *quality* question in a controlled setting where ground truth
exists without trained weights:

* Prior: a K-component Gaussian mixture over waveforms with centers c_k
  (low-passed noise at speech scale 0.05) and small per-component std s.
  Its Tweedie denoiser is analytic and genuinely NONLINEAR:
      x_den(x, t) = sum_k w_k(x) * (t^2 c_k + s^2 x) / (s^2 + t^2),
      w_k = softmax_k( -||x - c_k||^2 / (2 (s^2 + t^2)) ),
  so dD/dx is far from a scalar multiple of I (the softmax routes through
  center differences) — exactly the regime where the identity approximation
  could fail.
* Degradation: the blind subband reverb operator (flagship workload,
  /root/reference/testing/operators/subband_filtering.py) applied to one
  center; blind DPS must both estimate the filter and pull x to the right
  mixture component through the nonlinear denoiser.
* Metric: SI-SDR / log-spectral distance of the output vs the true center,
  against the reverberant input's own score, for both guidance modes over
  several seeds.

Runs on CPU (forces JAX_PLATFORMS=cpu before importing jax) so it never
touches the TPU tunnel.  Prints a table plus one JSON line; calibrated
numbers gate tests/test_samplers.py::test_identity_guidance_recovers_on_oracle.

Measured 2026-08-18 (defaults: seeds=3, T=20, L=2048, K=4, s=0.005,
op_updates=5), SI-SDR of output vs the true mixture center:

    seed 0: input   0.45 dB | full -39.25 dB | identity  22.27 dB
    seed 1: input  -1.43 dB | full  21.83 dB | identity  21.39 dB
    seed 2: input   0.08 dB | full  22.99 dB | identity  22.34 dB

Conclusion: identity-Jacobian guidance matches full-vjp DPS within 1 dB
whenever full succeeds, and does not share full's divergent failure mode
(seed 0: full collapsed to an anti-correlated output; identity recovered
normally).  TPU-measured speed: RTF 6.597 vs 3.75 (bf16+fuse, B=8, T=50).
LSD in this toy is floor-dominated (all methods 'worse' than input) —
SI-SDR against the known center is the meaningful recovery metric here.

Usage: python scripts/oracle_guidance_quality.py [--seeds 3] [--T 20] [--L 2048]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def lowpass_noise(rng: np.random.Generator, n: int, cutoff_bins: int) -> np.ndarray:
    """Smooth random waveform: keep the first `cutoff_bins` rFFT bins."""
    spec = rng.standard_normal(n // 2 + 1) + 1j * rng.standard_normal(n // 2 + 1)
    spec[cutoff_bins:] = 0.0
    x = np.fft.irfft(spec, n=n).astype(np.float32)
    return x / x.std(ddof=1)


def make_mixture_denoiser(centers, s):
    """Analytic Tweedie denoiser for x ~ (1/K) sum_k N(c_k, s^2 I)."""
    import jax
    import jax.numpy as jnp

    C = jnp.asarray(centers)  # (K, L)
    s2 = float(s) ** 2

    def denoise(x, t, params=()):
        t = jnp.asarray(t).reshape(-1, *([1] * (x.ndim - 1)))
        var = s2 + t ** 2  # (B, 1)
        d2 = jnp.sum((x[:, None, :] - C[None, :, :]) ** 2, axis=-1)  # (B, K)
        w = jax.nn.softmax(-d2 / (2.0 * var[:, 0]), axis=-1)  # (B, K)
        post_mean_k = (t[:, None] ** 2 * C[None] + s2 * x[:, None]) / var[:, None]
        return jnp.sum(w[:, :, None] * post_mean_k, axis=1)

    return denoise


def run_one(seed: int, T: int, L: int, K: int, s: float, op_updates: int,
            modes=("full", "identity")):
    import jax
    import jax.numpy as jnp

    from buddy_tpu.config import ConfigDict
    from buddy_tpu.diffusion.edm import EDM
    from buddy_tpu.sampling.dps import EulerHeunSamplerDPS
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    from buddy_tpu.evaluation import si_sdr, log_spectral_distance

    rng = np.random.default_rng(seed)
    centers = np.stack([0.05 * lowpass_noise(rng, L, L // 8) for _ in range(K)])
    clean = centers[0]

    op_hp = ConfigDict({
        "fix_EQ_extremes": True, "NFFT": 256, "win_length": 128, "hop": 32,
        "window": "hann", "Nf": 20,
        "EQ_freqs": [0, 500, 1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000],
        "init_single_value": True,
        "init_params": {"T60_breakpoints": [0.1], "multiexp_weighting": [2]},
        "init_phases": "random_coherent", "minimum_phase": True,
        "fix_direct_path": True, "num_GL_iter": 1, "cumulative_decays": False,
        "decay_scale": 1, "Amin": 0, "Amax": 40, "T60min": 0.1, "T60max": 2,
        "clamp_A": True, "clamp_decay": True,
        "strictly_decreasing_decay": False,
        "enforce_long_decay_in_second_exponential": True, "n_iter_PR": 5,
    })

    def make_args(mode):
        return ConfigDict({
            "exp": {"audio_len": L, "sample_rate": 16000},
            "tester": {
                "sampling_params": {
                    "same_as_training": False,
                    "sde_hp": {"sigma_data": 0.05, "sigma_min": 1e-3,
                               "sigma_max": 1.0, "rho": 10},
                    "Schurn": 0.0, "Snoise": 1, "Stmin": 0, "Stmax": 10,
                    "order": 1, "T": T, "schedule": "edm",
                },
                "posterior_sampling": {
                    "zeta": 0.5,
                    "guidance_jacobian": mode,
                    "rec_loss": {"name": "l2_comp_stft_summean", "weight": 512,
                                 "compression_factor": 0.667},
                    "rec_loss_params": {
                        "name": "l2_comp_stft_summean", "weight": 512,
                        "compression_factor": 0.667},
                    "normalization_type": "grad_norm",
                    "warm_initialization": {"mode": "reverb_scaled",
                                            "scaling_factor": 0.05},
                    "constraint_speech_magnitude": {"use": True,
                                                    "speech_scaling": 0.05},
                    "RIR_noise_regularization": {
                        "use": False, "crop_sigma_max": 0.01,
                        "crop_sigma_min": 5e-4,
                        "loss": {"name": "none", "weight": 2560,
                                 "compression_factor": 0.667}},
                    "blind_hp": {
                        "optimizer": "adam", "lr_op": 0.1, "beta1": 0.9,
                        "beta2": 0.99, "noise": 0.1, "lr_op_phase": 1,
                        "weight_decay": 0,
                        "op_updates_per_step": op_updates, "grad_clip": 1},
                },
                "modes": ["blind"],
            },
        })

    # one true reverb realization, shared across modes
    op_true = BlindSubbandFiltering(op_hp, sample_rate=16000)
    op_true.reset(jax.random.PRNGKey(seed * 7 + 1))
    y = op_true.degradation(jnp.asarray(clean)[None, :], H=op_true.H,
                            mode="waveform")

    denoise = make_mixture_denoiser(centers, s)
    out = {}
    for mode in modes:
        args = make_args(mode)
        edm = EDM(sde_hp=dict(args.tester.sampling_params.sde_hp))
        sampler = EulerHeunSamplerDPS(model=lambda x, c: x, diff_params=edm,
                                      args=args)
        sampler._denoise = denoise
        op = BlindSubbandFiltering(op_hp, sample_rate=16000)
        op.reset(jax.random.PRNGKey(seed * 7 + 2))
        pred = sampler.predict_conditional(
            y, op, shape=(1, L), blind=True, rng=jax.random.PRNGKey(seed))
        out[mode] = np.asarray(pred)[0]
        assert np.isfinite(out[mode]).all(), mode

    y_np = np.asarray(y)[0]
    row = {
        "seed": seed,
        "sisdr_input": si_sdr(clean, y_np),
        "lsd_input": log_spectral_distance(clean, y_np, n_fft=256, hop=64),
    }
    for mode in modes:
        row[f"sisdr_{mode}"] = si_sdr(clean, out[mode])
        row[f"lsd_{mode}"] = log_spectral_distance(clean, out[mode],
                                                   n_fft=256, hop=64)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--T", type=int, default=20)
    ap.add_argument("--L", type=int, default=2048)
    ap.add_argument("--K", type=int, default=4)
    ap.add_argument("--s", type=float, default=0.005)
    ap.add_argument("--op-updates", type=int, default=5)
    ap.add_argument("--modes", default="full,identity")
    args = ap.parse_args()
    modes = tuple(args.modes.split(","))

    rows = []
    for seed in range(args.seeds):
        r = run_one(seed, args.T, args.L, args.K, args.s, args.op_updates,
                    modes=modes)
        rows.append(r)
        print(f"seed {seed}: input {r['sisdr_input']:6.2f} dB | "
              + " | ".join(f"{m} {r[f'sisdr_{m}']:6.2f} dB" for m in modes)
              + f" || LSD in {r['lsd_input']:.3f} "
              + " ".join(f"{m} {r[f'lsd_{m}']:.3f}" for m in modes),
              flush=True)

    summary = {
        "config": {"T": args.T, "L": args.L, "K": args.K, "s": args.s,
                   "op_updates": args.op_updates, "seeds": args.seeds},
        "rows": rows,
    }
    for key in ["sisdr_input", "lsd_input"] + [
            f"{p}_{m}" for m in modes for p in ("sisdr", "lsd")]:
        summary[f"mean_{key}"] = float(np.mean([r[key] for r in rows]))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
