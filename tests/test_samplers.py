"""Sampler tests: analytic-denoiser statistics + step-level torch parity.

Step-level parity uses gamma=0 (Schurn=0) so the only stochastic element —
the churn noise — vanishes and the Euler/Heun update is deterministic, with
a shared linear mock denoiser on both sides.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from buddy_tpu.config import ConfigDict
from buddy_tpu.diffusion.edm import EDM
from buddy_tpu.sampling.euler_heun import EulerHeunSampler
from buddy_tpu.sampling.dps import EulerHeunSamplerDPS

from ref_stubs import ref_path


def make_args(T=20, order=2, Schurn=0.0, smin=1e-3, smax=1.0, zeta=2.75,
              modes=("unconditional",), warm="none",
              constraint_speech=False):
    return ConfigDict({
        "exp": {"audio_len": 4096, "sample_rate": 16000},
        "tester": {
            "sampling_params": {
                "same_as_training": False,
                "sde_hp": {"sigma_data": 0.05, "sigma_min": smin,
                           "sigma_max": smax, "rho": 10},
                "Schurn": Schurn, "Snoise": 1, "Stmin": 0, "Stmax": 10,
                "order": order, "T": T, "schedule": "edm",
            },
            "posterior_sampling": {
                "zeta": zeta,
                "rec_loss": {"name": "l2_comp_stft_summean", "weight": 512,
                             "compression_factor": 0.667},
                "normalization_type": "grad_norm",
                "warm_initialization": {"mode": warm, "scaling_factor": 0.05},
                "constraint_speech_magnitude": {"use": constraint_speech,
                                                "speech_scaling": 0.05},
            },
            "modes": list(modes),
        },
    })


EDM_HP = {"sigma_data": 0.05, "sigma_min": 1e-3, "sigma_max": 1.0, "rho": 10}


def test_unconditional_gaussian_statistics():
    """With the analytic optimal denoiser for x ~ N(0, s^2 I), Euler-Heun
    sampling must produce samples with std ~= s."""
    s = 0.05
    args = make_args(T=40, order=2, Schurn=5)
    edm = EDM(sde_hp=EDM_HP)
    sampler = EulerHeunSampler(model=None, diff_params=edm, args=args)

    # optimal denoiser: E[x0|xt] = s^2/(s^2+t^2) * xt
    def analytic_denoise(x, t, params=()):
        t = jnp.asarray(t).reshape(-1, *([1] * (x.ndim - 1)))
        return s ** 2 / (s ** 2 + t ** 2) * x

    sampler._denoise = analytic_denoise
    x = sampler.predict((64, 512), rng=jax.random.PRNGKey(0))
    x = np.asarray(x)
    assert np.isfinite(x).all()
    assert abs(x.std() - s) < 0.15 * s


class _TorchMockNet(torch.nn.Module):
    """net(cin*x, cnoise) = 0.5*input + 0.1*sin(input) — nonlinear but smooth."""

    def forward(self, x, cnoise):
        return 0.5 * x + 0.1 * torch.sin(x)

    def eval(self):
        return self


def _jax_mock_net(x, cnoise):
    return 0.5 * x + 0.1 * jnp.sin(x)


@pytest.fixture(scope="module")
def ref_samplers():
    ref_path()
    from testing.EulerHeunSampler import EulerHeunSampler as RefEHS
    from testing.EulerHeunSamplerDPS import EulerHeunSamplerDPS as RefDPS
    from diff_params.edm import EDM as RefEDM
    return RefEHS, RefDPS, RefEDM


def test_unconditional_step_parity(ref_samplers, rng):
    """Deterministic (Schurn=0) 5-step rollout matches the torch reference."""
    RefEHS, _, RefEDM = ref_samplers
    args = make_args(T=5, order=2, Schurn=0.0)
    ref_edm = RefEDM("ve_karras", args.tester.sampling_params.sde_hp)
    ref = RefEHS(_TorchMockNet(), ref_edm, args)

    edm = EDM(sde_hp=dict(args.tester.sampling_params.sde_hp))
    ours = EulerHeunSampler(model=_jax_mock_net, diff_params=edm, args=args)

    x0 = rng.standard_normal((1, 4096)).astype(np.float32)

    # torch rollout
    t = ref.create_schedule()
    x_t = torch.from_numpy(x0.copy())
    for i in range(ref.T):
        x_t, _ = ref.step(x_t, t[i], t[i + 1], torch.tensor(0.0))
    ref_out = x_t.numpy()

    # jax rollout through the scan step
    tj = ours.create_schedule()
    gam = jnp.zeros_like(tj)
    carry = (jnp.asarray(x0), jax.random.PRNGKey(0))
    for i in range(ours.T):
        carry, _ = ours._scan_step(carry, (tj[i], tj[i + 1], gam[i]))
    ours_out = np.asarray(carry[0])

    np.testing.assert_allclose(ours_out, ref_out, atol=1e-4)


def test_informed_dps_step_parity(ref_samplers, rng):
    """One guided order-2 step with a known RIR matches the reference,
    exercising the vjp-through-denoiser guidance and grad-norm zeta scaling."""
    RefEHS, RefDPS, RefEDM = ref_samplers
    from testing.operators.reverb import RIROperator as RefRIR
    from buddy_tpu.operators.reverb import RIROperator

    args = make_args(T=5, order=2, Schurn=0.0, warm="reverb_scaled")
    op_hp = ConfigDict({"NFFT": 1024, "win_length": 512, "hop": 128, "window": "hann"})

    rir = (rng.standard_normal(1000) * np.exp(-np.arange(1000) / 150)).astype(np.float32)
    rir[0] = 1.0
    x_clean = rng.standard_normal((1, 4096)).astype(np.float32) * 0.05

    # --- torch side
    ref_edm = RefEDM("ve_karras", args.tester.sampling_params.sde_hp)
    ref = RefDPS(_TorchMockNet(), ref_edm, args)
    ref_op = RefRIR(op_hp, time_kernel_size=1000, sample_rate=16000)
    ref_op.update_params(torch.from_numpy(rir.copy()))
    y_t = ref_op.degradation(torch.from_numpy(x_clean.copy()))
    from utils.losses import get_loss as ref_get_loss
    ref.operator = ref_op
    ref.y = y_t
    ref.rec_loss = ref_get_loss(args.tester.posterior_sampling.rec_loss, operator=ref_op)
    t_sched = ref.create_schedule()
    x0 = rng.standard_normal((1, 4096)).astype(np.float32)
    x_ref, xden_ref = ref.step(torch.from_numpy(x0.copy()), t_sched[0],
                               t_sched[1], torch.tensor(0.0))
    x_ref = x_ref.detach().numpy()

    # --- jax side
    edm = EDM(sde_hp=dict(args.tester.sampling_params.sde_hp))
    ours = EulerHeunSamplerDPS(model=_jax_mock_net, diff_params=edm, args=args)
    our_op = RIROperator(op_hp, time_kernel_size=1000, sample_rate=16000)
    our_op.update_params(jnp.asarray(rir))
    y_j = our_op.degradation(jnp.asarray(x_clean))
    np.testing.assert_allclose(np.asarray(y_j), y_t.detach().numpy(), atol=1e-4)

    ours._build_losses(our_op, blind=False)
    ours.y = jnp.asarray(y_j)
    tj = ours.create_schedule()
    carry = (jnp.asarray(x0), jax.random.PRNGKey(0), {}, (), None)
    step = lambda c, i: ours._scan_step(our_op, None, False, c, i)
    carry, xden_j = step(carry, (tj[0], tj[1], jnp.float32(0.0)))
    x_j = np.asarray(carry[0])

    np.testing.assert_allclose(np.asarray(xden_j), xden_ref.detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(x_j, x_ref, atol=2e-3)


def test_full_program_informed_waveform_parity(ref_samplers, rng):
    """Full-program parity (VERDICT r2 item 4): the reference's complete
    predict_conditional()/predict() loop — T=5, Schurn=0, order=1,
    reverb_scaled warm init — vs our jitted scan program, comparing FINAL
    waveforms so step-level tolerances that compound over T steps and any
    carry-wiring bug are caught.  The only stochastic element (the warm-init
    noise draw) is shared by patching initialize_x on both sides with the
    same array; everything downstream is deterministic."""
    _, RefDPS, RefEDM = ref_samplers
    from testing.operators.reverb import RIROperator as RefRIR
    from buddy_tpu.operators.reverb import RIROperator

    args = make_args(T=5, order=1, Schurn=0.0, warm="reverb_scaled")
    op_hp = ConfigDict({"NFFT": 1024, "win_length": 512, "hop": 128, "window": "hann"})

    rir = (rng.standard_normal(1000) * np.exp(-np.arange(1000) / 150)).astype(np.float32)
    rir[0] = 1.0
    x_clean = rng.standard_normal((1, 4096)).astype(np.float32) * 0.05

    # ---- torch side: the reference's own predict_conditional end to end
    ref_edm = RefEDM("ve_karras", args.tester.sampling_params.sde_hp)
    ref = RefDPS(_TorchMockNet(), ref_edm, args)
    ref_op = RefRIR(op_hp, time_kernel_size=1000, sample_rate=16000)
    ref_op.update_params(torch.from_numpy(rir.copy()))
    y_t = ref_op.degradation(torch.from_numpy(x_clean.copy()))
    y = y_t.detach().numpy()

    t0 = float(ref.create_schedule()[0])
    sf = float(args.tester.posterior_sampling.warm_initialization.scaling_factor)
    eps = rng.standard_normal((1, 4096)).astype(np.float32)
    x_init = (sf * y / y.std(ddof=1) + t0 * eps).astype(np.float32)
    ref.initialize_x = lambda shape, device, schedule: torch.from_numpy(x_init.copy())
    ref_out = ref.predict_conditional(y_t, ref_op, shape=(1, 4096),
                                      blind=False).detach().numpy()

    # ---- jax side: our full jitted program
    edm = EDM(sde_hp=dict(args.tester.sampling_params.sde_hp))
    ours = EulerHeunSamplerDPS(model=_jax_mock_net, diff_params=edm, args=args)
    our_op = RIROperator(op_hp, time_kernel_size=1000, sample_rate=16000)
    our_op.update_params(jnp.asarray(rir))
    ours.initialize_x = lambda y_, shape, rng_, t0_: jnp.asarray(x_init)
    ours_out = np.asarray(ours.predict_conditional(
        jnp.asarray(y), our_op, shape=(1, 4096), blind=False,
        rng=jax.random.PRNGKey(0)))

    assert ours_out.shape == ref_out.shape
    assert np.isfinite(ours_out).all()
    scale = max(np.abs(ref_out).max(), 1e-3)
    np.testing.assert_allclose(ours_out, ref_out, atol=5e-3 * scale)


def test_wpe_reduces_reverb(rng):
    """WPE warm init: late-reverb energy of the output is below the input's."""
    from buddy_tpu.sampling.wpe import wpe_dereverb
    from buddy_tpu.ops.fftconv import fft_convolve

    T = 8192
    x = np.zeros(T, np.float32)
    impulses = rng.integers(0, T - 1, 60)
    x[impulses] = rng.standard_normal(60).astype(np.float32)
    rir = (np.exp(-np.arange(2000) / 300) * rng.standard_normal(2000)).astype(np.float32) * 0.4
    rir[0] = 1.0
    y = np.asarray(fft_convolve(jnp.asarray(x), jnp.asarray(rir)))

    z = np.asarray(wpe_dereverb(jnp.asarray(y), taps=20, delay=2, iterations=3))
    assert z.shape == y.shape
    assert np.isfinite(z).all()
    err_before = np.mean((y - x) ** 2)
    err_after = np.mean((z - x) ** 2)
    assert err_after < err_before


def test_wpe_golden():
    """Pinned WPE output (tests/goldens/wpe_golden.npz, regenerate with
    tests/make_wpe_golden.py): real speech + seeded RIR through the
    production warm-init params (taps=50, delay=2, iterations=5 —
    conf/tester/blind_dereverberation_BUDDy.yaml).  Gates silent numeric
    drift in the pure-JAX WPE (reference EulerHeunSamplerDPS.py:32-54);
    nara_wpe isn't installable here, so the golden is self-pinning."""
    from buddy_tpu.ops import stft as stft_fn, istft as istft_fn
    from buddy_tpu.sampling.wpe import wpe_dereverb

    # the golden pins the canonical (polyphase+DFT) path; conv-formulated
    # STFT rounding drifts ~1e-3 through the 5 WPE iterations
    monkey = os.environ.get("BUDDY_STFT_CONV")
    os.environ["BUDDY_STFT_CONV"] = "0"
    stft_fn.clear_cache()
    istft_fn.clear_cache()
    wpe_dereverb.clear_cache()  # jitted; may hold a conv-path trace
    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "wpe_golden.npz"))
    try:
        z = np.asarray(wpe_dereverb(jnp.asarray(g["y"]), taps=50, delay=2,
                                    iterations=5))
    finally:
        if monkey is None:
            del os.environ["BUDDY_STFT_CONV"]
        else:
            os.environ["BUDDY_STFT_CONV"] = monkey
        stft_fn.clear_cache()
        istft_fn.clear_cache()
        wpe_dereverb.clear_cache()
    assert np.isfinite(z).all()
    scale = np.abs(g["z"]).max()
    np.testing.assert_allclose(z, g["z"], atol=1e-4 * scale, rtol=0)


def test_blind_batched_matches_single(rng):
    """predict_conditional_batched(B=2) == two single runs with the same
    per-item rngs and operator inits (vmap correctness)."""
    from buddy_tpu.config import ConfigDict
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    from test_blind_parity import make_blind_args

    op_hp = ConfigDict({
        "fix_EQ_extremes": True, "NFFT": 256, "win_length": 128, "hop": 32,
        "window": "hann", "Nf": 20,
        "EQ_freqs": [0, 500, 1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000],
        "init_single_value": True,
        "init_params": {"T60_breakpoints": [0.1], "multiexp_weighting": [2]},
        "init_phases": "random_coherent", "minimum_phase": True,
        "fix_direct_path": True, "num_GL_iter": 1, "cumulative_decays": False,
        "decay_scale": 1, "Amin": 0, "Amax": 40, "T60min": 0.1, "T60max": 2,
        "clamp_A": True, "clamp_decay": True, "strictly_decreasing_decay": False,
        "enforce_long_decay_in_second_exponential": True, "n_iter_PR": 5,
    })
    args = make_blind_args(op_updates=2)
    args.tester.sampling_params.T = 2
    args.exp.audio_len = 2048

    op = BlindSubbandFiltering(op_hp, sample_rate=16000)
    edm = EDM(sde_hp=dict(args.tester.sampling_params.sde_hp))

    xs = rng.standard_normal((2, 1, 2048)).astype(np.float32) * 0.05
    params_b, H_b = op.reset_batched(jax.random.PRNGKey(9), 2)
    ys = jax.vmap(lambda x, H: op.degradation(x, H=H, mode="waveform"))(
        jnp.asarray(xs), H_b)

    key = jax.random.PRNGKey(11)
    keys = jax.random.split(key, 2)

    sampler_b = EulerHeunSamplerDPS(model=_jax_mock_net, diff_params=edm, args=args)
    preds_b = np.asarray(sampler_b.predict_conditional_batched(
        ys, op, blind=True, rng=key, op_params_batch=params_b, H_batch=H_b))

    preds_s = []
    for i in range(2):
        sampler = EulerHeunSamplerDPS(model=_jax_mock_net, diff_params=edm, args=args)
        op.params = {k: v[i] for k, v in params_b.items()}
        op.H = H_b[i]
        preds_s.append(np.asarray(sampler.predict_conditional(
            ys[i], op, shape=(1, 2048), blind=True, rng=keys[i])))
    preds_s = np.stack(preds_s)

    assert preds_b.shape == preds_s.shape
    np.testing.assert_allclose(preds_b, preds_s, atol=1e-4)


def test_identity_guidance_equals_full_for_linear_denoiser(rng):
    """guidance_jacobian="identity" (MPGD/PiGDM-style, skips the U-Net
    backward) must agree EXACTLY with the full DPS vjp when the denoiser is
    linear-diagonal: the vjp multiplies the operator-side gradient by a
    positive scalar, which the grad-norm zeta normalization divides back
    out.  A sharp correctness check of the identity path's wiring."""
    from buddy_tpu.operators.reverb import RIROperator

    op_hp = ConfigDict({"NFFT": 1024, "win_length": 512, "hop": 128,
                        "window": "hann"})
    rir = (rng.standard_normal(1000) * np.exp(-np.arange(1000) / 150)
           ).astype(np.float32)
    rir[0] = 1.0
    x_clean = rng.standard_normal((1, 4096)).astype(np.float32) * 0.05
    x_init = rng.standard_normal((1, 4096)).astype(np.float32)

    s = 0.05

    def analytic_denoise(x, t, params=()):
        t = jnp.asarray(t).reshape(-1, *([1] * (x.ndim - 1)))
        return s ** 2 / (s ** 2 + t ** 2) * x

    outs = {}
    for mode in ("full", "identity"):
        args = make_args(T=5, order=1, Schurn=0.0, warm="reverb_scaled")
        args.tester.posterior_sampling.guidance_jacobian = mode
        edm = EDM(sde_hp=dict(args.tester.sampling_params.sde_hp))
        sampler = EulerHeunSamplerDPS(model=_jax_mock_net, diff_params=edm,
                                      args=args)
        sampler._denoise = analytic_denoise
        sampler.initialize_x = lambda y_, shape, rng_, t0_: jnp.asarray(x_init)
        op = RIROperator(op_hp, time_kernel_size=1000, sample_rate=16000)
        op.update_params(jnp.asarray(rir))
        y = op.degradation(jnp.asarray(x_clean))
        outs[mode] = np.asarray(sampler.predict_conditional(
            y, op, shape=(1, 4096), blind=False, rng=jax.random.PRNGKey(0)))

    assert np.isfinite(outs["identity"]).all()
    np.testing.assert_allclose(outs["identity"], outs["full"],
                               atol=1e-5, rtol=1e-5)


def test_identity_guidance_blind_runs_and_differs(rng):
    """Blind program under identity guidance: finite output, final operator
    state finite, and (nonlinear denoiser) the trajectory genuinely differs
    from full DPS — i.e. the knob actually switches the program."""
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    from test_blind_parity import make_blind_args

    op_hp = ConfigDict({
        "fix_EQ_extremes": True, "NFFT": 256, "win_length": 128, "hop": 32,
        "window": "hann", "Nf": 20,
        "EQ_freqs": [0, 500, 1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000],
        "init_single_value": True,
        "init_params": {"T60_breakpoints": [0.1], "multiexp_weighting": [2]},
        "init_phases": "random_coherent", "minimum_phase": True,
        "fix_direct_path": True, "num_GL_iter": 1, "cumulative_decays": False,
        "decay_scale": 1, "Amin": 0, "Amax": 40, "T60min": 0.1, "T60max": 2,
        "clamp_A": True, "clamp_decay": True, "strictly_decreasing_decay": False,
        "enforce_long_decay_in_second_exponential": True, "n_iter_PR": 5,
    })
    x = rng.standard_normal((1, 2048)).astype(np.float32) * 0.05

    outs = {}
    for mode in ("full", "identity"):
        args = make_blind_args(op_updates=2)
        args.tester.sampling_params.T = 2
        args.exp.audio_len = 2048
        args.tester.posterior_sampling.guidance_jacobian = mode
        edm = EDM(sde_hp=dict(args.tester.sampling_params.sde_hp))
        sampler = EulerHeunSamplerDPS(model=_jax_mock_net, diff_params=edm,
                                      args=args)
        op = BlindSubbandFiltering(op_hp, sample_rate=16000)
        op.reset(jax.random.PRNGKey(3))
        y = op.degradation(jnp.asarray(x), H=op.H, mode="waveform")
        outs[mode] = np.asarray(sampler.predict_conditional(
            y, op, shape=(1, 2048), blind=True, rng=jax.random.PRNGKey(1)))
        assert np.isfinite(outs[mode]).all()
        assert all(np.isfinite(np.asarray(v)).all()
                   for v in op.params.values())

    diff = np.linalg.norm(outs["identity"] - outs["full"])
    assert diff > 1e-6, diff


def test_identity_guidance_recovers_on_oracle():
    """Recovery QUALITY of identity-Jacobian guidance in a controlled blind
    setting where ground truth exists: Gaussian-mixture prior with an
    analytic (genuinely nonlinear) Tweedie denoiser + the real blind subband
    operator.  Calibration (scripts/oracle_guidance_quality.py, 2026-08-18):
    this config recovers ~13.2 dB SI-SDR from ~-0.8 dB input; full-vjp DPS
    scores within 1 dB of identity whenever it converges.  Gate at +8 dB
    improvement."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "oracle_guidance_quality",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "oracle_guidance_quality.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    r = mod.run_one(seed=1, T=10, L=1024, K=4, s=0.005, op_updates=2,
                    modes=("identity",))
    assert r["sisdr_identity"] > r["sisdr_input"] + 8.0, r
