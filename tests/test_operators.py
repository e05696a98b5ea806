"""Golden parity tests for the degradation operators vs the torch reference.

Covers SURVEY.md §7 hard parts #1-3: the subband forward model, the blind
filter design (decay prior -> interp -> OLA/direct-path corrections), the
cons() minimum-phase consistency projection, and the parameter clamps.

torchcde is not installed; the reference only uses its piecewise-linear
interpolation (subband_filtering.py:233-235), so a faithful stub backed by
np.interp is registered before importing the reference module.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _ref_modules():
    from ref_stubs import ref_path
    ref_path()
    from testing.operators.subband_filtering import SubbandFiltering, BlindSubbandFiltering
    from testing.operators.reverb import RIROperator
    return SubbandFiltering, BlindSubbandFiltering, RIROperator


from buddy_tpu.config import ConfigDict

OP_HP = ConfigDict({
    "fix_EQ_extremes": True, "NFFT": 1024, "win_length": 512, "hop": 128,
    "window": "hann", "Nf": 100,
    "EQ_freqs": [0, 125, 250, 375, 500, 625, 750, 875, 1000, 1250, 1500, 1750,
                 2000, 2250, 2500, 2750, 3000, 3500, 4000, 4500, 5000, 5500,
                 6000, 6500, 7000, 7500, 8000],
    "init_single_value": True,
    "init_params": {"T60_breakpoints": [0.1], "multiexp_weighting": [2]},
    "init_phases": "random_coherent", "minimum_phase": True,
    "fix_direct_path": True, "num_GL_iter": 1, "cumulative_decays": False,
    "decay_scale": 1, "Amin": 0, "Amax": 40, "T60min": 0.1, "T60max": 2,
    "clamp_A": True, "clamp_decay": True, "strictly_decreasing_decay": False,
    "enforce_long_decay_in_second_exponential": True, "n_iter_PR": 5,
})


@pytest.fixture(scope="module")
def ref_informed():
    SubbandFiltering, _, _ = _ref_modules()
    return SubbandFiltering(OP_HP, sample_rate=16000)


@pytest.fixture(scope="module")
def ref_blind():
    _, BlindSubbandFiltering, _ = _ref_modules()
    torch.manual_seed(0)
    return BlindSubbandFiltering(OP_HP, sample_rate=16000)


@pytest.fixture(scope="module")
def ours_informed():
    from buddy_tpu.operators.subband import SubbandFiltering
    return SubbandFiltering(OP_HP, sample_rate=16000)


@pytest.fixture(scope="module")
def ours_blind():
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    return BlindSubbandFiltering(OP_HP, sample_rate=16000)


def _random_H(rng, F=513, Nf=100):
    mag = np.exp(-np.arange(Nf)[None, :] / 20.0) * (0.5 + rng.random((F, Nf)))
    ph = rng.uniform(-np.pi, np.pi, (F, Nf))
    return (mag * np.exp(1j * ph)).astype(np.complex64)


def test_subband_degradation_parity(ref_informed, ours_informed, rng):
    H = _random_H(rng)
    x = rng.standard_normal((1, 13824)).astype(np.float32) * 0.05

    ref_informed.update_H(H=torch.from_numpy(H))
    with torch.no_grad():
        ref_wave = ref_informed.degradation(torch.from_numpy(x), mode="waveform").numpy()
        ref_stft = ref_informed.degradation(torch.from_numpy(x), mode="STFT").numpy()

    ours_informed.update_H(H=jnp.asarray(H))
    ours_wave = np.asarray(ours_informed.degradation(jnp.asarray(x), mode="waveform"))
    ours_stft = np.asarray(ours_informed.degradation(jnp.asarray(x), mode="STFT"))

    assert ours_stft.shape == ref_stft.shape
    np.testing.assert_allclose(ours_stft, ref_stft, atol=2e-3)
    assert ours_wave.shape == ref_wave.shape
    np.testing.assert_allclose(ours_wave, ref_wave, atol=2e-3)


def test_rir_to_H_parity(ref_informed, ours_informed, rng):
    rir = (rng.standard_normal(6000) * np.exp(-np.arange(6000) / 1000)).astype(np.float32)
    rir[0] = 1.0
    ref_informed.update_H(rir=torch.from_numpy(rir))
    ref_H = ref_informed.H.numpy()
    ours_H = np.asarray(ours_informed.rir_to_H(jnp.asarray(rir)))
    assert ours_H.shape == ref_H.shape
    np.testing.assert_allclose(ours_H, ref_H, atol=2e-3)


def test_get_time_rir_parity(ref_informed, ours_informed, rng):
    H = _random_H(rng)
    ref_informed.update_H(H=torch.from_numpy(H))
    with torch.no_grad():
        ref_rir = ref_informed.get_time_RIR().numpy()
    ours_rir = np.asarray(ours_informed.get_time_RIR(H=jnp.asarray(H)))
    assert ours_rir.shape == ref_rir.shape
    np.testing.assert_allclose(ours_rir, ref_rir, atol=2e-3)


def _sync_params(ref_blind, decay, weights):
    with torch.no_grad():
        ref_blind.params[0].data = torch.from_numpy(decay.copy())
        ref_blind.params[1].data = torch.from_numpy(weights.copy())


def test_design_filter_parity(ref_blind, ours_blind, rng):
    decay = rng.uniform(0.05, 0.6, (1, 25)).astype(np.float32)
    weights = rng.uniform(1.0, 3.0, (1, 25)).astype(np.float32)
    _sync_params(ref_blind, decay, weights)
    with torch.no_grad():
        ref_A = ref_blind.design_filter().numpy()
    params = dict(ours_blind.params, decay=jnp.asarray(decay), weights=jnp.asarray(weights))
    ours_A = np.asarray(ours_blind.design_filter(params))
    assert ours_A.shape == ref_A.shape
    np.testing.assert_allclose(ours_A, ref_A, rtol=2e-3, atol=1e-5)


def test_cons_parity(ref_blind, ours_blind, rng):
    H = _random_H(rng)
    with torch.no_grad():
        ref_c = ref_blind.cons(torch.from_numpy(H.copy()), length=ref_blind.length_rir).numpy()
    ours_c = np.asarray(ours_blind.cons(jnp.asarray(H), length=ours_blind.length_rir))
    assert ours_c.shape == ref_c.shape
    np.testing.assert_allclose(ours_c, ref_c, atol=5e-3)


def test_compute_H_parity(ref_blind, ours_blind, rng):
    decay = rng.uniform(0.05, 0.6, (1, 25)).astype(np.float32)
    weights = rng.uniform(1.0, 3.0, (1, 25)).astype(np.float32)
    phases = rng.uniform(-np.pi, np.pi, (513, 100)).astype(np.float32)
    _sync_params(ref_blind, decay, weights)
    with torch.no_grad():
        ref_blind.update_H(phases=torch.from_numpy(phases.copy()))
        ref_H = ref_blind.H.numpy()
    params = {"decay": jnp.asarray(decay), "weights": jnp.asarray(weights),
              "phases": jnp.asarray(phases)}
    ours_H = np.asarray(ours_blind.compute_H(params))
    assert ours_H.shape == ref_H.shape
    np.testing.assert_allclose(ours_H, ref_H, atol=5e-3)


def test_project_params_parity(ref_blind, ours_blind, rng):
    # two exponentials to exercise the second-exponential constraint
    decay = rng.uniform(0.0, 5.0, (2, 25)).astype(np.float32)
    weights = rng.uniform(0.1, 150.0, (2, 25)).astype(np.float32)
    _sync_params(ref_blind, decay, weights)
    ref_blind.num_exponentials = 2
    with torch.no_grad():
        ref_blind.project_params()
        ref_decay = ref_blind.params[0].numpy()
        ref_weights = ref_blind.params[1].numpy()

    params = {"decay": jnp.asarray(decay), "weights": jnp.asarray(weights),
              "phases": ours_blind.params["phases"]}
    out = ours_blind.project(params)
    np.testing.assert_allclose(np.asarray(out["decay"]), ref_decay, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights"]), ref_weights, rtol=1e-5)
    # restore single-exponential state for other tests
    _sync_params(ref_blind, np.zeros((1, 25), np.float32) + 0.3,
                 np.ones((1, 25), np.float32))


def test_operator_linearity(ours_informed, rng):
    """A(alpha*x) == alpha*A(x) — the subband operator is linear in x."""
    H = _random_H(rng)
    ours_informed.update_H(H=jnp.asarray(H))
    x = jnp.asarray(rng.standard_normal((1, 13824)).astype(np.float32))
    y1 = ours_informed.degradation(3.0 * x)
    y2 = 3.0 * ours_informed.degradation(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


def test_losses_parity(rng):
    """l2_comp_stft_summean (the blind/informed rec loss) and friends vs the
    reference loss factory (utils/losses.py)."""
    _, _, RefRIROperator = _ref_modules()
    from utils.losses import get_loss as ref_get_loss
    from buddy_tpu.losses import get_loss
    from buddy_tpu.operators.reverb import RIROperator

    hp = ConfigDict({"NFFT": 1024, "win_length": 512, "hop": 128, "window": "hann"})
    ref_op = RefRIROperator(hp, sample_rate=16000)
    our_op = RIROperator(hp, sample_rate=16000)

    x = rng.standard_normal((1, 13824)).astype(np.float32) * 0.05
    xh = rng.standard_normal((1, 13824)).astype(np.float32) * 0.05

    for name in ("l2_comp_stft_summean", "l2_comp_stft_sum", "l2_comp_stft_mean",
                 "l2_stft_sum", "l2_stft_mag_sum", "l2_log_stft_sum",
                 "l2_sum", "l2_mean"):
        args = ConfigDict({"name": name, "weight": 512,
                           "compression_factor": 0.667})
        ref_loss = ref_get_loss(args, operator=ref_op)(
            torch.from_numpy(x), torch.from_numpy(xh)).item()
        our_loss = float(get_loss(args, operator=our_op)(
            jnp.asarray(x), jnp.asarray(xh)))
        np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-3), name


def test_subband_overlap_save_matches_full(ours_informed, rng, monkeypatch):
    """BUDDY_SUBBAND_OS=1 (chunked overlap-save frame-axis convolution, the
    TPU serving path) == the one-shot full-size DFT convolution, values and
    H-gradients, with and without a precomputed (segmented) Xf."""
    op = ours_informed
    T = 516
    X = (rng.standard_normal((513, T)) + 1j * rng.standard_normal((513, T))
         ).astype(np.complex64)
    H = _random_H(rng)

    def run(flag, hoist):
        monkeypatch.setenv("BUDDY_SUBBAND_OS", flag)
        Xf = op.frame_fft(jnp.asarray(X)) if hoist else None
        Y = op.subband_filtering(jnp.asarray(X), jnp.asarray(H), Xf=Xf)

        def loss(hr):
            h = hr[0] + 1j * hr[1]
            Yl = op.subband_filtering(jnp.asarray(X), h, Xf=Xf)
            return jnp.sum(jnp.abs(Yl) ** 2)
        g = jax.grad(loss)(jnp.stack([np.real(H), np.imag(H)]))
        return np.asarray(Y), np.asarray(g)

    Y0, g0 = run("0", False)
    monkeypatch.setenv("BUDDY_SUBBAND_OS", "1")
    assert op._os_chunk_count(T, 100) == 4
    for hoist in (False, True):
        Y1, g1 = run("1", hoist)
        np.testing.assert_allclose(Y1, Y0, atol=2e-5 * np.abs(Y0).max())
        np.testing.assert_allclose(g1, g0, atol=2e-5 * np.abs(g0).max())


def test_os_chunk_policy(ours_informed, monkeypatch):
    """Overlap-save engages only for long frame axes and honors the env
    gate (short spectrograms — e.g. the reg-loss impulse path — must stay
    on the one-shot DFT so the precomputed _X_imp_f remains valid)."""
    op = ours_informed
    monkeypatch.setenv("BUDDY_SUBBAND_OS", "1")
    assert op._os_chunk_count(516, 100) == 4
    assert op._os_chunk_count(255, 100) == 1   # below the threshold
    assert op._os_chunk_count(110, 100) == 1   # impulse-path length
    monkeypatch.setenv("BUDDY_SUBBAND_OS", "0")
    assert op._os_chunk_count(516, 100) == 1
