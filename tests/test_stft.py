"""Golden parity tests for the signal core against torch (CPU).

The reference's every loss/operator depends on torch.stft/istft semantics;
these tests pin our JAX implementations to the torch outputs within float32
tolerance (SURVEY.md §4: golden tests vs the PyTorch reference).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from buddy_tpu.ops import (
    stft, istft, hann_window, pad_spec_frames,
    fft_convolve, hilbert, minimum_phase_version,
)


def _torch_hann(n):
    return torch.hann_window(n, periodic=True)


def test_hann_window_parity():
    for n in (510, 512, 1024):
        ours = np.asarray(hann_window(n))
        theirs = _torch_hann(n).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("n_fft,hop,pad_mode,length", [
    (510, 128, "reflect", 65536),   # model STFT (conf/network/ncsnpp.yaml:2-5)
    (510, 128, "reflect", 33600),
    (1024, 128, "constant", 13824), # operator STFT (subband_filtering.py:80)
])
def test_stft_parity(rng, n_fft, hop, pad_mode, length):
    x = rng.standard_normal(length).astype(np.float32)
    if n_fft == 1024:
        # operators use a hann(512) right-padded to 1024 (subband_filtering.py:34)
        w = torch.nn.functional.pad(_torch_hann(512), (0, 512))
    else:
        w = _torch_hann(n_fft)

    ref = torch.stft(torch.from_numpy(x), n_fft, hop_length=hop, win_length=n_fft,
                     window=w, center=True, onesided=True, return_complex=True,
                     normalized=False, pad_mode=pad_mode).numpy()
    ours = np.asarray(stft(jnp.asarray(x), jnp.asarray(w.numpy()),
                           n_fft=n_fft, hop_length=hop, pad_mode=pad_mode))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("n_fft,hop,length", [
    (510, 128, 65536),
    (1024, 128, 13824),
])
def test_istft_parity(rng, n_fft, hop, length):
    x = rng.standard_normal(length).astype(np.float32)
    if n_fft == 1024:
        w = torch.nn.functional.pad(_torch_hann(512), (0, 512))
    else:
        w = _torch_hann(n_fft)
    spec = torch.stft(torch.from_numpy(x), n_fft, hop_length=hop,
                      window=w, center=True, onesided=True, return_complex=True,
                      pad_mode="constant")

    for L in (length, length - 100):
        ref = torch.istft(spec, n_fft, hop_length=hop, win_length=n_fft, window=w,
                          center=True, onesided=True, length=L).numpy()
        ours = np.asarray(istft(jnp.asarray(spec.numpy()), jnp.asarray(w.numpy()),
                                n_fft=n_fft, hop_length=hop, length=L))
        assert ours.shape == ref.shape
        # tail samples sit under a tiny OLA envelope for the right-padded
        # window, amplifying fp32 FFT rounding — hence the looser atol.
        np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_istft_padded_frames_parity(rng):
    """The model pads the frame axis to a multiple of 16 before istft
    (ncsnpp.py:481-484); the padded frames change the OLA envelope at the
    tail, so parity must hold for the padded case too."""
    n_fft, hop, length = 510, 128, 65536
    x = rng.standard_normal(length).astype(np.float32)
    w = _torch_hann(n_fft)
    spec = torch.stft(torch.from_numpy(x), n_fft, hop_length=hop, window=w,
                      center=True, return_complex=True)
    spec_padded = torch.nn.functional.pad(spec, (0, 16 - spec.shape[-1] % 16))
    ref = torch.istft(spec_padded, n_fft, hop_length=hop, window=w,
                      center=True, length=length).numpy()
    ours_spec = pad_spec_frames(jnp.asarray(spec.numpy()), 16)
    ours = np.asarray(istft(ours_spec, jnp.asarray(w.numpy()),
                            n_fft=n_fft, hop_length=hop, length=length))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_stft_istft_roundtrip(rng):
    x = rng.standard_normal(65536).astype(np.float32)
    w = hann_window(510)
    spec = stft(jnp.asarray(x), w, n_fft=510, hop_length=128)
    y = istft(spec, w, n_fft=510, hop_length=128, length=65536)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_fft_convolve_parity(rng):
    """fast_apply_RIR parity (reverb_utils.py:25-60)."""
    import sys
    y = rng.standard_normal((2, 4096)).astype(np.float32)
    h = rng.standard_normal(1500).astype(np.float32) * np.exp(-np.arange(1500) / 300)
    h = h.astype(np.float32)
    # torch reference computation, reproduced numerically (full FFT conv at
    # next-pow2(N+M-1), crop to N, real part):
    n, m = y.shape[-1], h.shape[-1]
    fft_size = int(2 ** np.ceil(np.log2(n + m - 1)))
    ref = np.fft.ifft(np.fft.fft(y, fft_size) * np.fft.fft(h, fft_size))[..., :n].real
    ours = np.asarray(fft_convolve(jnp.asarray(y), jnp.asarray(h)))
    np.testing.assert_allclose(ours, ref, atol=2e-3)
    # and against a direct convolution ground truth
    direct = np.stack([np.convolve(yi, h)[:n] for yi in y])
    np.testing.assert_allclose(ours, direct, atol=2e-3)


def test_hilbert_parity(rng):
    h = rng.standard_normal(2048).astype(np.float32)
    th = torch.from_numpy(h)
    window = 2 * torch.heaviside(torch.linspace(-1, 1, steps=2048), values=torch.ones(1))
    window = torch.flip(window, dims=(-1,))
    ref = torch.fft.ifft(window * torch.fft.fft(th)).numpy()
    ours = np.asarray(hilbert(jnp.asarray(h)))
    np.testing.assert_allclose(ours.real, ref.real, atol=1e-3)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=1e-3)


def test_minimum_phase_parity(rng):
    """minimum_phase_version parity (reverb_utils.py:9-23)."""
    h = (rng.standard_normal(1600) * np.exp(-np.arange(1600) / 200)).astype(np.float32)
    h[0] = 1.0

    th = torch.from_numpy(h)
    t_orig = th.size(-1)
    hp = torch.nn.functional.pad(th, (0, t_orig))
    H = torch.fft.fft(hp)
    log_abs = torch.log(torch.abs(H) + 1e-8)
    window = 2 * torch.heaviside(torch.linspace(-1, 1, steps=hp.size(-1)), values=torch.ones(1))
    window = torch.flip(window, dims=(-1,))
    min_phase = -torch.imag(torch.fft.ifft(window * torch.fft.fft(log_abs)))
    ref = torch.real(torch.fft.ifft(torch.abs(H).type(torch.complex64) * torch.exp(1j * min_phase)))
    ref = ref[:-t_orig].numpy()

    ours = np.asarray(minimum_phase_version(jnp.asarray(h)))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_numpy_window_takes_folded_path(monkeypatch):
    """hann_window returns host numpy and stft/istft route numpy windows
    through the window-folded DFT bases (one fewer elementwise pass per
    transform on TPU) — pin the dispatch so a refactor can't silently fall
    back to the slower traced path."""
    import buddy_tpu.ops.dft as dft_mod
    import buddy_tpu.ops.stft as stft_mod

    w = hann_window(510)
    assert isinstance(w, np.ndarray)

    calls = {"rfft_w": 0, "irfft_w": 0}
    orig_r, orig_i = dft_mod.rfft_windowed, dft_mod.irfft_windowed

    def count_r(x, window, n):
        calls["rfft_w"] += 1
        return orig_r(x, window, n)

    def count_i(X, window, n):
        calls["irfft_w"] += 1
        return orig_i(X, window, n)

    monkeypatch.setattr(dft_mod, "rfft_windowed", count_r)
    monkeypatch.setattr(dft_mod, "irfft_windowed", count_i)
    # this test pins the folded-MATMUL dispatch; the conv formulation (its
    # own test above) bypasses rfft_windowed entirely
    monkeypatch.setenv("BUDDY_STFT_CONV", "0")
    stft.clear_cache()
    istft.clear_cache()
    try:
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 4096)).astype(np.float32))
        X = stft(x, w, n_fft=510, hop_length=128)
        y = istft(X, w, n_fft=510, hop_length=128, length=4096)
        assert y.shape == (1, 4096)
        assert calls["rfft_w"] == 1 and calls["irfft_w"] == 1
    finally:
        stft.clear_cache()
        istft.clear_cache()


@pytest.mark.parametrize("n_fft,win,hop,pad_mode,length", [
    (1024, 512, 128, "constant", 65536),  # operator STFT (padded window)
    (512, 512, 128, "constant", 16384),   # WPE STFT
    (510, 510, 128, "reflect", 33600),    # model STFT (n_fft % hop != 0)
])
def test_conv_stft_istft_paths_match(monkeypatch, rng, n_fft, win, hop,
                                     pad_mode, length):
    """BUDDY_STFT_CONV=1 (framing+DFT as one stride-1 conv over hop-blocks,
    ops/stft.py:_stft_conv/_istft_conv — the TPU serving path) computes the
    same values AND gradients as the polyphase+DFT reference path."""
    import jax

    w = hann_window(win)
    if win < n_fft:
        w = np.pad(w, (0, n_fft - win))
    x = rng.standard_normal((2, length)).astype(np.float32)

    def run(flag):
        monkeypatch.setenv("BUDDY_STFT_CONV", flag)
        stft.clear_cache()
        istft.clear_cache()
        X = stft(jnp.asarray(x), w, n_fft=n_fft, hop_length=hop,
                 pad_mode=pad_mode)
        y = istft(X * (1 + 0.25j), w, n_fft=n_fft, hop_length=hop,
                  length=length)

        def loss(xx):
            Xl = stft(xx, w, n_fft=n_fft, hop_length=hop, pad_mode=pad_mode)
            yl = istft(Xl * (1 + 0.25j), w, n_fft=n_fft, hop_length=hop,
                       length=length)
            return jnp.sum(yl ** 2)
        g = jax.grad(loss)(jnp.asarray(x))
        return np.asarray(X), np.asarray(y), np.asarray(g)

    try:
        X0, y0, g0 = run("0")
        X1, y1, g1 = run("1")
    finally:
        stft.clear_cache()
        istft.clear_cache()
    np.testing.assert_allclose(X1, X0, atol=2e-5 * np.abs(X0).max())
    # rtol covers the boundary frames where the tiny window-squared envelope
    # amplifies f32 rounding into O(1e-3) absolute differences
    np.testing.assert_allclose(y1, y0, rtol=2e-4,
                               atol=2e-5 * np.abs(y0).max())
    np.testing.assert_allclose(g1, g0, rtol=1e-3,
                               atol=2e-5 * np.abs(g0).max())


def test_conv_path_dispatch_pinned(monkeypatch):
    """BUDDY_STFT_CONV=1 must actually route through _stft_conv/_istft_conv
    (the TPU serving path) — guards against a refactor silently falling
    back to the slower polyphase machinery."""
    import buddy_tpu.ops.stft  # noqa: F401 — module object via sys.modules
    import sys
    stft_mod = sys.modules["buddy_tpu.ops.stft"]

    calls = {"stft": 0, "istft": 0}
    orig_s, orig_i = stft_mod._stft_conv, stft_mod._istft_conv

    def count_s(*a, **k):
        calls["stft"] += 1
        return orig_s(*a, **k)

    def count_i(*a, **k):
        calls["istft"] += 1
        return orig_i(*a, **k)

    monkeypatch.setattr(stft_mod, "_stft_conv", count_s)
    monkeypatch.setattr(stft_mod, "_istft_conv", count_i)
    monkeypatch.setenv("BUDDY_STFT_CONV", "1")
    stft.clear_cache()
    istft.clear_cache()
    try:
        w = hann_window(510)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 4096)).astype(np.float32))
        X = stft(x, w, n_fft=510, hop_length=128)
        y = istft(X, w, n_fft=510, hop_length=128, length=4096)
        assert y.shape == (1, 4096)
        assert calls["stft"] == 1 and calls["istft"] == 1
    finally:
        stft.clear_cache()
        istft.clear_cache()
