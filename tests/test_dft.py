"""Parity of the MXU matmul-DFT path (ops/dft.py) against jnp.fft.

On CPU the production code auto-selects jnp.fft, so these tests force the
matmul path (BUDDY_DFT_MATMUL=1) and compare primals AND grads against the
FFT path at every transform size the operators/model actually use:
510 (model n_fft), 1024 (operator n_fft), 625/640 (frame-conv sizes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from buddy_tpu.ops import dft


@pytest.fixture
def force_matmul(monkeypatch):
    monkeypatch.setenv("BUDDY_DFT_MATMUL", "1")


def _rand(shape, complex=False, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape).astype(np.float32)
    if complex:
        x = x + 1j * rng.standard_normal(shape).astype(np.float32)
        return jnp.asarray(x.astype(np.complex64))
    return jnp.asarray(x)


@pytest.mark.parametrize("n", [510, 1024, 64])
def test_rfft_matches_fft(force_matmul, n):
    x = _rand((3, 7, n))
    got = dft.rfft(x, n)
    want = jnp.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-5)


@pytest.mark.parametrize("n", [510, 1024, 64])
def test_irfft_matches_fft(force_matmul, n):
    X = _rand((3, 7, n // 2 + 1), complex=True)
    got = dft.irfft(X, n)
    want = jnp.fft.irfft(X, n=n, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_irfft_ignores_dc_nyquist_imag(force_matmul):
    # c2r convention: imaginary parts of bins 0 and n/2 must not leak
    n = 64
    X = _rand((2, n // 2 + 1), complex=True)
    Xz = X.at[..., 0].set(X[..., 0].real + 0j).at[..., -1].set(X[..., -1].real + 0j)
    np.testing.assert_allclose(np.asarray(dft.irfft(X, n)),
                               np.asarray(dft.irfft(Xz, n)), atol=1e-6)


@pytest.mark.parametrize("n_in,n", [(100, 625), (520, 640), (625, 625)])
def test_cfft_matches_fft_complex(force_matmul, n_in, n):
    x = _rand((5, n_in), complex=True)
    got = dft.cfft(x, n)
    want = jnp.fft.fft(x, n=n, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-5)


def test_cfft_real_input(force_matmul):
    x = _rand((4, 100))
    got = dft.cfft(x, 256)
    want = jnp.fft.fft(x, n=256, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-5)


@pytest.mark.parametrize("n,off,length", [(625, 1, 520), (640, 3, 600)])
def test_icfft_slice_matches_fft(force_matmul, n, off, length):
    Z = _rand((5, n), complex=True)
    got = dft.icfft_slice(Z, n, off, length)
    want = jnp.fft.ifft(Z, axis=-1)[..., off:off + length]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("n_in,n", [(12928, 25856), (25856, 25856), (6000, 6000)])
def test_cfft_2stage_long_matches_fft(force_matmul, n_in, n):
    """Long transforms (> matmul cutoff) run as two-stage Cooley-Tukey
    matmul DFTs — the minimum-phase/Hilbert sizes of the blind loop."""
    x = _rand((2, n_in), complex=(n_in == n))
    got = dft.cfft(x, n)
    want = jnp.fft.fft(x, n=n, axis=-1)
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4 * scale, rtol=2e-4)


def test_icfft_long_matches_fft(force_matmul):
    n = 25856
    Z = _rand((2, n), complex=True)
    got = dft.icfft(Z, n)
    want = jnp.fft.ifft(Z, axis=-1)
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4 * scale, rtol=2e-4)


def test_minimum_phase_matmul_path_matches_fft_path(monkeypatch):
    """minimum_phase_version through the matmul DFTs == the jnp.fft path."""
    from buddy_tpu.ops import minphase
    rng = np.random.default_rng(9)
    h = jnp.asarray(np.exp(-np.arange(12928) / 1500.0)[None, :]
                    * rng.standard_normal((2, 12928))).astype(jnp.float32)
    monkeypatch.setenv("BUDDY_DFT_MATMUL", "0")
    want = np.asarray(minphase.minimum_phase_version(h))
    monkeypatch.setenv("BUDDY_DFT_MATMUL", "1")
    got = np.asarray(minphase.minimum_phase_version(h))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_grads_match_fft_path(force_matmul):
    """The matmul transforms must carry the same adjoints as the FFT
    primitives they replace — grads through a conv + magnitude loss."""
    n_in, n, length = 24, 40, 30
    H = _rand((3, n_in), complex=True, seed=1)
    Xf = _rand((3, n), complex=True, seed=2)

    def loss_mm(H):
        Y = dft.icfft_slice(Xf * dft.cfft(H, n), n, 1, length)
        return jnp.sum(Y.real ** 2 + Y.imag ** 2)

    def loss_fft(H):
        Y = jnp.fft.ifft(Xf * jnp.fft.fft(H, n=n, axis=-1), axis=-1)[..., 1:1 + length]
        return jnp.sum(Y.real ** 2 + Y.imag ** 2)

    g_mm = jax.grad(loss_mm)(H)
    g_fft = jax.grad(loss_fft)(H)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_fft),
                               atol=1e-4, rtol=1e-4)


def test_stft_istft_roundtrip_matmul_path(force_matmul):
    """Full stft/istft through the matmul path reconstructs the signal.

    Uses a length no other test uses (jit caches trace-time decisions by
    shape, so sharing shapes with FFT-path tests would alias cache entries).
    """
    from buddy_tpu.ops.stft import stft, istft, hann_window
    stft.clear_cache()
    istft.clear_cache()
    try:
        n_fft, hop, T = 510, 128, 16384 + 640
        x = _rand((2, T), seed=3)
        w = hann_window(n_fft)
        X = stft(x, w, n_fft=n_fft, hop_length=hop)
        y = istft(X, w, n_fft=n_fft, hop_length=hop, length=T)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   atol=1e-4, rtol=1e-4)
    finally:
        stft.clear_cache()
        istft.clear_cache()
