"""Small DFTs as MXU matmuls (TPU) with jnp.fft fallback (CPU).

Why this exists: the blind-DPS inner loop performs ~100 short transforms per
diffusion step (frame-axis convolutions of the subband filter, 1024-point
per-frame STFT/ISTFT inside the cons() projection, the loss re-STFT of
y_hat).  Profiling on the v5e (BENCH_builder_r03 trace) shows XLA's TPU FFT
running these at ~100 GFLOP/s — ~0.05% of the chip's matmul rate — for
43 ms of every 232 ms step.  A transform of length N is a matmul against a
constant (N x N-ish) cos/sin matrix; for the N <= 4096 sizes used here the
MXU does that 1-2 orders of magnitude faster than the FFT path, and the
constants (<= ~4 MB) fit comfortably.

Matmul precision (BUDDY_DFT_PRECISION = default|high|highest, default
"default"): the MXU multiplies in bf16 but ACCUMULATES in f32, so DEFAULT
costs only the ~2^-9 relative rounding of the matmul *inputs* — the same
order as the bf16 U-Net body noise already validated end-to-end by
tests/test_mixed_precision.py — while running 13x faster than HIGHEST on
this chip (scripts/tpu_dft_precision_probe.py: 407 vs 31 TFLOP/s at the
per-frame STFT shape; at HIGHEST the matmul DFTs cost as much as the FFTs
they replace).  On the CPU backend XLA ignores the precision flag and
computes full f32, so the forced-matmul parity tests stay tight.

Autodiff: these are plain dot_generals, so JAX derives the exact transposed
matmuls — identical adjoint semantics to the FFT primitives they replace.

Fallback control: BUDDY_DFT_MATMUL=0 forces jnp.fft everywhere, =1 forces
matmul (used by the CPU parity tests), unset/auto picks matmul only on
non-CPU backends.

Reference behaviors reproduced (for parity bookkeeping): torch.stft/istft's
per-frame rfft/irfft (aten FFT), torch.fft.fft/ifft along the frame axis in
subband_filtering (testing/operators/subband_filtering.py:67-74).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_MAX_MM_N = 4096
_MAX_2STAGE_N = 262144


def _prec():
    name = os.environ.get("BUDDY_DFT_PRECISION", "default")
    return {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[name]


def _enabled() -> bool:
    env = os.environ.get("BUDDY_DFT_MATMUL", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() != "cpu"


def use_matmul(n: int) -> bool:
    return n <= _MAX_MM_N and _enabled()


def _balanced_factor(n: int):
    """Factor n = n1 * n2 with both <= _MAX_MM_N, as balanced as possible.
    Returns None if n is prime or a factor would exceed the matmul cutoff."""
    best = None
    f = 1
    while f * f <= n:
        if n % f == 0:
            n1, n2 = f, n // f
            if n2 <= _MAX_MM_N:
                best = (n2, n1)  # larger first: bigger contraction on stage 1
        f += 1
    return best


def _mm(a: jax.Array, b: np.ndarray) -> jax.Array:
    return jnp.matmul(a, jnp.asarray(b), precision=_prec())


# ---------------------------------------------------------------------------
# real transforms (per-frame STFT/ISTFT)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _rdft_mats(n: int):
    k = np.arange(n, dtype=np.float64)[:, None]
    f = np.arange(n // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * f / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def rfft(x: jax.Array, n: int) -> jax.Array:
    """jnp.fft.rfft(x, axis=-1) for x with trailing length n."""
    assert x.shape[-1] == n
    if not use_matmul(n):
        return jnp.fft.rfft(x, axis=-1)
    C, S = _rdft_mats(n)
    return jax.lax.complex(_mm(x, C), _mm(x, S))


@functools.lru_cache(maxsize=None)
def _irdft_mats(n: int):
    F = n // 2 + 1
    f = np.arange(F, dtype=np.float64)[:, None]
    t = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * f * t / n
    scale = np.full((F, 1), 2.0 / n)
    scale[0, 0] = 1.0 / n
    if n % 2 == 0:
        scale[-1, 0] = 1.0 / n
    # sin(ang) is exactly 0 at the DC/Nyquist rows, so the imaginary parts of
    # X[0] and X[n/2] drop out — same convention as the c2r FFT.
    return ((np.cos(ang) * scale).astype(np.float32),
            (-np.sin(ang) * scale).astype(np.float32))


def irfft(X: jax.Array, n: int) -> jax.Array:
    """jnp.fft.irfft(X, n=n, axis=-1) for X with trailing length n//2+1."""
    assert X.shape[-1] == n // 2 + 1
    if not use_matmul(n):
        return jnp.fft.irfft(X, n=n, axis=-1)
    C, S = _irdft_mats(n)
    return _mm(jnp.real(X), C) + _mm(jnp.imag(X), S)


# ---------------------------------------------------------------------------
# window-folded real transforms: rfft(x * w) / irfft(X) * w with the window
# baked into the constant DFT matrix.  Saves one full elementwise pass over
# the frames tensor per transform — forward AND backward — on a backend that
# does not fuse standalone elementwise chains (CLAUDE.md gotcha 6).  The fold
# happens in float64 before the single f32 rounding, so it is slightly MORE
# accurate than the two-step f32 multiply it replaces.
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _np_window(wbytes: bytes, wdtype: str, n: int) -> np.ndarray:
    return np.frombuffer(wbytes, dtype=np.dtype(wdtype)).reshape(n)


@functools.lru_cache(maxsize=None)
def _rdft_windowed_mats(n: int, wbytes: bytes, wdtype: str):
    w = _np_window(wbytes, wdtype, n).astype(np.float64)[:, None]
    k = np.arange(n, dtype=np.float64)[:, None]
    f = np.arange(n // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * f / n
    return ((w * np.cos(ang)).astype(np.float32),
            (w * -np.sin(ang)).astype(np.float32))


def rfft_windowed(x: jax.Array, window: np.ndarray, n: int) -> jax.Array:
    """jnp.fft.rfft(x * window, axis=-1); ``window`` must be a host numpy
    array (a trace-time constant) of trailing length n."""
    assert x.shape[-1] == n and window.shape[-1] == n
    if not use_matmul(n):
        return jnp.fft.rfft(x * jnp.asarray(window, x.dtype), axis=-1)
    C, S = _rdft_windowed_mats(n, window.tobytes(), str(window.dtype))
    return jax.lax.complex(_mm(x, C), _mm(x, S))


@functools.lru_cache(maxsize=None)
def _irdft_windowed_mats(n: int, wbytes: bytes, wdtype: str):
    w = _np_window(wbytes, wdtype, n).astype(np.float64)[None, :]
    F = n // 2 + 1
    f = np.arange(F, dtype=np.float64)[:, None]
    t = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * f * t / n
    scale = np.full((F, 1), 2.0 / n)
    scale[0, 0] = 1.0 / n
    if n % 2 == 0:
        scale[-1, 0] = 1.0 / n
    return ((np.cos(ang) * scale * w).astype(np.float32),
            (-np.sin(ang) * scale * w).astype(np.float32))


def irfft_windowed(X: jax.Array, window: np.ndarray, n: int) -> jax.Array:
    """jnp.fft.irfft(X, n=n, axis=-1) * window with a host-numpy window."""
    assert X.shape[-1] == n // 2 + 1 and window.shape[-1] == n
    if not use_matmul(n):
        return jnp.fft.irfft(X, n=n, axis=-1) * jnp.asarray(window)
    C, S = _irdft_windowed_mats(n, window.tobytes(), str(window.dtype))
    return _mm(jnp.real(X), C) + _mm(jnp.imag(X), S)


# ---------------------------------------------------------------------------
# complex transforms (frame-axis convolution of the subband filter)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _cdft_mats(n_in: int, n: int):
    l = np.arange(n_in, dtype=np.float64)[:, None]
    k = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * l * k / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _cmm(x: jax.Array, Wr: np.ndarray, Wi: np.ndarray) -> jax.Array:
    """Complex matmul of (possibly real) x against constant W = Wr + i*Wi."""
    xr, xi = jnp.real(x), jnp.imag(x)
    if jnp.iscomplexobj(x):
        return jax.lax.complex(_mm(xr, Wr) - _mm(xi, Wi),
                               _mm(xr, Wi) + _mm(xi, Wr))
    return jax.lax.complex(_mm(xr, Wr), _mm(xr, Wi))


def cfft(x: jax.Array, n: int) -> jax.Array:
    """jnp.fft.fft(x, n=n, axis=-1): complex (or real) x, trailing length
    <= n (implicitly zero-padded to n — the matmul contracts over only the
    nonzero inputs, so short inputs are cheaper, not padded)."""
    n_in = x.shape[-1]
    assert n_in <= n
    if use_matmul(n):
        Wr, Wi = _cdft_mats(n_in, n)
        return _cmm(x, Wr, Wi)
    if _enabled() and n <= _MAX_2STAGE_N and _balanced_factor(n) is not None:
        return _cfft_2stage(x, n)
    return jnp.fft.fft(x, n=n, axis=-1)


def icfft(Z: jax.Array, n: int) -> jax.Array:
    """jnp.fft.ifft along the last axis (trailing length n), routed through
    the same matmul machinery via ifft(z) = conj(fft(conj(z)))/n."""
    assert Z.shape[-1] == n
    if not _enabled() or (n > _MAX_2STAGE_N) or (
            n > _MAX_MM_N and _balanced_factor(n) is None):
        return jnp.fft.ifft(Z, axis=-1)
    return jnp.conj(cfft(jnp.conj(Z), n)) / n


@functools.lru_cache(maxsize=None)
def _twiddle_mats(n1: int, n2: int):
    n = n1 * n2
    r = np.arange(n1, dtype=np.float64)[:, None]
    q = np.arange(n2, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * r * q / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _cfft_2stage(x: jax.Array, n: int) -> jax.Array:
    """Cooley-Tukey DFT_n as two matmul-DFT stages (n = n1 * n2), for the
    long transforms (the 25856-point minimum-phase/Hilbert FFTs) where the
    backend's native FFT is slowest.  With n = n2*p + q (p < n1, q < n2) and
    k = n1*s + r:  X[n1*s+r] = DFT_n2_q( tw[r,q] * DFT_n1_p(x[p,q])[r,q] ).
    """
    n1, n2 = _balanced_factor(n)
    n_in = x.shape[-1]
    if n_in < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - n_in)])
    xm = x.reshape(x.shape[:-1] + (n1, n2))
    # stage 1: DFT over p (axis -2) -> index r
    W1r, W1i = _cdft_mats(n1, n1)
    A = jnp.swapaxes(_cmm(jnp.swapaxes(xm, -1, -2), W1r, W1i), -1, -2)
    # twiddle (r, q)
    twr, twi = _twiddle_mats(n1, n2)
    B = A * jax.lax.complex(jnp.asarray(twr), jnp.asarray(twi))
    # stage 2: DFT over q (axis -1) -> index s
    W2r, W2i = _cdft_mats(n2, n2)
    C = _cmm(B, W2r, W2i)                        # (..., r, s)
    # X[n1*s + r] = C[r, s]  ->  row-major layout is (s, r)
    return jnp.swapaxes(C, -1, -2).reshape(x.shape[:-1] + (n,))


@functools.lru_cache(maxsize=None)
def _icdft_slice_mats(n: int, offset: int, length: int):
    k = np.arange(n, dtype=np.float64)[:, None]
    t = (np.arange(length, dtype=np.float64) + offset)[None, :]
    ang = 2.0 * np.pi * k * t / n
    return ((np.cos(ang) / n).astype(np.float32),
            (np.sin(ang) / n).astype(np.float32))


def icfft_slice(Z: jax.Array, n: int, offset: int, length: int) -> jax.Array:
    """jnp.fft.ifft(Z, axis=-1)[..., offset:offset+length] in one transform:
    the inverse DFT matrix keeps only the ``length`` output columns actually
    consumed (the valid window of the frame-axis convolution)."""
    assert Z.shape[-1] == n and offset + length <= n
    if not use_matmul(n):
        full = jnp.fft.ifft(Z, axis=-1)
        return jax.lax.dynamic_slice_in_dim(full, offset, length, axis=-1)
    Vr, Vi = _icdft_slice_mats(n, offset, length)
    Zr, Zi = jnp.real(Z), jnp.imag(Z)
    return jax.lax.complex(_mm(Zr, Vr) - _mm(Zi, Vi),
                           _mm(Zr, Vi) + _mm(Zi, Vr))
