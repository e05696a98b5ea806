"""FFT-domain linear convolution (the reverberation forward model).

Parity target: utils/reverb_utils.py:25-60 (``fast_apply_RIR``) in the
reference — full-spectrum FFT multiply at the next power of two of N+M-1,
cropped back to the signal length.  Device-resident and differentiable in
both the signal and the filter, so DPS guidance gradients flow through it.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def good_fft_size(n: int, policy: str | None = None) -> int:
    """Smallest efficient FFT length >= n.

    The reference always rounds to the next power of two
    (reverb_utils.py:31), which over-pads the blind inner loop's
    frame-axis convolutions by ~67% (612 -> 1024).  XLA's FFT handles
    mixed radices, so the default policy picks the smallest 5-smooth
    (2^a*3^b*5^c) length — identical math (linear conv is cropped), just
    less of it.  BUDDY_FFT_SIZE_POLICY=pow2|smooth5|exact overrides.
    """
    n = int(n)
    policy = policy or os.environ.get("BUDDY_FFT_SIZE_POLICY", "smooth5")
    if policy == "exact":
        return n
    pow2 = _next_pow2(n)
    if policy == "pow2":
        return pow2
    assert policy == "smooth5", policy
    best = pow2
    f5 = 1
    while f5 < best:
        f35 = f5
        while f35 < best:
            f = f35
            while f < n:
                f *= 2
            best = min(best, f)
            f35 *= 3
        f5 *= 5
    return best


@functools.partial(jax.jit, static_argnames=("zero_pad",))
def fft_convolve(y: jax.Array, filt: jax.Array, *, zero_pad: bool = False) -> jax.Array:
    """Linear convolution of (..., N) signal with (M,) filter, cropped to N.

    The reference sizes the FFT at the next power of two of N+M-1 (or
    2N+2M-1 when zero_pad, reverb_utils.py:25-60); any length >= the full
    conv gives identical cropped output, so the size policy is free to be
    smaller (good_fft_size).
    """
    n = y.shape[-1]
    m = filt.shape[-1]
    fft_size = good_fft_size(2 * n + 2 * m - 1 if zero_pad else n + m - 1)
    yf = jnp.fft.fft(y, n=fft_size, axis=-1)
    hf = jnp.fft.fft(filt, n=fft_size, axis=-1)
    out = jnp.fft.ifft(yf * hf, axis=-1)
    return out[..., :n].real


def fast_apply_rir(y: jax.Array, rir: jax.Array, *, rm_delay: bool = False) -> jax.Array:
    """Apply a room impulse response to a (..., N) waveform.

    ``rm_delay`` trims the filter at its argmax (direct path) first, as the
    reference does (reverb_utils.py:27-28).  Note argmax trimming changes the
    filter length, so it is resolved outside jit (concrete shapes).
    """
    if rm_delay:
        rir = rir[int(jnp.argmax(rir)):]
    return fft_convolve(y, rir)
