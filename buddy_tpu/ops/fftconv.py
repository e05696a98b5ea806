"""FFT-domain linear convolution (the reverberation forward model).

Parity target: utils/reverb_utils.py:25-60 (``fast_apply_RIR``) in the
reference — full-spectrum FFT multiply at the next power of two of N+M-1,
cropped back to the signal length.  Device-resident and differentiable in
both the signal and the filter, so DPS guidance gradients flow through it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("zero_pad",))
def fft_convolve(y: jax.Array, filt: jax.Array, *, zero_pad: bool = False) -> jax.Array:
    """Linear convolution of (..., N) signal with (M,) filter, cropped to N.

    Matches fast_apply_RIR's FFT-size rule: next power of two of N+M-1
    (or 2N+2M-1 when zero_pad), complex FFT, crop, real part.
    """
    n = y.shape[-1]
    m = filt.shape[-1]
    fft_size = _next_pow2(2 * n + 2 * m - 1 if zero_pad else n + m - 1)
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
