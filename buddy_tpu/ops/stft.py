"""STFT / ISTFT with torch.stft semantic parity, in pure JAX.

Every loss and operator in BUDDy depends on exact torch.stft/istft semantics
(reference: networks/ncsnpp.py:473-496 for the model's 510/128 hann STFT and
testing/operators/subband_filtering.py:76-80 for the operators' 1024/128
padded-window STFT).  This module reproduces:

* center=True padding of ``n_fft//2`` on both sides (``reflect`` is the
  torch.stft default used by the model; the operators pass ``constant``),
* frame extraction at hop intervals followed by a windowed rfft,
* istft overlap-add with window-squared-envelope normalization, center
  trimming, and the ``length`` crop.

The window is always expected at full ``n_fft`` length (the reference either
uses win_length == n_fft, or explicitly right-pads a shorter window to n_fft,
subband_filtering.py:34 — so torch's centered window padding never triggers).

TPU notes: framing/OLA are reshapes + slice-adds (no gather/scatter).  The
per-frame rfft/irfft go through ops/dft.py: on TPU these short transforms run
as MXU matmuls against constant DFT matrices (XLA's TPU FFT runs them at
~100 GFLOP/s — see dft.py); on CPU they stay jnp.fft.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from buddy_tpu.ops import dft


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window — torch.hann_window(n, periodic=True) parity."""
    # periodic=True means the window is hann(n+1)[:-1]: 0.5*(1-cos(2*pi*k/n)).
    k = np.arange(n)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))
    return jnp.asarray(w, dtype=dtype)


def _frame_polyphase(x: jax.Array, n_fft: int, hop: int, n_frames: int) -> jax.Array:
    """Extract overlapping frames with reshapes/slices only (no gather).

    Frames t = k*g + r (g = ceil(n_fft/hop)) within one phase group r are
    spaced g*hop >= n_fft apart, i.e. non-overlapping — so each group is a
    plain strided reshape.  Gathers serialize badly on TPU; this is pure
    layout work.
    """
    g = -(-n_fft // hop)
    span = g * hop
    k_max = -(-n_frames // g)
    total = (g - 1) * hop + k_max * span
    pad = total - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    groups = []
    for r in range(g):
        seg = jax.lax.slice_in_dim(x, r * hop, r * hop + k_max * span, axis=-1)
        seg = seg.reshape(x.shape[:-1] + (k_max, span))[..., :n_fft]
        groups.append(seg)
    frames = jnp.stack(groups, axis=-2)           # (..., k_max, g, n_fft)
    frames = frames.reshape(x.shape[:-1] + (k_max * g, n_fft))
    return frames[..., :n_frames, :]


def _overlap_add_polyphase(frames: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Inverse of _frame_polyphase: overlap-add with static pads + a sum.

    Frames within one phase group r (t = k*g + r) are non-overlapping, so
    each group flattens to a strided lane; groups are then aligned with
    STATIC zero-pads and summed.  Earlier this used a chain of
    dynamic_update_slice ops — under vmap (the batched blind-DPS program)
    those lower to SCATTERS, which serialize on TPU and were ~0.8 ms/step
    of the blind inner loop; pads + adds are layout-free and batchable.
    """
    n_frames = frames.shape[-2]
    g = -(-n_fft // hop)
    span = g * hop
    k_max = -(-n_frames // g)
    if k_max * g != n_frames:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 2)
                         + [(0, k_max * g - n_frames), (0, 0)])
    fr = frames.reshape(frames.shape[:-2] + (k_max, g, n_fft))
    if span > n_fft:
        fr = jnp.pad(fr, [(0, 0)] * (fr.ndim - 1) + [(0, span - n_fft)])
    total = (g - 1) * hop + k_max * span
    out = None
    for r in range(g):
        flat = fr[..., :, r, :].reshape(frames.shape[:-2] + (k_max * span,))
        flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1)
                       + [(r * hop, total - r * hop - k_max * span)])
        out = flat if out is None else out + flat
    # valid OLA length for n_frames frames:
    ola_len = n_fft + hop * (n_frames - 1)
    return out[..., :ola_len]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode"))
def stft(
    x: jax.Array,
    window: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """torch.stft parity (onesided, normalized=False, return_complex=True).

    Args:
        x: (..., T) real signal.
        window: (n_fft,) analysis window (already padded to n_fft).
    Returns:
        (..., n_fft//2 + 1, n_frames) complex64 spectrogram.
    """
    assert window.shape[-1] == n_fft, "window must be length n_fft (pre-padded)"
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=pad_mode)
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    frames = _frame_polyphase(x, n_fft, hop_length, n_frames)
    spec = dft.rfft(frames * window, n_fft)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, n_frames)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "length"))
def istft(
    spec: jax.Array,
    window: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """torch.istft parity (onesided, normalized=False).

    Overlap-adds windowed irfft frames, divides by the window-squared
    envelope, trims the ``center`` padding, and crops/zero-pads to ``length``.

    Args:
        spec: (..., F, n_frames) complex spectrogram with F == n_fft//2 + 1.
    Returns:
        (..., out_length) real signal.
    """
    assert window.shape[-1] == n_fft
    frames = dft.irfft(jnp.swapaxes(spec, -1, -2), n_fft)
    frames = frames * window  # synthesis window
    n_frames = frames.shape[-2]
    ola_len = n_fft + hop_length * (n_frames - 1)

    y = _overlap_add_polyphase(frames, n_fft, hop_length)

    # window-squared envelope (constant-folds when the window is a literal)
    wsq = jnp.broadcast_to(window * window, (n_frames, n_fft))
    env = _overlap_add_polyphase(wsq, n_fft, hop_length)
    # torch.istft asserts the envelope is nonzero over the output region; we
    # guard the division the same way its kernel does (tiny-envelope -> skip).
    y = y / jnp.where(env > 1e-11, env, 1.0)

    if center:
        start = n_fft // 2
        if length is not None:
            end = start + length
            # torch zero-pads if the OLA result is shorter than `length`.
            if end > ola_len:
                y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, end - ola_len)])
            y = y[..., start:end]
        else:
            y = y[..., start: ola_len - n_fft // 2]
    elif length is not None:
        if length > ola_len:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - ola_len)])
        y = y[..., :length]
    return y


def pad_spec_frames(spec: jax.Array, multiple: int = 16) -> jax.Array:
    """Zero-pad the frame axis (last) to a multiple of ``multiple``.

    Parity with the model wrapper's pad-to-16 rule (ncsnpp.py:481-484) so the
    three /2 downsamplings in the U-Net see even frame counts.
    """
    n = spec.shape[-1]
    rem = n % multiple
    if rem == 0:
        return spec
    pad = multiple - rem
    return jnp.pad(spec, [(0, 0)] * (spec.ndim - 1) + [(0, pad)])
