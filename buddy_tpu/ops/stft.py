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


def hann_window(n: int, dtype=jnp.float32):
    """Periodic Hann window — torch.hann_window(n, periodic=True) parity.

    Returned as HOST numpy for float32/float64 so stft/istft can fold it
    into their constant DFT matrices (one fewer elementwise pass per
    transform — see dft.rfft_windowed); other dtypes fall back to a device
    array and the legacy multiply path.
    """
    # periodic=True means the window is hann(n+1)[:-1]: 0.5*(1-cos(2*pi*k/n)).
    k = np.arange(n)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))
    if dtype in (jnp.float32, np.float32, "float32"):
        return w.astype(np.float32)
    if dtype in (jnp.float64, np.float64, "float64"):
        return w.astype(np.float64)
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


def _stft_impl(x, window, *, n_fft, hop_length, center, pad_mode):
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=pad_mode)
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    frames = _frame_polyphase(x, n_fft, hop_length, n_frames)
    if isinstance(window, np.ndarray):
        # window folded into the constant DFT matrix: no frames*window pass
        spec = dft.rfft_windowed(frames, window, n_fft)
    else:
        spec = dft.rfft(frames * window, n_fft)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, n_frames)


@functools.lru_cache(maxsize=None)
def _stft_np_jit(wbytes, wdtype, n_fft, hop_length, center, pad_mode):
    window = np.frombuffer(wbytes, dtype=np.dtype(wdtype)).reshape(n_fft)
    return jax.jit(functools.partial(
        _stft_impl, window=window, n_fft=n_fft, hop_length=hop_length,
        center=center, pad_mode=pad_mode))


_stft_traced = functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode"))(
        lambda x, window, *, n_fft, hop_length, center, pad_mode:
        _stft_impl(x, window, n_fft=n_fft, hop_length=hop_length,
                   center=center, pad_mode=pad_mode))


def stft(
    x: jax.Array,
    window,
    *,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """torch.stft parity (onesided, normalized=False, return_complex=True).

    Args:
        x: (..., T) real signal.
        window: (n_fft,) analysis window (already padded to n_fft).  A host
            numpy window (the usual case — hann_window returns numpy) is a
            trace-time constant and gets folded into the DFT matmul.
    Returns:
        (..., n_fft//2 + 1, n_frames) complex64 spectrogram.
    """
    assert window.shape[-1] == n_fft, "window must be length n_fft (pre-padded)"
    if isinstance(window, np.ndarray):
        f = _stft_np_jit(window.tobytes(), str(window.dtype), n_fft,
                         hop_length, center, pad_mode)
        return f(x)
    return _stft_traced(x, window, n_fft=n_fft, hop_length=hop_length,
                        center=center, pad_mode=pad_mode)


def _clear_stft_cache():
    """Drop cached traces (tests flip BUDDY_DFT_MATMUL, a trace-time choice)."""
    _stft_np_jit.cache_clear()
    _stft_traced.clear_cache()


stft.clear_cache = _clear_stft_cache


def _istft_impl(spec, window, *, n_fft, hop_length, center, length):
    if isinstance(window, np.ndarray):
        # synthesis window folded into the inverse-DFT matrix (no mul pass);
        # envelope computed on the host at trace time
        frames = dft.irfft_windowed(jnp.swapaxes(spec, -1, -2), window, n_fft)
        n_frames = frames.shape[-2]
        ola_len = n_fft + hop_length * (n_frames - 1)
        wsq = (window.astype(np.float64) ** 2)
        env_np = np.zeros(ola_len, np.float64)
        for t in range(n_frames):
            env_np[t * hop_length: t * hop_length + n_fft] += wsq
        env = jnp.asarray(np.where(env_np > 1e-11, env_np, 1.0)
                          .astype(np.float32))
        y = _overlap_add_polyphase(frames, n_fft, hop_length)
        y = y / env
    else:
        frames = dft.irfft(jnp.swapaxes(spec, -1, -2), n_fft)
        frames = frames * window  # synthesis window
        n_frames = frames.shape[-2]
        ola_len = n_fft + hop_length * (n_frames - 1)
        y = _overlap_add_polyphase(frames, n_fft, hop_length)
        # window-squared envelope (constant-folds when the window is a literal)
        wsq = jnp.broadcast_to(window * window, (n_frames, n_fft))
        env = _overlap_add_polyphase(wsq, n_fft, hop_length)
        # torch.istft asserts the envelope is nonzero over the output region;
        # we guard the division the same way its kernel does.
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


@functools.lru_cache(maxsize=None)
def _istft_np_jit(wbytes, wdtype, n_fft, hop_length, center, length):
    window = np.frombuffer(wbytes, dtype=np.dtype(wdtype)).reshape(n_fft)
    return jax.jit(functools.partial(
        _istft_impl, window=window, n_fft=n_fft, hop_length=hop_length,
        center=center, length=length))


_istft_traced = functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "center", "length"))(
        lambda spec, window, *, n_fft, hop_length, center, length:
        _istft_impl(spec, window, n_fft=n_fft, hop_length=hop_length,
                    center=center, length=length))


def istft(
    spec: jax.Array,
    window,
    *,
    n_fft: int,
    hop_length: int,
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """torch.istft parity (onesided, normalized=False).

    Overlap-adds windowed irfft frames, divides by the window-squared
    envelope, trims the ``center`` padding, and crops/zero-pads to ``length``.
    A host numpy window (the usual case) folds into the inverse-DFT matmul.

    Args:
        spec: (..., F, n_frames) complex spectrogram with F == n_fft//2 + 1.
    Returns:
        (..., out_length) real signal.
    """
    assert window.shape[-1] == n_fft
    if isinstance(window, np.ndarray):
        f = _istft_np_jit(window.tobytes(), str(window.dtype), n_fft,
                          hop_length, center, length)
        return f(spec)
    return _istft_traced(spec, window, n_fft=n_fft, hop_length=hop_length,
                         center=center, length=length)


def _clear_istft_cache():
    _istft_np_jit.cache_clear()
    _istft_traced.clear_cache()


istft.clear_cache = _clear_istft_cache


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
