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
import os

import jax
import jax.numpy as jnp
import numpy as np

from buddy_tpu.ops import dft


def _conv_enabled() -> bool:
    """Conv-formulated framing+DFT (see _stft_conv/_istft_conv below).

    auto: on wherever the matmul DFTs are on (non-CPU backends).
    BUDDY_STFT_CONV=0|1 forces.
    """
    env = os.environ.get("BUDDY_STFT_CONV", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return dft._enabled()


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


def _window_support(w: np.ndarray) -> int:
    """Length of the window's nonzero prefix (the operators right-pad a
    hann(512) to n_fft=1024, so half the DFT rows/columns are zero)."""
    nz = np.nonzero(w)[0]
    return int(nz[-1]) + 1 if len(nz) else len(w)


@functools.lru_cache(maxsize=None)
def _stft_conv_kernel(n_fft: int, hop: int, wbytes: bytes, wdtype: str):
    """Framing + windowed rfft as ONE stride-1 conv over hop-sample blocks.

    Frame t starts at t*hop, so with the signal reshaped to (nb, hop)
    blocks, spec[t] = sum_j blocks[t+j] @ W[j*hop:(j+1)*hop] — a stride-1
    conv with kernel taps = the window-folded DFT matrix cut into hop-row
    slices.  Only ceil(support/hop) taps are nonzero (the rest of the
    window is zero), so a 512-in-1024 window does HALF the FLOPs of the
    full-frame matmul — and the 8-slice+stack framing disappears.
    Stride-1 means the vjp is another stride-1 conv (no lhs dilation).
    """
    w = dft._np_window(wbytes, wdtype, n_fft)
    taps = -(-_window_support(w) // hop)
    C, S = dft._rdft_windowed_mats(n_fft, wbytes, wdtype)
    WK = np.concatenate([C, S], axis=1)               # (n_fft, 2F)
    rows = taps * hop
    if rows > n_fft:
        WK = np.pad(WK, ((0, rows - n_fft), (0, 0)))
    return np.ascontiguousarray(WK[:rows].reshape(taps, hop, WK.shape[1]))


def _stft_conv(x, window: np.ndarray, n_fft, hop, n_frames):
    K = _stft_conv_kernel(n_fft, hop, window.tobytes(), str(window.dtype))
    taps = K.shape[0]
    F = K.shape[2] // 2
    lead = x.shape[:-1]
    L = x.shape[-1]
    nb = max(-(-L // hop), n_frames - 1 + taps)
    if nb * hop - L > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, nb * hop - L)])
    blocks = x.reshape((-1, nb, hop))
    out = jax.lax.conv_general_dilated(
        blocks, jnp.asarray(K, x.dtype), window_strides=(1,),
        padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"))
    out = out[:, :n_frames]
    spec = _pair2c(out)
    return spec.reshape(lead + spec.shape[1:])  # (..., F, n_frames)


def _stft_impl(x, window, *, n_fft, hop_length, center, pad_mode):
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=pad_mode)
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    if isinstance(window, np.ndarray) and _conv_enabled():
        return _stft_conv(x, window, n_fft, hop_length, n_frames)
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


@jax.custom_vjp
def _c2pair(spec):
    """(.., F, T) complex -> (.., 2F, T) real [re; im].

    Functionally ``concat([real(spec), imag(spec)], axis=-2)``; the custom
    bwd assembles the complex cotangent as ONE lax.complex(dre, -dim)
    instead of autodiff's complex(dre,0) + complex(0,-dim) + add — two HBM
    passes instead of four, and this conversion runs in every istft-conv
    adjoint of the blind inner loop (xprof r5: the ``neg`` group was
    1.4 ms/step of the 9.7 ms non-U-Net budget)."""
    return jnp.concatenate([jnp.real(spec), jnp.imag(spec)], axis=-2)


def _c2pair_fwd(spec):
    return _c2pair(spec), None


def _c2pair_bwd(_, g):
    F = g.shape[-2] // 2
    dre = jax.lax.slice_in_dim(g, 0, F, axis=-2)
    dim = jax.lax.slice_in_dim(g, F, 2 * F, axis=-2)
    # JAX's C->R cotangent convention: d/d(spec) = dre - i*dim
    return (jax.lax.complex(dre, -dim),)


_c2pair.defvjp(_c2pair_fwd, _c2pair_bwd)


@jax.custom_vjp
def _pair2c(pair):
    """(.., T, 2F) real -> (.., F, T) complex; inverse-orientation partner
    of _c2pair for the stft-conv output (complex assembly + transpose).
    The custom bwd emits real(g.T), -imag?  — no: the cotangent of
    lax.complex under JAX's convention is (real(g), -imag(g)); fusing the
    two extractions with the transpose keeps it at two passes."""
    F = pair.shape[-1] // 2
    spec = jax.lax.complex(pair[..., :F], pair[..., F:])
    return jnp.swapaxes(spec, -1, -2)


def _pair2c_fwd(pair):
    return _pair2c(pair), None


def _pair2c_bwd(_, g):
    gs = jnp.swapaxes(g, -1, -2)
    return (jnp.concatenate([jnp.real(gs), -jnp.imag(gs)], axis=-1),)


_pair2c.defvjp(_pair2c_fwd, _pair2c_bwd)


@functools.lru_cache(maxsize=None)
def _istft_conv_kernel(n_fft: int, hop: int, wbytes: bytes, wdtype: str):
    """Windowed irfft + overlap-add as ONE stride-1 conv over the frame axis.

    Output block b (hop samples) collects y_block[b] = sum_j spec[b-j] @
    V[:, j*hop:(j+1)*hop] — the OLA's 8-lane pad/add chain becomes the
    conv's tap sum.  lax.conv with left padding (taps-1) computes
    out[b] = sum_j z[b+j-(taps-1)] K[j], so the taps are stored REVERSED
    (K[taps-1-j] = V_j).  Like the forward kernel, only
    ceil(support/hop) taps are nonzero.
    """
    w = dft._np_window(wbytes, wdtype, n_fft)
    taps = -(-_window_support(w) // hop)
    iC, iS = dft._irdft_windowed_mats(n_fft, wbytes, wdtype)
    VK = np.concatenate([iC, iS], axis=0)             # (2F, n_fft)
    cols = taps * hop
    if cols > n_fft:
        VK = np.pad(VK, ((0, 0), (0, cols - n_fft)))
    return np.ascontiguousarray(np.stack(
        [VK[:, j * hop: (j + 1) * hop] for j in reversed(range(taps))],
        axis=0))                                       # (taps, 2F, hop)


def _istft_conv(spec, window: np.ndarray, n_fft, hop):
    K = _istft_conv_kernel(n_fft, hop, window.tobytes(), str(window.dtype))
    taps = K.shape[0]
    lead = spec.shape[:-2]
    n_frames = spec.shape[-1]
    ola_len = n_fft + hop * (n_frames - 1)
    z = jnp.swapaxes(_c2pair(spec), -1, -2)            # (..., T, 2F)
    z = z.reshape((-1,) + z.shape[-2:])
    blocks = jax.lax.conv_general_dilated(
        z, jnp.asarray(K, z.dtype), window_strides=(1,),
        padding=((taps - 1, taps - 1),),
        dimension_numbers=("NHC", "HIO", "NHC"))
    y = blocks.reshape(blocks.shape[0], -1)            # (N, (T+taps-1)*hop)
    if y.shape[-1] < ola_len:                          # window support < n_fft:
        y = jnp.pad(y, [(0, 0), (0, ola_len - y.shape[-1])])  # zero OLA tail
    else:
        y = y[:, :ola_len]
    return y.reshape(lead + (ola_len,))


def _istft_impl(spec, window, *, n_fft, hop_length, center, length):
    if isinstance(window, np.ndarray):
        # synthesis window folded into the inverse-DFT matrix (no mul pass);
        # envelope computed on the host at trace time
        n_frames = spec.shape[-1]
        ola_len = n_fft + hop_length * (n_frames - 1)
        wsq = (window.astype(np.float64) ** 2)
        env_np = np.zeros(ola_len, np.float64)
        for t in range(n_frames):
            env_np[t * hop_length: t * hop_length + n_fft] += wsq
        env = jnp.asarray(np.where(env_np > 1e-11, env_np, 1.0)
                          .astype(np.float32))
        if _conv_enabled():
            y = _istft_conv(spec, window, n_fft, hop_length)
        else:
            frames = dft.irfft_windowed(jnp.swapaxes(spec, -1, -2), window,
                                        n_fft)
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
