"""Weighted Prediction Error (WPE) dereverberation in pure JAX.

The reference warm-initializes blind DPS with nara_wpe run on CPU numpy
(EulerHeunSamplerDPS.py:32-54) — a GPU->CPU->GPU round trip.  This is a
device-resident reimplementation of the same iterative MCLP algorithm
(statistics_mode='full', single channel), vmapped over frequency bins so the
per-bin (taps x taps) solves batch onto the MXU.  It runs once per utterance
inside the jitted sampling program.

Bitwise parity with nara_wpe is out of scope (different STFT window and
numerics; the package is not installable here) — the warm init is then
scaled and buried under sigma_max-level noise, so only the rough
dereverberation quality matters (SURVEY.md §7, RNG-discipline note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from buddy_tpu.ops.stft import stft, istft, hann_window


def _build_y_tilde(Y: jax.Array, taps: int, delay: int) -> jax.Array:
    """Stack delayed copies: Ytilde[k, t] = Y[t - delay - k], zeros for t<0.

    Y: (T,) complex for one frequency bin -> (taps, T).
    """
    T = Y.shape[-1]
    # roll wraps; mask the wrapped head explicitly
    idx = jnp.arange(T)
    def tap(k):
        rolled = jnp.roll(Y, delay + k)
        return jnp.where(idx >= delay + k, rolled, 0.0)
    return jax.vmap(tap)(jnp.arange(taps))


def _wpe_single_bin(Y: jax.Array, taps: int, delay: int, iterations: int,
                    eps: float = 1e-10, diag_rel: float = 1e-6) -> jax.Array:
    """WPE for one frequency bin, single channel. Y: (T,) complex."""
    Yt = _build_y_tilde(Y, taps, delay)  # (taps, T)

    def body(X, _):
        power = jnp.maximum(jnp.abs(X) ** 2, eps)      # (T,)
        Yt_norm = Yt / power[None, :]
        R = Yt_norm @ jnp.conj(Yt).T                    # (taps, taps)
        P = Yt_norm @ jnp.conj(Y)                       # (taps,)
        # LU solve: R is Hermitian PSD so a Cholesky solve would be ~2x
        # cheaper, but complex cholesky/triangular_solve are UNIMPLEMENTED
        # on the axon TPU backend (probed 2026-08: NaN or runtime error) —
        # keep the batched LU, it is a one-time ~2% cost per run.
        # Scale-relative diagonal loading: nara_wpe solves in float64 where
        # the bare normal equations survive; in complex64 the solve is so
        # ill-conditioned that 1e-7-level input noise flips the output
        # quality.  trace-scaled loading (measured on the synthetic-reverb
        # gate) makes the result perturbation-stable AND lowers the residual
        # error (0.141 vs 0.172 MSE at diag_rel=1e-6).
        load = diag_rel * (jnp.trace(R).real / taps) + eps
        G = jnp.linalg.solve(R + load * jnp.eye(taps, dtype=R.dtype), P)
        X_new = Y - jnp.conj(G) @ Yt
        return X_new, None

    X, _ = jax.lax.scan(body, Y, None, length=iterations)
    return X


@functools.partial(jax.jit, static_argnames=("taps", "delay", "iterations",
                                             "size", "shift"))
def wpe_dereverb(y: jax.Array, *, taps: int = 50, delay: int = 2,
                 iterations: int = 5, size: int = 512, shift: int = 128) -> jax.Array:
    """Dereverberate a (..., T) waveform with single-channel WPE.

    STFT (hann size/shift) -> per-bin MCLP -> ISTFT, matching the reference's
    stft_options size=512, shift=128 (EulerHeunSamplerDPS.py:34).
    """
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    T = y.shape[-1]
    window = hann_window(size)
    Y = stft(y, window, n_fft=size, hop_length=shift, pad_mode="constant")
    # (..., F, frames) -> vmap over batch and frequency
    wpe_bin = functools.partial(_wpe_single_bin, taps=taps, delay=delay,
                                iterations=iterations)
    X = jax.vmap(jax.vmap(wpe_bin))(Y)
    x = istft(X, window, n_fft=size, hop_length=shift, length=T)
    return x[0] if squeeze else x
