"""Reconstruction-loss factory for posterior sampling.

Parity target: utils/losses.py in the reference — STFT-domain L2 variants
(raw, magnitude, log-magnitude, power-law-compressed, log-compressed) with
optional frequency weighting and hybrid multi-loss composition, plus plain
time-domain l2_sum/l2_mean.  Losses close over the operator's ``apply_stft``
(the 1024/512/128 padded-hann STFT) exactly as the reference does.

All losses are real scalars of real/complex arrays, so ``jax.grad`` through
them follows the same Wirtinger convention torch autograd uses for these
real-valued objectives.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def get_frequency_weighting(freqs, freq_weighting: Optional[str] = None):
    if freq_weighting is None or freq_weighting == "none":
        return jnp.ones_like(freqs)
    if freq_weighting == "sqrt":
        return jnp.sqrt(freqs)
    if freq_weighting == "exp":
        f = jnp.exp(freqs)
        return f - f[:, 0, :][:, None, :]
    if freq_weighting == "log":
        return jnp.log(1 + freqs)
    if freq_weighting == "linear":
        return freqs
    raise NotImplementedError(freq_weighting)


def _safe_mag_phase(X):
    """|X| and X/|X| with zero-safe gradients.

    torch's abs/angle backward returns 0 at X == 0 (the zero-padded STFT
    frames every apply_stft produces); naive jnp.abs/jnp.angle gives NaN
    there.  The double-where pattern pins both primal and gradient to the
    torch behavior.
    """
    zero = (X.real == 0) & (X.imag == 0)
    safe = jnp.where(zero, 1.0 + 0.0j, X)
    mag = jnp.where(zero, 0.0, jnp.abs(safe))
    phase = jnp.where(zero, 1.0 + 0.0j, safe / jnp.abs(safe))
    return mag, phase


def _compress(X, factor: float):
    """Power-law compression ``(|X|+1e-8)^c * e^{j angle(X)}``.

    Computed as ``X * (|X|+1e-8)^c / |X|`` — same math (the unit phasor is
    X/|X|), but the complex division by |X| collapses into a single real
    scale factor: no angle/exp pass and one complex-by-real multiply
    instead of a complex divide + complex multiply.  The backend doesn't
    fuse standalone elementwise chains (CLAUDE.md gotcha 6) and this chain
    runs 2x per inner update x 10 updates x T steps over the full
    spectrogram, so every dropped pass is HBM bandwidth saved.  Zero bins
    keep the torch abs/angle convention: value (1e-8)^c + 0j, gradient 0.
    """
    zero = (X.real == 0) & (X.imag == 0)
    safe = jnp.where(zero, 1.0 + 0.0j, X)
    mag = jnp.abs(safe)
    scale = (mag + 1e-8) ** factor / mag
    return jnp.where(zero, (1e-8) ** factor + 0.0j, safe * scale)


def get_loss(loss_args, operator=None) -> Optional[Callable]:
    """Build a loss closure from a config node (losses.py:17-95)."""
    if loss_args is None or loss_args["name"] == "none":
        return None

    if "loss_1" in loss_args:  # hybrid of multiple losses
        subs = [get_loss(loss_args[k], operator=operator) for k in loss_args.keys()]
        subs = [s for s in subs if s is not None]
        return lambda x, x_hat: sum(s(x, x_hat) for s in subs)

    name = loss_args["name"]
    weight = float(loss_args.get("weight", 1.0))

    if "stft" in name:
        freq_weighting = loss_args.get("freq_weighting", None)
        compression_factor = loss_args.get("compression_factor", None)

        # Every STFT variant is sum/mean of |T(X) - T(X_hat)|^2 for a
        # per-variant transform T; factoring the loss this way lets callers
        # hoist T(y) out of the blind inner loop (500 evaluations per run)
        # via ``loss_fn.prepare`` — identical numerics, hoisted compute.
        if name in ("l2_comp_stft_sum", "l2_comp_stft_mean", "l2_comp_stft_summean"):
            assert compression_factor is not None and 0 < compression_factor <= 1

        def transform(x):
            # a complex input is an already-computed STFT — callers cache the
            # constant observation spectrum across the blind inner loop
            X = x if jnp.iscomplexobj(x) else operator.apply_stft(x)
            if freq_weighting is not None and freq_weighting != "none":
                freqs = jnp.linspace(0, 1, X.shape[-2])[None, :, None] + 1
                freqs = jnp.broadcast_to(freqs, X.shape)
                X = X * get_frequency_weighting(freqs, freq_weighting)
            if name == "l2_stft_sum":
                return X
            if name == "l2_stft_mag_sum":
                return _safe_mag_phase(X)[0]
            if name == "l2_stft_logmag_sum":
                return jnp.log10(_safe_mag_phase(X)[0] + 1e-8)
            if name in ("l2_comp_stft_sum", "l2_comp_stft_mean", "l2_comp_stft_summean"):
                return _compress(X, compression_factor)
            if name == "l2_log_stft_sum":
                # log(1+|X|) * X/|X| with the same collapsed real-scale
                # trick (and zero convention) as _compress
                zero = (X.real == 0) & (X.imag == 0)
                safe = jnp.where(zero, 1.0 + 0.0j, X)
                mag = jnp.abs(safe)
                return jnp.where(zero, 0.0 + 0.0j,
                                 safe * (jnp.log1p(mag) / mag))
            raise NotImplementedError(f"rec_loss {name} not implemented")

        def loss_fn(x, x_hat, x_prepared: bool = False):
            A = x if x_prepared else transform(x)
            B = transform(x_hat)
            d = A - B
            err = (d.real ** 2 + d.imag ** 2) if jnp.iscomplexobj(d) else d ** 2
            if name == "l2_comp_stft_mean":
                return weight * jnp.mean(err)
            if name == "l2_comp_stft_summean":
                return weight * jnp.mean(jnp.sum(err, axis=-2))
            return weight * jnp.sum(err)

        loss_fn.prepare = transform
        return loss_fn

    if name == "l2_sum":
        return lambda x, x_hat: weight * jnp.sum((x - x_hat) ** 2)
    if name == "l2_mean":
        return lambda x, x_hat: weight * jnp.mean((x - x_hat) ** 2)
    raise NotImplementedError(f"rec_loss {name} not implemented")
