"""Informed reverberation operator: FFT convolution with a known RIR.

Parity target: testing/operators/reverb.py — ``degradation`` is
fast_apply_RIR (FFT convolution cropped to the input length), plus the
1024/512/128 padded-hann STFT helpers used by all STFT-domain losses
(reverb.py:54-84), with the window-energy normalization and the
half-window-delay compensation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from buddy_tpu.operators.shared import Operator
from buddy_tpu.ops.fftconv import fast_apply_rir
from buddy_tpu.ops.stft import stft as jstft, istft as jistft


class OperatorSTFT:
    """The operators' shared STFT convention (subband_filtering.py:25-65):
    n_fft=NFFT with a hann(win_length) window right-padded to n_fft,
    center=True, constant padding, hop=hop."""

    def __init__(self, op_hp, sample_rate: int = 16000):
        import numpy as np

        self.sample_rate = sample_rate
        self.n_fft = int(op_hp["NFFT"])
        self.win_length = int(op_hp["win_length"])
        assert self.n_fft >= self.win_length, \
            "n_fft must be greater than 2*win_length to avoid temporal aliasing"
        self.hop_length = int(op_hp["hop"])
        if op_hp.get("window", "hann") != "hann":
            raise NotImplementedError(f"window type {op_hp['window']} not implemented")
        assert self.hop_length <= self.win_length / 4, \
            "hop length must be less than 1/4 of win_length to avoid temporal aliasing"
        # constants kept as numpy — no eager device ops at construction;
        # they embed as literals when traced into jitted programs
        k = np.arange(self.win_length)
        w = (0.5 * (1.0 - np.cos(2.0 * np.pi * k / self.win_length))).astype(np.float32)
        wp = np.pad(w, (0, self.n_fft - self.win_length))
        self.window = w
        self.window_padded = wp
        self.win_energy_sqrt = np.float32(np.sqrt(np.sum(wp.astype(np.float64) ** 2)))
        self.freqs = np.fft.rfftfreq(self.n_fft, d=1.0 / sample_rate).astype(np.float32)

    def stft(self, x: jax.Array) -> jax.Array:
        return jstft(x, self.window_padded, n_fft=self.n_fft,
                     hop_length=self.hop_length, pad_mode="constant")

    def istft(self, X: jax.Array, length: int | None = None) -> jax.Array:
        return jistft(X, self.window_padded, n_fft=self.n_fft,
                      hop_length=self.hop_length, length=length)

    def apply_stft(self, x: jax.Array) -> jax.Array:
        """Right-pads by win_length first ("bad things happen at the end"),
        then normalizes by the window energy (subband_filtering.py:41-52)."""
        if x.ndim == 1:
            x = x[None, :]
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, self.win_length)])
        return self.stft(x) / self.win_energy_sqrt

    def apply_istft(self, X: jax.Array, length: int) -> jax.Array:
        X = X * self.win_energy_sqrt
        x = self.istft(X, length=length + self.win_length // 2)
        return x[..., self.win_length // 2:]  # centering delay compensation


class RIROperator(Operator):
    """Time-domain convolution with a known RIR (reverb.py:8-51)."""

    def __init__(self, op_hp, time_kernel_size: int = 10, sample_rate: int = 16000):
        self.time_kernel_size = time_kernel_size
        self.params = None
        self.op_stft = OperatorSTFT(op_hp, sample_rate)
        self.sample_rate = sample_rate

    # --- degradation -----------------------------------------------------
    def degradation(self, x: jax.Array, rm_delay: bool = False,
                    filt: jax.Array | None = None, **_ignored) -> jax.Array:
        """FFT-convolve with the RIR; ``filt`` overrides the stored params so
        jitted programs can thread the RIR explicitly (no closure baking)."""
        if filt is None:
            assert self.params is not None, "filter is None"
            filt = self.params
        return fast_apply_rir(x, filt, rm_delay=rm_delay)

    def update_params(self, k, **_ignored) -> None:
        self.params = jnp.asarray(k, jnp.float32)

    def get_time_RIR(self) -> jax.Array:
        return self.params

    # --- STFT helpers for losses ----------------------------------------
    def apply_stft(self, x):
        return self.op_stft.apply_stft(x)

    def apply_istft(self, X, length=None):
        return self.op_stft.apply_istft(X, length)
