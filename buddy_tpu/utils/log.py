"""Logging / plotting / audio-file utilities.

Counterpart of the reference's utils/log.py (write_audio_file,
plot_loss_by_sigma, spectrogram plots) using the native WAV writer and
matplotlib (plotly/wandb are not available in this environment; wandb is
used opportunistically when importable — see buddy_tpu/training/trainer.py).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from buddy_tpu.data.audio_io import write_wav


def write_audio_file(x, fs: int, name: str, path: str = ".",
                     normalize: bool = False, stereo: bool = False) -> str:
    """Write a waveform to <path>/<name>.wav (log.py:90-110)."""
    x = np.asarray(x, dtype=np.float32).reshape(-1)
    if normalize and np.abs(x).max() > 0:
        x = 0.95 * x / np.abs(x).max()
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, f"{name}.wav")
    return write_wav(out, x, fs)


def plot_loss_by_sigma(means: Sequence[float], stds: Sequence[float],
                       sigma_bins: Sequence[float], out_path: str | None = None):
    """Error-band plot of loss vs sigma (log.py:39-88, matplotlib version)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    means = np.asarray(means, dtype=np.float64)
    stds = np.asarray(stds, dtype=np.float64)
    bins = np.asarray(sigma_bins, dtype=np.float64)
    ok = np.isfinite(means)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(bins[ok], means[ok], color="#006450")
    ax.fill_between(bins[ok], (means - stds)[ok], (means + stds)[ok],
                    alpha=0.3, color="#006450")
    ax.set_xscale("log")
    ax.set_xlabel("sigma")
    ax.set_ylabel("loss")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        return out_path
    return fig


def plot_spectrogram_from_raw_audio(x, stft_cfg, fs: int = 16000,
                                    out_path: str | None = None):
    """Log-magnitude spectrogram plot (log.py:112-128 counterpart)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from buddy_tpu.ops.stft import stft, hann_window
    import jax.numpy as jnp

    x = np.asarray(x, dtype=np.float32).reshape(-1)
    win = int(stft_cfg.get("win_size", 1024))
    hop = int(stft_cfg.get("hop_size", 256))
    S = np.asarray(stft(jnp.asarray(x), hann_window(win), n_fft=win,
                        hop_length=hop, pad_mode="constant"))
    logmag = 20 * np.log10(np.abs(S) + 1e-8)
    fig, ax = plt.subplots(figsize=(8, 4))
    im = ax.imshow(logmag, origin="lower", aspect="auto", cmap="magma",
                   extent=[0, len(x) / fs, 0, fs / 2])
    fig.colorbar(im, ax=ax, label="dB")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("frequency [Hz]")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        return out_path
    return fig
