"""Regenerate the WPE golden fixture (tests/goldens/wpe_golden.npz).

The pure-JAX WPE (buddy_tpu/sampling/wpe.py) reimplements the reference's
nara_wpe warm init (EulerHeunSamplerDPS.py:32-54); nara_wpe itself is not
installable here, so the golden is self-pinning: it freezes the CPU output
of the current implementation so silent numeric drift (solver change,
loading change, STFT change) fails the gate instead of passing unnoticed.

Run from the repo root with the SAME backend config as tests/conftest.py —
the virtual device count changes XLA CPU thread partitioning, and the
resulting reduction-order noise amplifies ~1.6% through the 5 WPE
iterations (measured: 1-device golden vs 8-device test run):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH=/root/repo:$PYTHONPATH python tests/make_wpe_golden.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax.numpy as jnp


def make_input():
    """Deterministic reverberant speech: the committed p226 example
    convolved with a seeded exponential-decay RIR (a synthetic impulse
    train is spectrally white and makes the per-bin solve pathological —
    WPE amplified it >100x; real speech is the representative input)."""
    from buddy_tpu.data.audio_io import read_wav
    x, _ = read_wav(
        "/root/reference/audio_examples/clean/p226/p226_003.wav")
    x = np.asarray(x, np.float32)[:65536]
    rng = np.random.default_rng(1234)
    rir = (np.exp(-np.arange(2000) / 300)
           * rng.standard_normal(2000)).astype(np.float32) * 0.4
    rir[0] = 1.0
    from buddy_tpu.ops.fftconv import fft_convolve
    y = np.asarray(fft_convolve(jnp.asarray(x), jnp.asarray(rir)))[:65536]
    return y.astype(np.float32)


def main():
    from buddy_tpu.sampling.wpe import wpe_dereverb
    y = make_input()
    # production warm-init params (conf/tester/blind_dereverberation_BUDDy.yaml)
    z = np.asarray(wpe_dereverb(jnp.asarray(y), taps=50, delay=2,
                                iterations=5)).astype(np.float32)
    assert np.all(np.isfinite(z)), "WPE produced non-finite output"
    out = os.path.join(os.path.dirname(__file__), "goldens", "wpe_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, y=y, z=z)
    print(f"wrote {out}: y rms {np.sqrt(np.mean(y**2)):.6f}, "
          f"z rms {np.sqrt(np.mean(z**2)):.6f}")


if __name__ == "__main__":
    main()
