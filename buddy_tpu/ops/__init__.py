"""Device-resident signal ops: STFT/ISTFT, FFT convolution, minimum phase."""

from buddy_tpu.ops.stft import stft, istft, hann_window, pad_spec_frames
from buddy_tpu.ops.fftconv import fft_convolve, fast_apply_rir
from buddy_tpu.ops.minphase import hilbert, minimum_phase_version

__all__ = [
    "stft", "istft", "hann_window", "pad_spec_frames",
    "fft_convolve", "fast_apply_rir",
    "hilbert", "minimum_phase_version",
]
