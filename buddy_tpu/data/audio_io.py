"""Audio file IO: native C++ WAV codec with a scipy fallback.

Replaces the reference's soundfile dependency (datasets/vctk.py:6,
utils/log.py:5 — libsndfile is not available here).  The production path is
runtime/libbuddy_runtime.so (runtime/wavio.cpp) loaded via ctypes; if the
shared library has not been built, scipy.io.wavfile covers the same PCM16/
24/32 + float formats.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "runtime",
                         "libbuddy_runtime.so")
_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        # try building it once
        mk = os.path.join(os.path.dirname(path), "Makefile")
        if os.path.exists(mk):
            os.system(f"make -C {os.path.dirname(path)} >/dev/null 2>&1")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.wav_info.restype = ctypes.c_int64
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32)]
    lib.wav_read_mono.restype = ctypes.c_int64
    lib.wav_read_mono.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.wav_read_segment.restype = ctypes.c_int
    lib.wav_read_segment.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64, ctypes.c_uint64]
    lib.wav_write_mono.restype = ctypes.c_int
    lib.wav_write_mono.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64, ctypes.c_int32]
    _lib = lib
    return lib


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (mono float32 array, sample_rate)."""
    lib = _load_lib()
    if lib is not None:
        sr = ctypes.c_int32(0)
        n = lib.wav_info(path.encode(), ctypes.byref(sr))
        if n > 0:
            out = np.empty(n, dtype=np.float32)
            got = lib.wav_read_mono(path.encode(),
                                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
            if got > 0:
                return out[:got], int(sr.value)
    # fallback: scipy
    from scipy.io import wavfile
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, int(sr)


def read_segment(path: str, segment_length: int, seed: int) -> Optional[np.ndarray]:
    """Random crop / wrap-pad a training segment (vctk.py:56-67) natively."""
    lib = _load_lib()
    if lib is None:
        return None
    out = np.empty(segment_length, dtype=np.float32)
    rc = lib.wav_read_segment(path.encode(),
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                              segment_length, seed & 0xFFFFFFFFFFFFFFFF)
    return out if rc == 0 else None


def write_wav(path: str, data: np.ndarray, sample_rate: int) -> str:
    """Write mono float32 WAV (utils/log.py:90-110 counterpart)."""
    data = np.ascontiguousarray(np.asarray(data, dtype=np.float32).reshape(-1))
    lib = _load_lib()
    if lib is not None:
        rc = lib.wav_write_mono(path.encode(),
                                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                                data.size, sample_rate)
        if rc == 0:
            return path
    from scipy.io import wavfile
    wavfile.write(path, sample_rate, data)
    return path
