"""Data layer tests: native WAV codec, datasets, batch loaders."""

import os

import numpy as np
import pytest

from buddy_tpu.data.audio_io import read_wav, write_wav, read_segment, _load_lib
from buddy_tpu.data.vctk import VCTKTrain, VCTKTestPaired
from buddy_tpu.data.loader import make_train_loader, NativeBatchLoader

AUDIO = "/root/reference/audio_examples"


def test_read_float32_wav():
    """The reference fixture set ships IEEE-float WAVs (format 3)."""
    x, sr = read_wav(os.path.join(AUDIO, "clean/p226/p226_003.wav"))
    assert sr == 16000
    assert x.dtype == np.float32
    assert len(x) > 16000
    assert np.abs(x).max() <= 1.5


def test_native_codec_matches_scipy(tmp_path):
    lib = _load_lib()
    assert lib is not None, "native runtime library must build"
    from scipy.io import wavfile
    path = os.path.join(AUDIO, "rir/p287/p287_005.wav")
    ours, sr = read_wav(path)
    sr_ref, ref = wavfile.read(path)
    ref = ref.astype(np.float32) if ref.ndim == 1 else ref.mean(1)
    assert sr == sr_ref
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(5000) * 0.1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_read_segment_crop_and_wrap(tmp_path, rng):
    x = (rng.standard_normal(3000) * 0.1).astype(np.float32)
    p = str(tmp_path / "seg.wav")
    write_wav(p, x, 16000)
    # crop
    seg = read_segment(p, 1000, seed=42)
    assert seg is not None and seg.shape == (1000,)
    # the crop must be a contiguous slice of x
    match = False
    for start in range(0, 2000):
        if np.allclose(x[start:start + 1000], seg, atol=1e-6):
            match = True
            break
    assert match
    # wrap-pad
    seg2 = read_segment(p, 5000, seed=7)
    assert seg2 is not None and seg2.shape == (5000,)
    assert np.isfinite(seg2).all()
    # every value of the wrap-padded output exists in x
    assert np.isin(np.round(seg2, 5), np.round(x, 5)).mean() > 0.99


def test_vctk_paired_dataset():
    ds = VCTKTestPaired(fs=16000, segment_length=-1, path=AUDIO,
                        speakers_discard=[], speakers_test=["p226", "p287"],
                        num_examples=2, shuffle=False)
    assert len(ds) == 2
    audio, rir, name = ds[0]
    assert audio.ndim == 1 and rir.ndim == 1
    # direct path cropped to argmax and peak-normalized (vctk.py:211-214)
    assert np.argmax(np.abs(rir)) == 0
    assert np.abs(rir).max() == pytest.approx(1.0)


def test_vctk_train_and_native_loader():
    ds = VCTKTrain(fs=16000, segment_length=8192, path=os.path.join(AUDIO, "clean"),
                   speakers_discard=[], speakers_test=[])
    seg = next(iter(ds))
    assert seg.shape == (8192,)

    loader = make_train_loader(ds, batch_size=4, num_workers=1, prefetch=2)
    assert isinstance(loader, NativeBatchLoader), "native loader must be used"
    batch = loader.next_batch()
    assert batch.shape == (4, 8192)
    assert batch.dtype == np.float32
    assert np.abs(batch).max() > 0
    batch2 = loader.next_batch()
    assert not np.allclose(batch, batch2)
    loader.close()
