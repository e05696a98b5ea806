from buddy_tpu.data.audio_io import read_wav, write_wav
from buddy_tpu.data.vctk import VCTKTrain, VCTKTest, VCTKTestPaired

__all__ = ["read_wav", "write_wav", "VCTKTrain", "VCTKTest", "VCTKTestPaired"]
