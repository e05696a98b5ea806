"""Pallas TPU kernels for the hot ops: bottleneck attention and fused
GroupNorm+activation (the TPU-native counterpart of the reference's single
CUDA kernel, networks/ncsnpp_utils/op/upfirdn2d_kernel.cu, plus the fusions
named in BASELINE.json)."""
