"""Up-FIR-down resampling (the native-code equivalent).

The reference vendors a 390-line CUDA kernel for StyleGAN2's upfirdn2d
(networks/ncsnpp_utils/op/upfirdn2d_kernel.cu, dead under the default
fir=False config).  On TPU the same operator is expressed *exactly* by
``lax.conv_general_dilated``: zero-insertion upsampling is lhs_dilation,
FIR filtering is a depthwise convolution, and downsampling is the window
stride — XLA lowers all three as one fused convolution on the MXU, so no
hand-written kernel is needed (SURVEY.md §2 native-component note).

Provides the StyleGAN2-compatible entry points used by the fir=True paths
of Upsample/Downsample/ResnetBlockBigGANpp (up_or_down_sampling.py).
All layouts NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _setup_kernel(k: Sequence[float]) -> np.ndarray:
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= k.sum()
    return k


def upfirdn2d(x: jax.Array, kernel: jax.Array, *, up: int = 1, down: int = 1,
              pad: tuple[int, int] = (0, 0)) -> jax.Array:
    """upsample-by-zero-insertion -> pad -> FIR -> downsample, NHWC.

    Matches the reference op semantics (op/upfirdn2d.py:145-156): the FIR is
    a true convolution (kernel flipped relative to cross-correlation).
    """
    B, H, W, C = x.shape
    kh, kw = kernel.shape
    # depthwise: one kernel per channel (feature_group_count=C)
    filt = jnp.tile(kernel[::-1, ::-1][:, :, None, None], (1, 1, 1, C))
    # lhs_dilation yields (H-1)*up+1 samples; the reference zero-stuffs to
    # H*up (trailing up-1 zeros) — fold them into the high padding.
    return jax.lax.conv_general_dilated(
        x, filt,
        window_strides=(down, down),
        padding=((pad[0], pad[1] + up - 1), (pad[0], pad[1] + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def upsample_2d(x: jax.Array, k: Sequence[float] = (1, 3, 3, 1),
                factor: int = 2, gain: float = 1.0) -> jax.Array:
    """FIR x2 upsample (up_or_down_sampling.py:195-237 semantics)."""
    kern = jnp.asarray(_setup_kernel(k) * (gain * factor ** 2))
    p = kern.shape[0] - factor
    return upfirdn2d(x, kern, up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: jax.Array, k: Sequence[float] = (1, 3, 3, 1),
                  factor: int = 2, gain: float = 1.0) -> jax.Array:
    """FIR x2 downsample (up_or_down_sampling.py:240-284 semantics)."""
    kern = jnp.asarray(_setup_kernel(k) * gain)
    p = kern.shape[0] - factor
    return upfirdn2d(x, kern, down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x: jax.Array, w: jax.Array, k: Sequence[float],
                     factor: int = 2, gain: float = 1.0) -> jax.Array:
    """Fused upsample + conv: FIR-upsample then SAME 3x3 conv (the
    reference fuses via conv_transpose; result is equivalent up to edge
    handling of the fused form).  w: (kh, kw, Cin, Cout) HWIO."""
    h = upsample_2d(x, k, factor=factor, gain=gain)
    return jax.lax.conv_general_dilated(
        h, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_downsample_2d(x: jax.Array, w: jax.Array, k: Sequence[float],
                       factor: int = 2, gain: float = 1.0) -> jax.Array:
    """Fused conv + FIR-downsample counterpart."""
    h = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return downsample_2d(h, k, factor=factor, gain=gain)


def upfirdn1d(x: jax.Array, kernel: jax.Array, *, up: int = 1, down: int = 1,
              pad: tuple[int, int] = (0, 0)) -> jax.Array:
    """1-D variant (op/upfirdn2d.py:158 exposes the same for audio axes).

    x: (B, T, C) -> filtered (B, T', C).
    """
    B, T, C = x.shape
    filt = jnp.tile(kernel[::-1][:, None, None], (1, 1, C))  # (k, 1, C)
    return jax.lax.conv_general_dilated(
        x, filt,
        window_strides=(down,),
        padding=((pad[0], pad[1] + up - 1),),  # trailing zero-stuff (see 2d)
        lhs_dilation=(up,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=C,
    )


# --- fused nearest-up2 + conv (HBM-pass elimination, no reference analogue)


def up2_kernel3x3(kernel: jax.Array) -> jax.Array:
    """Derive the 4x4 lhs-dilated kernel of ``conv3x3 ∘ nearest_up2`` from
    the original 3x3 kernel: K4[a,b] = sum_{u,v in {0,1}} K[a-u, b-v]."""
    K = kernel  # (3, 3, Ci, Co)
    k4 = jnp.zeros((4, 4) + K.shape[2:], K.dtype)
    for u in (0, 1):
        for v in (0, 1):
            k4 = k4.at[u:u + 3, v:v + 3].add(K)
    return k4


def up2_kernel1x1(kernel: jax.Array) -> jax.Array:
    """2x2 lhs-dilated kernel of ``conv1x1 ∘ nearest_up2``: each input pixel
    paints its 2x2 output block through W."""
    return jnp.broadcast_to(kernel, (2, 2) + kernel.shape[2:])


def up2_conv3x3(x: jax.Array, kernel: jax.Array,
                bias: jax.Array | None = None) -> jax.Array:
    """``conv3x3(pad=1)(nearest_up2(x))`` as ONE lhs-dilated convolution.

    The naive path materializes the 4x-size upsampled tensor (a full-res
    HBM broadcast pass, ~2.3 ms/step at the U-Net's top level, B=8 bf16;
    its vjp is a same-size reduce) before the conv reads it back.  Algebra:
    nearest-up2 is zero-stuffing followed by a depthwise ones(2,2) filter,
    and two stacked correlations collapse into one with the 4x4 kernel
    K4[a,b] = sum_{u,v in {0,1}} K[a-u, b-v] and padding ((2,2),(2,2))
    (the lhs-dilated input has size 2H-1, so the high side needs one extra
    zero to emit all 2H rows).  XLA then runs a single MXU conv straight
    off the half-res input.  Exact to float rounding
    (tests/test_kernels.py).
    """
    y = jax.lax.conv_general_dilated(
        x, up2_kernel3x3(kernel).astype(x.dtype), window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def up2_conv1x1(x: jax.Array, kernel: jax.Array,
                bias: jax.Array | None = None) -> jax.Array:
    """``conv1x1(nearest_up2(x))`` as ONE lhs-dilated 2x2 convolution
    (each input pixel paints its 2x2 output block through W) — removes the
    full-res broadcast entirely."""
    y = jax.lax.conv_general_dilated(
        x, up2_kernel1x1(kernel).astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
