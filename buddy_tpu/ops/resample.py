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
