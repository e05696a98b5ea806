"""int8 quantized convolution with straight-through-estimator gradients.

Why: the v5e MXU runs int8 convs at ~2x its bf16 rate (measured on this
chip: 311-381 TOP/s vs 127-184 TFLOP/s at the NCSN++ resblock shapes —
scripts/tpu_int8_probe.py), and the U-Net convs are 131 ms of every 232 ms
blind-DPS step.  This is the lower-precision path past the ~6.2x bf16
RTF ceiling (BASELINE.md north-star is >10x).

Scheme (standard dynamic PTQ):
* activations: per-tensor dynamic scale  s_x = max|x| / 127, symmetric,
  round-to-nearest, clipped to [-127, 127];
* weights: per-output-channel scale      s_w[c] = max|w[..., c]| / 127;
* conv int8 x int8 -> int32 accumulation (exact), dequantized by the single
  real factor s_x * s_w[c] and cast back to the compute dtype.

Gradients are straight-through: the backward pass differentiates the
UN-quantized convolution (same adjoint convs the bf16 path would run), so
DPS likelihood guidance flows through the quantized denoiser with full
precision.  This matches how quantization-aware inference treats the
round() non-differentiability.

No reference counterpart (the PyTorch reference is f32-only); quality vs
f32 is gated by tests/test_int8.py and the mixed-precision methodology of
tests/test_mixed_precision.py.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _dn(x_ndim: int):
    assert x_ndim == 4
    return jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                          ("NHWC", "HWIO", "NHWC"))


def _plain_conv(strides, padding, x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=_dn(x.ndim))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def quantized_conv(strides, padding, x, w, b):
    """int8 conv, NHWC x HWIO -> NHWC.  ``strides``/``padding`` are hashable
    statics; ``b`` may be None."""
    eps = jnp.float32(1e-12)
    s_x = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0 + eps
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127
                   ).astype(jnp.int8)
    w32 = w.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(w32), axis=(0, 1, 2)) / 127.0 + eps   # (C_out,)
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
    y32 = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding=padding,
        dimension_numbers=_dn(x.ndim), preferred_element_type=jnp.int32)
    scale = (s_x * s_w).astype(jnp.float32)
    y = y32.astype(jnp.float32) * scale
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _qconv_fwd(strides, padding, x, w, b):
    return quantized_conv(strides, padding, x, w, b), (x, w, b)


def _qconv_bwd(strides, padding, res, g):
    x, w, b = res
    # Straight-through: adjoints of the un-quantized conv.  The primal conv
    # traced here is dead code (its output is unused) and DCE'd by XLA.
    _, vjp = jax.vjp(lambda xx, ww, bb: _plain_conv(strides, padding,
                                                    xx, ww, bb), x, w, b)
    return vjp(g.astype(x.dtype))


quantized_conv.defvjp(_qconv_fwd, _qconv_bwd)


class QConv(nn.Module):
    """Drop-in nn.Conv replacement running the int8 path.

    Parameter names/shapes ("kernel" HWIO, "bias") match nn.Conv exactly, so
    checkpoints and the PyTorch converter are oblivious to quantization.
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None  # accepted for conv3x3/conv1x1 symmetry

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        padding = self.padding
        if isinstance(padding, (list, tuple)):
            padding = tuple(tuple(p) for p in padding)
        return quantized_conv(tuple(self.strides), padding, x, kernel, bias)
