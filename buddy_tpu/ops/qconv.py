"""int8 quantized convolution with straight-through-estimator gradients.

Why: the v5e MXU runs int8 convs at ~2x its bf16 rate (measured on this
chip: 311-381 TOP/s vs 127-184 TFLOP/s at the NCSN++ resblock shapes —
scripts/tpu_int8_probe.py), and the U-Net convs are 131 ms of every 194 ms
blind-DPS step.  This is the lower-precision path past the ~6.2x bf16
RTF ceiling (BASELINE.md north-star is >10x).

Scheme (standard PTQ):
* activations: per-tensor symmetric scale, round-to-nearest, clipped to
  [-127, 127].  Dynamic by default (s_x = max|x|/127 recomputed per call,
  one extra read of x); with ``static_scale`` the scale comes from a
  calibrated ``"quant"`` variable collection instead — zero extra reads
  (profiled cost of the dynamic reduce_max+abs: ~9.6 ms of a 209 ms
  blind-DPS step at B=8).
* weights: per-output-channel scale  s_w[c] = max|w[..., c]| / 127.
  Weight quantization is loop-invariant and hoisted out of the sampling
  scan by XLA's LICM (verified: the int8 profile shows no per-step weight
  converts).
* conv int8 x int8, accumulated on the MXU; ``accum`` picks the result
  type: "int32" is exact (but the int32 tensor is a full-width HBM write
  and the dequant convert was measured NOT to fuse on this backend —
  ~16.4 ms/step), "bfloat16"/"float32" convert inside the conv op.
* dequant: y * (s_x * s_w[c]) + b, one fused epilogue pass.

Gradients are straight-through: the backward differentiates the
UN-quantized convolution, so DPS likelihood guidance flows through the
quantized denoiser at full precision.  With ``bwd_quant`` the input
adjoint (dL/dx = g conv w-flipped) — the only cotangent the DPS guidance
actually consumes; dw/db are DCE'd at inference — also runs int8, which
is the other half of the conv budget.

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

_ACCUM = {"int32": jnp.int32, "bfloat16": jnp.bfloat16, "float32": jnp.float32}


def _dn(x_ndim: int):
    assert x_ndim == 4
    return jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                          ("NHWC", "HWIO", "NHWC"))


def _plain_conv(strides, padding, lhs_dilation, x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=strides, padding=padding,
        lhs_dilation=lhs_dilation, dimension_numbers=_dn(x.ndim))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _quantize_act(x, a_scale):
    """x -> (x_q int8, s_x f32).  ``a_scale`` None = dynamic per-tensor;
    a calibrated a_scale may be a scalar (per-tensor) or a (C_in,) vector
    (per-channel — the quantize mul broadcasts over the channel axis at the
    same cost, and the caller folds s_x into the weights)."""
    eps = jnp.float32(1e-12)
    if a_scale is None:
        s_x = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0 + eps
    else:
        s_x = a_scale.astype(jnp.float32) / 127.0 + eps
    # quantize in the input dtype, write int8 directly (no f32 detour)
    inv_x = (1.0 / s_x).astype(x.dtype)
    x_q = jnp.clip(jnp.round(x * inv_x), -127, 127).astype(jnp.int8)
    return x_q, s_x


def _quantize_w(w, in_scale=None):
    """w (HWIO) -> (w_q int8, s_w f32 (C_out,)).  Loop-invariant.

    ``in_scale`` (C_in,) folds per-channel activation scales into the
    weights before quantization (smooth-quant-style): the conv then needs
    only the per-C_out dequant, and per-channel activation quantization
    costs nothing at serve time."""
    eps = jnp.float32(1e-12)
    w32 = w.astype(jnp.float32)
    if in_scale is not None:
        w32 = w32 * in_scale[None, None, :, None]
    s_w = jnp.max(jnp.abs(w32), axis=(0, 1, 2)) / 127.0 + eps
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
    return w_q, s_w


def _int8_conv(x_q, w_q, strides, padding, accum, out_dtype, scale,
               lhs_dilation=(1, 1)):
    """int8 x int8 conv + fused dequant epilogue in ``out_dtype``."""
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding=padding,
        lhs_dilation=lhs_dilation, dimension_numbers=_dn(x_q.ndim),
        preferred_element_type=_ACCUM[accum])
    return y.astype(out_dtype) * scale.astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def quantized_conv(strides, padding, accum, bwd_quant, lhs_dilation,
                   x, w, b, a_scale):
    """int8 conv, NHWC x HWIO -> NHWC.

    ``strides``/``padding``/``accum``/``bwd_quant``/``lhs_dilation`` are
    hashable statics; ``b`` and ``a_scale`` may be None (dynamic activation
    scale).  ``lhs_dilation=(2,2)`` serves the fused nearest-up2 convs
    (ops/resample.py:111) — the int8 kernel there is the derived 4x4/2x2."""
    if a_scale is not None and a_scale.ndim == 1:
        # Per-channel calibrated activation scales, smooth-quant balanced:
        # quantizing x with the full per-channel spread and folding it into
        # the weights just moves the error into coarse weight quantization,
        # so split the spread geometrically (alpha=0.5) — x sees sqrt of
        # its channel spread, the weights absorb the other sqrt.  The fold
        # is loop-invariant (calibrated constants), the dequant epilogue
        # stays the per-C_out vector: zero extra serve-time cost.
        a_bal = jnp.sqrt(jnp.maximum(a_scale, 1e-12) * jnp.max(a_scale))
        x_q, s_x = _quantize_act(x, a_bal)
        w_q, s_w = _quantize_w(w, in_scale=s_x)
        scale = s_w
    else:
        x_q, s_x = _quantize_act(x, a_scale)
        w_q, s_w = _quantize_w(w)
        scale = s_x * s_w
    y = _int8_conv(x_q, w_q, strides, padding, accum, x.dtype, scale,
                   lhs_dilation)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _explicit_pads(padding, kh, kw):
    if isinstance(padding, str):
        if padding.upper() == "VALID":
            return ((0, 0), (0, 0))
        if padding.upper() == "SAME":
            return (((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2))
        return None
    return tuple(tuple(p) for p in padding)


def _qconv_fwd(strides, padding, accum, bwd_quant, lhs_dilation,
               x, w, b, a_scale):
    y = quantized_conv(strides, padding, accum, bwd_quant, lhs_dilation,
                       x, w, b, a_scale)
    return y, (x, w, b, a_scale)


def _qconv_bwd(strides, padding, accum, bwd_quant, lhs_dilation, res, g):
    x, w, b, a_scale = res
    # Straight-through: adjoints of the un-quantized conv.  The primal conv
    # traced here is dead code (its output is unused) and DCE'd by XLA; at
    # inference dw/db are unconsumed and DCE'd too.
    _, vjp = jax.vjp(lambda xx, ww, bb: _plain_conv(strides, padding,
                                                    lhs_dilation,
                                                    xx, ww, bb), x, w, b)
    dx, dw, db = vjp(g.astype(x.dtype))
    kh, kw = w.shape[0], w.shape[1]
    pads = _explicit_pads(padding, kh, kw)
    if (bwd_quant and strides == (1, 1) and lhs_dilation == (1, 1)
            and pads is not None):
        # dL/dx = g conv w(spatially flipped, I/O swapped), int8.  Adjoint
        # padding for stride 1: (k-1-lo, k-1-hi) per dim.
        w_adj = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        apads = ((kh - 1 - pads[0][0], kh - 1 - pads[0][1]),
                 (kw - 1 - pads[1][0], kw - 1 - pads[1][1]))
        g_q, s_g = _quantize_act(g.astype(x.dtype), None)
        wq, s_w = _quantize_w(w_adj)
        dx = _int8_conv(g_q, wq, (1, 1), apads, accum, x.dtype, s_g * s_w)
    da = None if a_scale is None else jnp.zeros_like(a_scale)
    return dx, dw, db, da


quantized_conv.defvjp(_qconv_fwd, _qconv_bwd)


class QConv(nn.Module):
    """Drop-in nn.Conv replacement running the int8 path.

    Parameter names/shapes ("kernel" HWIO, "bias") match nn.Conv exactly, so
    checkpoints and the PyTorch converter are oblivious to quantization.
    Calibration: apply the model with ``mutable=["quant"]`` on representative
    inputs — each QConv maxes the observed |x| into its ``quant/a_scale``
    variable; with ``static_scale=True`` later applies use that scale instead
    of recomputing max|x| per call (see NetworkBundle.calibrate_quant).
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None  # accepted for conv3x3/conv1x1 symmetry
    accum: str = "int32"
    bwd_quant: bool = False
    static_scale: bool = False

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

        a_scale = None
        if self.static_scale:
            # per-INPUT-channel calibrated |x| maxima: GN affine scales give
            # channels wildly different ranges, and per-channel quantization
            # is free at serve time (scales fold into the weights)
            c_in = x.shape[-1]
            amax_var = self.variable("quant", "a_scale",
                                     lambda: jnp.zeros((c_in,), jnp.float32))
            if self.is_mutable_collection("quant") and not self.is_initializing():
                obs = jax.lax.stop_gradient(
                    jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)))
                    .astype(jnp.float32))
                amax_var.value = jnp.maximum(amax_var.value, obs)
            else:
                a_scale = amax_var.value

        return quantized_conv(tuple(self.strides), padding, self.accum,
                              self.bwd_quant, (1, 1), x, kernel, bias, a_scale)
