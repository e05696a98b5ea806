"""Per-layer int8-vs-bf16 conv timing at the real NCSN++ shapes (VERDICT r3
task 3: "make int8 deliver its measured 2x or prove it can't").

Times, for each resblock conv shape of the flagship net at B=8:
  bf16        — the baseline nn.Conv path
  i8_dyn_i32  — QConv today: dynamic act scale, int32 accum
  i8_dyn_bf16 — dynamic act scale, bf16 accum (dequant inside the conv op)
  i8_sta_i32  — static (calibrated) act scale, int32 accum
  i8_sta_bf16 — static act scale, bf16 accum
  i8_pre      — input ALREADY int8 (conv+dequant only): the upper bound a
                producer-fused quantize (GN/act emitting int8) could reach
  quant_pass  — the standalone quantize pass (read bf16, write int8)

Interpretation: if i8_pre ~= bf16/2 but i8_dyn_* ~= bf16, the 2x is real and
the quantize/dequant plumbing is eating it -> fuse quantize into producers.
If i8_pre ~= bf16, the MXU isn't hitting int8 rate at these shapes and the
>10x-by-quantization route is physically closed (BASELINE terms).

Usage: python scripts/tpu_int8_layer_analysis.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.ops.qconv import quantized_conv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

# (H, W, C_in, C_out) — flagship NCSNppTime levels at B utterances.
# STFT(510/128) of 65536 samples -> (256, 512); nf=128, ch_mult [1,2,2,2].
SHAPES = [
    (256, 512, 128, 128),   # level 0 resblock conv
    (128, 256, 128, 256),   # level 1 down + widen
    (128, 256, 256, 256),   # level 1 resblock conv
    (64, 128, 256, 256),    # level 2
    (32, 64, 256, 256),     # level 3 / bottleneck
]


def timeit(fn, *a, n=20):
    out = fn(*a)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    print(f"B={B}", flush=True)
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    pad = ((1, 1), (1, 1))
    for (H, W, Cin, Cout) in SHAPES:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = (jax.random.normal(kx, (B, H, W, Cin)) * 0.5).astype(jnp.bfloat16)
        w = (jax.random.normal(kw, (3, 3, Cin, Cout)) * 0.05).astype(jnp.float32)
        b = jnp.zeros((Cout,), jnp.float32)
        flops = 2 * B * H * W * Cin * Cout * 9

        bf16 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), pad, dimension_numbers=dn))

        def q(accum, a_scale):
            return jax.jit(lambda x, w, b, s: quantized_conv(
                (1, 1), pad, accum, False, (1, 1), x, w, b, s))

        # pre-quantized input: conv + dequant only
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.01), -127,
                      127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w / 0.001), -127, 127).astype(jnp.int8)

        def pre_i8(accum):
            return jax.jit(lambda xq, wq: jax.lax.conv_general_dilated(
                xq, wq, (1, 1), pad, dimension_numbers=dn,
                preferred_element_type={"int32": jnp.int32,
                                        "bfloat16": jnp.bfloat16}[accum]
            ).astype(jnp.bfloat16) * jnp.bfloat16(0.01 * 0.001))

        quant_pass = jax.jit(lambda x: jnp.clip(
            jnp.round(x * jnp.bfloat16(100.0)), -127, 127).astype(jnp.int8))

        sca = jnp.float32(np.abs(np.asarray(x, np.float32)).max())
        r = {
            "bf16": timeit(bf16, x, w),
            "i8_dyn_i32": timeit(q("int32", None), x, w, b, None),
            "i8_dyn_bf16": timeit(q("bfloat16", None), x, w, b, None),
            "i8_sta_i32": timeit(q("int32", sca), x, w, b, sca),
            "i8_sta_bf16": timeit(q("bfloat16", sca), x, w, b, sca),
            "i8_pre_i32": timeit(pre_i8("int32"), xq, wq),
            "i8_pre_bf16": timeit(pre_i8("bfloat16"), xq, wq),
            "quant_pass": timeit(quant_pass, x),
        }
        tf = {k: flops / (v * 1e-3) / 1e12 for k, v in r.items()}
        print(f"({H},{W},{Cin},{Cout}) {flops/1e9:.1f} GFLOP: " +
              " ".join(f"{k}={v:.2f}ms({tf[k]:.0f}T)" for k, v in r.items()),
              flush=True)


if __name__ == "__main__":
    main()
