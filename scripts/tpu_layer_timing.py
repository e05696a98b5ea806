"""Per-layer timing at production shapes to find the U-Net hotspot."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.models import layers as L


def timeit(name, fn, *a, n=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
act = jax.nn.silu

# level shapes for 65536 samples: (F, T) = (256,528) -> (128,264) -> (64,132) -> (32,66)
shapes = [(256, 528, 128), (128, 264, 256), (64, 132, 256), (32, 66, 256)]

temb = jax.random.normal(key, (1, 512))

for i, (F, T, C) in enumerate(shapes):
    x = jax.random.normal(key, (1, F, T, C))
    blk = L.ResnetBlockBigGANpp(act=act, out_ch=C)
    params = blk.init(key, x, temb)
    f = jax.jit(lambda p, xx, tt: blk.apply(p, xx, tt))
    timeit(f"resblock_L{i}_{F}x{T}x{C}", f, params, x, temb)

# downsampling resblock at L0
x = jax.random.normal(key, (1, 256, 528, 128))
blk = L.ResnetBlockBigGANpp(act=act, down=True)
params = blk.init(key, x, temb)
timeit("resblock_down_L0", jax.jit(lambda p, xx, tt: blk.apply(p, xx, tt)), params, x, temb)

# attention at bottleneck
x = jax.random.normal(key, (1, 32, 66, 256))
attn = L.AttnBlockpp(skip_rescale=True)
params = attn.init(key, x)
timeit("attn_bottleneck", jax.jit(lambda p, xx: attn.apply(p, xx)), params, x)

# attention with pallas kernel
attn_p = L.AttnBlockpp(skip_rescale=True, use_pallas=True)
timeit("attn_bottleneck_pallas", jax.jit(lambda p, xx: attn_p.apply(p, xx)), params, x)

# plain conv3x3 at L0
x = jax.random.normal(key, (1, 256, 528, 128))
conv = L.conv3x3(128, name="c")
params = conv.init(key, x)
timeit("conv3x3_L0_128to128", jax.jit(lambda p, xx: conv.apply(p, xx)), params, x)

# GroupNorm+SiLU at L0
gn = L.GroupNormAct(num_groups=32, act=act)
params = gn.init(key, x)
timeit("gn_silu_L0", jax.jit(lambda p, xx: gn.apply(p, xx)), params, x)
gn_p = L.GroupNormAct(num_groups=32, act=act, use_pallas=True)
timeit("gn_silu_L0_pallas", jax.jit(lambda p, xx: gn_p.apply(p, xx)), params, x)

# naive resampling at L0
timeit("naive_down_L0", jax.jit(L.naive_downsample_2d), x)
timeit("naive_up_L1", jax.jit(L.naive_upsample_2d),
       jax.random.normal(key, (1, 128, 264, 256)))

# GaussianFourier + Dense (time embedding)
gfp = L.GaussianFourierProjection(embedding_size=128, scale=16)
p = gfp.init(key, jnp.zeros((1,)))
timeit("gfp", jax.jit(lambda pp, tt: gfp.apply(pp, tt)), p, jnp.asarray([0.3]))
