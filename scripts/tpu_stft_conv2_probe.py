"""Probe: conv-formulated operator STFT/ISTFT vs the current matmul path.

Idea: with n_fft=1024, hop=128 the framing is 8 non-overlapping 128-sample
block-lanes; a frame's windowed DFT is then a STRIDE-1 conv over the block
axis (kernel taps = window-folded DFT matrix sliced per block).  The hann
window is 512-padded-to-1024, so only 4 of the 8 taps are nonzero — the conv
does HALF the FLOPs of the (1024,513) matmul, eliminates the 8-slice+stack
framing and the 8-lane OLA pad/add chain, and runs on the conv path (the
best-optimized op on this backend).  Crucially the conv is stride-1 (the
reshape does the striding), so its vjp is another stride-1 conv — NOT the
catastrophic lhs-dilated conv the round-4 strided-conv STFT probe hit.

Also probes: overlap-save chunking of the frame-axis subband convolution
(fft 625 -> 4 x 192ish) and f32-vs-bf16 matmul rate at the frame-DFT shape.

Timing: reps chained inside one jit via lax.scan (the tunnel has a ~1.5 ms
per-dispatch floor and lies about standalone calls); min over 3 runs.
Usage: python scripts/tpu_stft_conv2_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

B = 8
LEN = 65536
N_FFT, WIN, HOP = 1024, 512, 128
F = N_FFT // 2 + 1
NF = 100  # operator filter frames
REPS = int(os.environ.get("PROBE_REPS", "10"))

k = np.arange(WIN)
w512 = (0.5 * (1.0 - np.cos(2.0 * np.pi * k / WIN))).astype(np.float32)
wp = np.pad(w512, (0, N_FFT - WIN))


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3  # ms per chained rep


def chain(body):
    """Chain REPS data-dependent evaluations of body inside one jit."""
    def run(x):
        def step(c, _):
            y = body(c)
            # fold output back into the input so reps are data-dependent
            return c + 1e-12 * jnp.real(jnp.sum(y)).astype(c.dtype), None
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c
    return jax.jit(run)


# ---------------------------------------------------------------------------
# 1. apply_stft: current matmul path vs conv formulation
# ---------------------------------------------------------------------------
import importlib
stft_mod = importlib.import_module("buddy_tpu.ops.stft")
from buddy_tpu.ops import dft

def stft_current(x):
    xp = jnp.pad(x, [(0, 0), (0, WIN)])
    return stft_mod._stft_impl(xp, wp, n_fft=N_FFT, hop_length=HOP,
                               center=True, pad_mode="constant")

# conv kernel: K[j, s, f] = W[j*HOP + s, f] for the window-folded DFT matrix
Cm, Sm = dft._rdft_windowed_mats(N_FFT, wp.tobytes(), str(wp.dtype))
WK = np.concatenate([Cm, Sm], axis=1)          # (1024, 1026)
TAPS = WIN // HOP                               # 4 nonzero taps
K_stft = np.ascontiguousarray(
    WK[: TAPS * HOP].reshape(TAPS, HOP, 2 * F))  # (4, 128, 1026)

def stft_conv(x):
    xp = jnp.pad(x, [(0, 0), (N_FFT // 2, N_FFT // 2 + WIN)])
    L = xp.shape[-1]
    nb = L // HOP
    n_frames = 1 + (L - N_FFT) // HOP
    blocks = xp[:, : nb * HOP].reshape(B, nb, HOP)
    out = jax.lax.conv_general_dilated(
        blocks, jnp.asarray(K_stft), window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))
    out = out[:, :n_frames]
    spec = jax.lax.complex(out[..., :F], out[..., F:])
    return jnp.swapaxes(spec, -1, -2)  # (B, F, T)

x_np = np.random.default_rng(0).standard_normal((B, LEN)).astype(np.float32)
x_dev = jax.device_put(x_np)  # numpy args re-upload over the tunnel per call

# correctness first (device, but compare small summaries to avoid complex fetch)
ref = jax.jit(stft_current)(x_np)
got = jax.jit(stft_conv)(x_np)
err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))(ref, got)
print(f"stft conv-form rel err: {float(err):.3e}  shapes {ref.shape} {got.shape}",
      flush=True)

def g_current(x):
    return jax.grad(lambda xx: jnp.sum(jnp.abs(stft_current(xx)) ** 2))(x)

def g_conv(x):
    return jax.grad(lambda xx: jnp.sum(jnp.abs(stft_conv(xx)) ** 2))(x)

for name, body in [("stft_mm fwd", stft_current), ("stft_conv fwd", stft_conv),
                   ("stft_mm grad", g_current), ("stft_conv grad", g_conv)]:
    print(f"{name:16s} {timed(chain(body), x_dev):8.3f} ms", flush=True)

# ---------------------------------------------------------------------------
# 2. apply_istft: current vs conv formulation
# ---------------------------------------------------------------------------
T_SP = 516
spec_np_r = np.random.default_rng(1).standard_normal((B, F, T_SP)).astype(np.float32)
spec_np_i = np.random.default_rng(2).standard_normal((B, F, T_SP)).astype(np.float32)
spec_dev_r, spec_dev_i = jax.device_put(spec_np_r), jax.device_put(spec_np_i)

def istft_current(sr, si):
    X = jax.lax.complex(sr, si)
    return stft_mod._istft_impl(X, wp, n_fft=N_FFT, hop_length=HOP,
                                center=True, length=LEN)

iC, iS = dft._irdft_windowed_mats(N_FFT, wp.tobytes(), str(wp.dtype))
VK = np.concatenate([iC, iS], axis=0)            # (1026, 1024)
# taps: y_block[b] += spec[b-j] @ V[:, j*HOP:(j+1)*HOP]; nonzero j = 0..3.
# With padding (TAPS-1, 0), lax conv gives out[b] = sum_j z[b+j-(TAPS-1)] K[j],
# so K must hold the taps in REVERSED order: K[TAPS-1-j] = V_j.
K_istft = np.ascontiguousarray(np.stack(
    [VK[:, j * HOP: (j + 1) * HOP] for j in reversed(range(TAPS))],
    axis=0))  # (4, 1026, 128)

# env (window-squared OLA), computed like _istft_impl does
def _env(n_frames):
    ola_len = N_FFT + HOP * (n_frames - 1)
    wsq = wp.astype(np.float64) ** 2
    env = np.zeros(ola_len)
    for t in range(n_frames):
        env[t * HOP: t * HOP + N_FFT] += wsq
    return np.where(env > 1e-11, env, 1.0).astype(np.float32)

ENV = _env(T_SP)
INV_ENV = (1.0 / ENV)

def istft_conv(sr, si):
    z = jnp.concatenate([jnp.swapaxes(sr, -1, -2), jnp.swapaxes(si, -1, -2)],
                        axis=-1)                          # (B, T, 1026)
    blocks = jax.lax.conv_general_dilated(
        z, jnp.asarray(K_istft), window_strides=(1,),
        padding=((TAPS - 1, TAPS - 1),),
        dimension_numbers=("NHC", "HIO", "NHC"))          # (B, T+3, 128)
    y = blocks.reshape(B, -1)                             # (B, (T+3)*128)
    y = y * jnp.asarray(INV_ENV[: y.shape[-1]])
    start = N_FFT // 2
    return y[..., start: start + LEN]

ref = jax.jit(istft_current)(spec_np_r, spec_np_i)
got = jax.jit(istft_conv)(spec_np_r, spec_np_i)
err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))(ref, got)
print(f"istft conv-form rel err: {float(err):.3e}  shapes {ref.shape} {got.shape}",
      flush=True)

def ig_current(sr, si):
    return jax.grad(lambda a: jnp.sum(istft_current(a, si) ** 2))(sr)

def ig_conv(sr, si):
    return jax.grad(lambda a: jnp.sum(istft_conv(a, si) ** 2))(sr)

def chain2(body):
    def run(a, b):
        def step(c, _):
            y = body(c, b)
            return c + 1e-12 * jnp.real(jnp.sum(y)).astype(c.dtype), None
        c, _ = jax.lax.scan(step, a, None, length=REPS)
        return c
    return jax.jit(run)

for name, body in [("istft_mm fwd", istft_current), ("istft_conv fwd", istft_conv),
                   ("istft_mm grad", ig_current), ("istft_conv grad", ig_conv)]:
    print(f"{name:16s} {timed(chain2(body), spec_dev_r, spec_dev_i):8.3f} ms",
          flush=True)

# ---------------------------------------------------------------------------
# 3. frame-axis subband conv: current one-shot DFT (625) vs overlap-save
# ---------------------------------------------------------------------------
from buddy_tpu.ops.fftconv import good_fft_size

T_OUT = T_SP
PRE = 1
FFT_FULL = good_fft_size(T_OUT + NF - 1)
Hr = np.random.default_rng(3).standard_normal((B, F, NF)).astype(np.float32)
Hi = np.random.default_rng(4).standard_normal((B, F, NF)).astype(np.float32)
Xr = np.random.default_rng(5).standard_normal((B, F, T_OUT)).astype(np.float32)
Xi = np.random.default_rng(6).standard_normal((B, F, T_OUT)).astype(np.float32)
Hr_dev, Hi_dev = jax.device_put(Hr), jax.device_put(Hi)

# X-side spectra are HOISTED in the real inner loop (constant across the 10
# updates) — precompute them on device and pass as jit ARGS (complex closures
# are forbidden on the axon backend).
def conv_full(hr, hi, Xf):
    Hf = dft.cfft(jax.lax.complex(hr, hi), FFT_FULL)
    return dft.icfft_slice(Xf * Hf, FFT_FULL, PRE, T_OUT)

# overlap-save: chunk outputs into CH chunks of L, each needs L+NF-1 inputs;
# fft of only L+NF-1 (the first NF-1 circularly-wrapped outputs are discarded)
def make_os(n_chunks):
    L = -(-T_OUT // n_chunks)
    FFT_C = good_fft_size(L + NF - 1)
    def prep(xr, xi):
        X = jax.lax.complex(xr, xi)
        # input for output chunk c: X[c*L + PRE - (NF-1) : c*L + PRE + L]
        xpad = jnp.pad(X, [(0, 0), (0, 0),
                           (NF - 1 - PRE, L * n_chunks - T_OUT + PRE)])
        segs = jnp.stack([jax.lax.slice_in_dim(xpad, c * L, c * L + L + NF - 1,
                                               axis=-1)
                          for c in range(n_chunks)], axis=-2)  # (B,F,CH,L+NF-1)
        return dft.cfft(segs, FFT_C)
    def conv_os(hr, hi, Sf):
        Hf = dft.cfft(jax.lax.complex(hr, hi), FFT_C)          # (B,F,FFT_C)
        Y = dft.icfft_slice(Sf * Hf[..., None, :], FFT_C, NF - 1, L)
        return Y.reshape(B, F, n_chunks * L)[..., :T_OUT]
    return conv_os, prep, FFT_C

Xf_full = jax.jit(lambda xr, xi: dft.cfft(jax.lax.complex(xr, xi), FFT_FULL))(
    Xr, Xi)
ref = jax.jit(conv_full)(Hr, Hi, Xf_full)
variants = []
for ch in (3, 4, 6):
    fn, prep, fftc = make_os(ch)
    Sf = jax.jit(prep)(Xr, Xi)
    got = jax.jit(fn)(Hr, Hi, Sf)
    err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))(ref, got)
    print(f"overlap-save ch={ch} (fft {fftc}) rel err: {float(err):.3e}", flush=True)
    variants.append((ch, fn, Sf))

def chain3(body):
    def run(a, b, xf):
        def step(cr, _):
            y = body(cr, b, xf)
            return cr + 1e-12 * jnp.real(jnp.sum(y)).astype(cr.dtype), None
        cr, _ = jax.lax.scan(step, a, None, length=REPS)
        return cr
    return jax.jit(run)

def grad_of(body):
    return lambda hr, hi, xf: jax.grad(
        lambda h: jnp.sum(jnp.abs(body(h, hi, xf)) ** 2))(hr)

rows = [("framecv_full fwd", conv_full, Xf_full),
        ("framecv_full grad", grad_of(conv_full), Xf_full)]
for ch, fn, Sf in variants:
    rows.append((f"framecv_os{ch} fwd", fn, Sf))
    rows.append((f"framecv_os{ch} grad", grad_of(fn), Sf))
for name, body, xf in rows:
    print(f"{name:18s} {timed(chain3(body), Hr_dev, Hi_dev, xf):8.3f} ms",
          flush=True)

# ---------------------------------------------------------------------------
# 4. raw matmul rate at the frame-DFT shape: f32 vs bf16 inputs
# ---------------------------------------------------------------------------
A32 = np.random.default_rng(7).standard_normal((B * 734, 513)).astype(np.float32)
W32 = np.random.default_rng(8).standard_normal((513, 1024)).astype(np.float32)
FL = 2 * A32.shape[0] * 513 * 1024

for dt in ("float32", "bfloat16"):
    a = jax.device_put(jnp.asarray(A32, dt))
    wmat = jnp.asarray(W32, dt)
    t = timed(chain(lambda x: x @ wmat), a)
    print(f"mm {dt:9s} {t:8.4f} ms  -> {FL / (t / 1e3) / 1e12:7.1f} TFLOP/s",
          flush=True)
print("done", flush=True)
