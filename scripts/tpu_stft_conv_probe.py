"""Probe: STFT/ISTFT as strided / lhs-dilated convs vs the polyphase path,
and GroupNorm stats formulations — the two harvest targets of VERDICT r4
task 1 (inner-loop ISTFT->STFT round trip ~12 ms/step, GN ~13 ms/step of
the U-Net forward).

The conv formulation folds framing + window + DFT basis into one conv
kernel: STFT = conv(x, w*basis, stride=hop), ISTFT = lhs-dilated conv of
the (re,im)-channel spectrogram with the reversed (w*ibasis) kernel — no
(B, T, n_fft) frames tensor and none of the ~20 polyphase slice/concat
layout ops per transform.

Usage: python scripts/tpu_stft_conv_probe.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import importlib
pstft = importlib.import_module("buddy_tpu.ops.stft")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_FFT, HOP, WIN = 1024, 128, 512
L = 65536 + WIN  # apply_stft right-pad
F = N_FFT // 2 + 1


def make_window():
    k = np.arange(WIN)
    w = (0.5 * (1.0 - np.cos(2.0 * np.pi * k / WIN))).astype(np.float32)
    return np.pad(w, (0, N_FFT - WIN))


WP = make_window()


def stft_kernel():
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    f = np.arange(F, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * f / N_FFT
    Wk = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # (n_fft, 2F)
    return (WP[:, None] * Wk).astype(np.float32)[:, None, :]  # (n_fft, 1, 2F)


def istft_kernel():
    """Tap-conv ISTFT kernel (G, 2F, HOP): OLA of windowed irfft frames
    expressed as one conv along the frame axis.  Output segment k, phase r:
    y[k*hop + r] = sum_j frames[k-j, j*hop + r]; as a correlation over a
    (G-1)-padded frame axis the tap is W[j', c, r] = K[c, (G-1-j')*hop + r]."""
    G = -(-N_FFT // HOP)
    fidx = np.arange(F, dtype=np.float64)[:, None]
    t = np.arange(N_FFT, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * fidx * t / N_FFT
    scale = np.full((F, 1), 2.0 / N_FFT)
    scale[0, 0] = 1.0 / N_FFT
    scale[-1, 0] = 1.0 / N_FFT
    Kr = (np.cos(ang) * scale) * WP[None, :]    # (F, n_fft) real-channel taps
    Ki = (-np.sin(ang) * scale) * WP[None, :]
    K = np.concatenate([Kr, Ki], axis=0)        # (2F, n_fft)
    K = np.pad(K, ((0, 0), (0, G * HOP - N_FFT)))
    W = np.zeros((G, 2 * F, HOP), np.float64)
    for j in range(G):
        W[j] = K[:, (G - 1 - j) * HOP:(G - j) * HOP]
    return W.astype(np.float32)


SK = stft_kernel()
IK = istft_kernel()


def stft_conv(x):
    """x (B, T) real, constant center pad, -> (B, F, n_frames) complex."""
    pad = N_FFT // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    y = jax.lax.conv_general_dilated(
        x[..., None], jnp.asarray(SK), window_strides=(HOP,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    spec = jax.lax.complex(y[..., :F], y[..., F:])
    return jnp.swapaxes(spec, -1, -2)


def istft_conv_factory(n_frames, length):
    ola_len = N_FFT + HOP * (n_frames - 1)
    # window-squared OLA envelope, numpy at trace time
    env = np.zeros(ola_len, np.float64)
    wsq = (WP * WP).astype(np.float64)
    for t in range(n_frames):
        env[t * HOP: t * HOP + N_FFT] += wsq
    inv_env = np.where(env > 1e-11, 1.0 / env, 1.0).astype(np.float32)
    start = N_FFT // 2

    G = -(-N_FFT // HOP)

    def istft_conv(spec):
        X = jnp.swapaxes(spec, -1, -2)                      # (B, T, F)
        Xri = jnp.concatenate([jnp.real(X), jnp.imag(X)], axis=-1)
        y = jax.lax.conv_general_dilated(
            Xri, jnp.asarray(IK), window_strides=(1,),
            padding=((G - 1, G - 1),),
            dimension_numbers=("NWC", "WIO", "NWC"))        # (B, T+G-1, HOP)
        y = y.reshape(y.shape[:-2] + ((n_frames + G - 1) * HOP,))[..., :ola_len]
        y = y * jnp.asarray(inv_env)
        return y[..., start: start + length]
    return istft_conv


def timeit(fn, *a, n=10):
    out = jax.block_until_ready(fn(*a))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def main():
    print(f"B={B} L={L}", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L), jnp.float32) * 0.05

    def stft_poly(x):
        return pstft.stft(x, jnp.asarray(WP), n_fft=N_FFT, hop_length=HOP,
                          pad_mode="constant")

    sp = jax.jit(stft_poly)
    sc = jax.jit(stft_conv)
    t_p, Xp = timeit(sp, x)
    t_c, Xc = timeit(sc, x)
    # compare on-device (complex readback is UNIMPLEMENTED on axon)
    err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))(
        Xp, Xc)
    print(f"stft fwd: poly={t_p:.3f}ms conv={t_c:.3f}ms rel_err={float(err):.2e}",
          flush=True)

    n_frames = Xp.shape[-1]
    length = L - WIN // 2  # mimic apply_istft crop budget

    def istft_poly(spec):
        return pstft.istft(spec, jnp.asarray(WP), n_fft=N_FFT, hop_length=HOP,
                           length=length)

    ic = istft_conv_factory(n_frames, length)
    ipj = jax.jit(istft_poly)
    icj = jax.jit(ic)
    t_ip, yp = timeit(ipj, Xp)
    t_ic, yc = timeit(icj, Xp)
    err_i = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))(
        yp, yc)
    print(f"istft fwd: poly={t_ip:.3f}ms conv={t_ic:.3f}ms rel_err={float(err_i):.2e}",
          flush=True)

    # the inner-loop round trip: istft -> stft, fwd + vjp (gradient wrt spec)
    def round_poly(spec):
        y = istft_poly(spec)
        Y = stft_poly(jnp.pad(y[..., :65536], ((0, 0), (0, WIN))))
        return jnp.sum(jnp.real(Y) ** 2 + jnp.imag(Y) ** 2)

    def round_conv(spec):
        y = ic(spec)
        Y = stft_conv(jnp.pad(y[..., :65536], ((0, 0), (0, WIN))))
        return jnp.sum(jnp.real(Y) ** 2 + jnp.imag(Y) ** 2)

    for name, fn in (("poly", round_poly), ("conv", round_conv)):
        f = jax.jit(fn)
        g = jax.jit(jax.grad(fn))
        t_f, _ = timeit(f, Xp)
        t_g, _ = timeit(g, Xp)
        print(f"roundtrip {name}: fwd={t_f:.3f}ms fwd+vjp={t_g:.3f}ms", flush=True)
    gp = jax.jit(jax.grad(round_poly))(Xp)
    gc = jax.jit(jax.grad(round_conv))(Xp)
    err_g = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))(
        gp, gc)
    print(f"roundtrip grad rel_err={float(err_g):.2e}", flush=True)

    # ---------------- GroupNorm stats variants -----------------------------
    H, W, C, G = 256, 512, 128, 32
    xb = (jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C)) * 0.5
          ).astype(jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    def gn_current(x):
        m_c = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
        m2_c = jnp.mean(x * x, axis=(1, 2), dtype=jnp.float32)
        m_g = m_c.reshape(-1, G, C // G).mean(-1)
        m2_g = m2_c.reshape(-1, G, C // G).mean(-1)
        var_g = m2_g - m_g * m_g
        inv_g = jax.lax.rsqrt(var_g + 1e-6)
        inv_c = jnp.repeat(inv_g, C // G, axis=-1)
        mean_c = jnp.repeat(m_g, C // G, axis=-1)
        a = (inv_c * scale[None, :]).astype(x.dtype)
        b = (bias[None, :] - mean_c * inv_c * scale[None, :]).astype(x.dtype)
        out = x * a[:, None, None, :] + b[:, None, None, :]
        return jax.nn.silu(out)

    def gn_variadic(x):
        x32 = x.astype(jnp.float32)
        s, s2 = jax.lax.reduce((x32, x32 * x32),
                               (jnp.float32(0), jnp.float32(0)),
                               lambda a, b: (a[0] + b[0], a[1] + b[1]),
                               (1, 2))
        n = H * W
        m_c, m2_c = s / n, s2 / n
        m_g = m_c.reshape(-1, G, C // G).mean(-1)
        m2_g = m2_c.reshape(-1, G, C // G).mean(-1)
        var_g = m2_g - m_g * m_g
        inv_g = jax.lax.rsqrt(var_g + 1e-6)
        inv_c = jnp.repeat(inv_g, C // G, axis=-1)
        mean_c = jnp.repeat(m_g, C // G, axis=-1)
        a = (inv_c * scale[None, :]).astype(x.dtype)
        b = (bias[None, :] - mean_c * inv_c * scale[None, :]).astype(x.dtype)
        out = x * a[:, None, None, :] + b[:, None, None, :]
        return jax.nn.silu(out)

    def gn_bf16stats(x):
        m_c = jnp.mean(x, axis=(1, 2))                    # bf16 accum
        m2_c = jnp.mean(x * x, axis=(1, 2))
        m_g = m_c.astype(jnp.float32).reshape(-1, G, C // G).mean(-1)
        m2_g = m2_c.astype(jnp.float32).reshape(-1, G, C // G).mean(-1)
        var_g = m2_g - m_g * m_g
        inv_g = jax.lax.rsqrt(var_g + 1e-6)
        inv_c = jnp.repeat(inv_g, C // G, axis=-1)
        mean_c = jnp.repeat(m_g, C // G, axis=-1)
        a = (inv_c * scale[None, :]).astype(x.dtype)
        b = (bias[None, :] - mean_c * inv_c * scale[None, :]).astype(x.dtype)
        out = x * a[:, None, None, :] + b[:, None, None, :]
        return jax.nn.silu(out)

    for name, fn in (("gn_current", gn_current), ("gn_variadic", gn_variadic),
                     ("gn_bf16stats", gn_bf16stats)):
        f = jax.jit(fn)
        t_f, _ = timeit(f, xb)
        gfn = jax.jit(lambda x, fn=fn: jax.grad(
            lambda xx: jnp.sum(fn(xx).astype(jnp.float32)))(x))
        t_g, _ = timeit(gfn, xb)
        print(f"{name}: fwd={t_f:.3f}ms fwd+vjp={t_g:.3f}ms", flush=True)


if __name__ == "__main__":
    main()
