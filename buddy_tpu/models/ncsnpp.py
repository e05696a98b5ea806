"""NCSN++ score U-Net over complex STFT spectrograms, in Flax.

Structural rebuild of the reference model (networks/ncsnpp.py:44-449):
BigGAN residual blocks, progressive input_skip/output_skip pyramids with a
``sum`` combiner, a ResBlock–Attention–ResBlock bottleneck, and a Gaussian
Fourier noise embedding.  The module-construction loop mirrors the
reference's ``all_modules`` ordering exactly (modules are named
``all_modules_{i}``), so the PyTorch checkpoint converts 1:1
(buddy_tpu/models/convert.py).

TPU-native choices: NHWC layout (channels on the lane dimension), static
shapes under jit, and optional Pallas kernels for the GroupNorm+SiLU chains
and the bottleneck attention.

``NCSNppTime`` wraps the U-Net with the 510/128 hann STFT <-> ISTFT pair and
the pad-frames-to-16 rule (ncsnpp.py:455-506).
"""

from __future__ import annotations

import math

_INV_SQRT2 = 1.0 / math.sqrt(2.0)  # mul beats div on the TPU VPU
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from buddy_tpu.models import layers as L
from buddy_tpu.ops.stft import stft as jstft, istft as jistft, hann_window, pad_spec_frames


class NCSNpp(nn.Module):
    """NCSN++ over (B, spatial_channels, F, T) complex spectrograms."""

    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 1
    attn_resolutions: Sequence[int] = (0,)
    resamp_with_conv: bool = True
    time_conditional: bool = True
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    image_size: int = 256
    embedding_type: str = "fourier"
    input_channels: int = 2
    spatial_channels: int = 1
    dropout: float = 0.0
    centered: bool = True
    discriminative: bool = False
    compute_dtype: Any = None  # e.g. "bfloat16" mixed precision for the body
    # int8 resblock convs with STE grads (ops/qconv.py) — the lower-precision
    # path past the bf16 RTF ceiling; off by default for reference parity
    quantize_int8: bool = False
    # int8 tuning (only read when quantize_int8): MXU accumulation/dequant
    # type ("int32" exact, "bfloat16"/"float32" convert inside the conv op),
    # whether the dL/dx adjoint convs also run int8, and whether activation
    # scales come from a calibrated "quant" collection instead of per-call
    # max|x| (NetworkBundle.calibrate_quant)
    quantize_accum: str = "int32"
    quantize_bwd: bool = False
    quantize_static: bool = False
    # fold nearest-up2 into the up-ResBlock convs as lhs-dilated convs
    # (exact math, skips the 4x-size HBM broadcast + its vjp reduce) —
    # perf knob, off by default for reference-graph parity
    fuse_resample: bool = False
    # rematerialize each ResBlock in the backward pass (jax.checkpoint):
    # exact numerics, trades ~1 extra forward of FLOPs for activation
    # memory.  Measured on-chip (batch 16, 4 s f32 — the reference's
    # production config) this does NOT fix the HBM fit: 20.0 GB of HLO
    # temps WITH remat vs 18.2 GB without, because XLA already remats and
    # the top-resolution block's within-block working set (conv inputs
    # kept for weight grads) is irreducible per microbatch.  exp.grad_accum
    # is the lever that fits that config; remat stays as a general
    # memory/recompute knob.  Off by default.
    remat: bool = False

    def setup(self):
        act = L.get_act(self.nonlinearity)
        self.act_fn = act
        nf = self.nf
        ch_mult = tuple(self.ch_mult)
        num_resolutions = len(ch_mult)
        all_resolutions = [self.image_size // (2 ** i) for i in range(num_resolutions)]
        self._all_resolutions = all_resolutions

        time_conditional = self.time_conditional
        input_channels = self.input_channels
        if self.discriminative:
            time_conditional = False
            input_channels = 2
        self._time_conditional = time_conditional
        self._input_channels = input_channels
        total_channels = input_channels * self.spatial_channels
        self._total_channels = total_channels

        assert self.progressive in ("none", "output_skip", "residual")
        assert self.progressive_input in ("none", "input_skip", "residual")
        assert self.embedding_type in ("fourier", "positional")
        combine_method = self.progressive_combine.lower()

        cdtype = (jnp.dtype(self.compute_dtype)
                  if self.compute_dtype not in (None, "none", "float32") else None)
        self._cdtype = cdtype

        # remat: lift jax.checkpoint over each ResBlock class — params and
        # scope names are unchanged, only the vjp recomputes the block.
        ddpm_cls = (nn.remat(L.ResnetBlockDDPMpp) if self.remat
                    else L.ResnetBlockDDPMpp)
        biggan_cls = (nn.remat(L.ResnetBlockBigGANpp) if self.remat
                      else L.ResnetBlockBigGANpp)

        def ResBlock(name, *, in_ch, out_ch=None, up=False, down=False):
            common = dict(act=act, out_ch=out_ch, dropout=self.dropout,
                          init_scale=self.init_scale, skip_rescale=self.skip_rescale,
                          temb=time_conditional, dtype=cdtype, name=name)
            if self.resblock_type == "ddpm":
                return ddpm_cls(**common)
            if self.resblock_type == "biggan":
                qcfg = ((self.quantize_accum, self.quantize_bwd,
                         self.quantize_static)
                        if self.quantize_int8 else False)
                return biggan_cls(up=up, down=down, fir=self.fir,
                                  fir_kernel=self.fir_kernel,
                                  qconv=qcfg,
                                  fuse_up=self.fuse_resample,
                                  **common)
            raise ValueError(f"resblock type {self.resblock_type} unrecognized.")

        def AttnBlock(name):
            return L.AttnBlockpp(init_scale=self.init_scale,
                                 skip_rescale=self.skip_rescale, name=name)

        # --- replicate the reference's module-construction loop exactly
        # (ncsnpp.py:115-274) so ``all_modules_{i}`` matches ``all_modules.{i}``.
        modules = []
        idx = [0]

        def add(factory):
            m = factory(f"all_modules_{idx[0]}")
            idx[0] += 1
            modules.append(m)
            return m

        if time_conditional:
            if self.embedding_type == "fourier":
                add(lambda n: L.GaussianFourierProjection(
                    embedding_size=nf, scale=self.fourier_scale, name=n))
            # "positional" consumes no module: sinusoidal features are
            # computed functionally in __call__ (reference ncsnpp.py:307-311,
            # module construction ncsnpp.py:166-168 appends nothing).
            add(lambda n: nn.Dense(nf * 4, kernel_init=L.default_init(),
                                   bias_init=nn.initializers.zeros, name=n))
            add(lambda n: nn.Dense(nf * 4, kernel_init=L.default_init(),
                                   bias_init=nn.initializers.zeros, name=n))

        input_pyramid_ch = total_channels

        add(lambda n: L.conv3x3(nf, dtype=cdtype, name=n))
        hs_c = [nf]

        in_ch = nf
        for i_level in range(num_resolutions):
            for _ in range(self.num_res_blocks):
                out_ch = nf * ch_mult[i_level]
                add(lambda n, i=in_ch, o=out_ch: ResBlock(n, in_ch=i, out_ch=o))
                in_ch = out_ch
                if all_resolutions[i_level] in self.attn_resolutions:
                    add(AttnBlock)
                hs_c.append(in_ch)
            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    add(lambda n: L.Downsample(with_conv=self.resamp_with_conv,
                                               fir=self.fir, fir_kernel=self.fir_kernel,
                                               name=n))
                else:
                    add(lambda n, i=in_ch: ResBlock(n, in_ch=i, down=True))
                if self.progressive_input == "input_skip":
                    add(lambda n, o=in_ch: L.Combine(dim2=o, method=combine_method,
                                                     dtype=cdtype, name=n))
                    if combine_method == "cat":
                        in_ch *= 2
                elif self.progressive_input == "residual":
                    add(lambda n, o=in_ch: L.Downsample(out_ch=o, with_conv=True,
                                                        fir=self.fir,
                                                        fir_kernel=self.fir_kernel, name=n))
                    input_pyramid_ch = in_ch
                hs_c.append(in_ch)

        in_ch = hs_c[-1]
        add(lambda n, i=in_ch: ResBlock(n, in_ch=i))
        add(AttnBlock)
        add(lambda n, i=in_ch: ResBlock(n, in_ch=i))

        pyramid_ch = 0
        for i_level in reversed(range(num_resolutions)):
            for _ in range(self.num_res_blocks + 1):
                out_ch = nf * ch_mult[i_level]
                add(lambda n, i=in_ch + hs_c.pop(), o=out_ch: ResBlock(n, in_ch=i, out_ch=o))
                in_ch = out_ch
            if all_resolutions[i_level] in self.attn_resolutions:
                add(AttnBlock)
            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        add(lambda n, c=in_ch: L.group_norm(c, n))
                        add(lambda n: L.conv3x3(total_channels, dtype=cdtype,
                                                init_scale=self.init_scale, name=n))
                        pyramid_ch = total_channels
                    elif self.progressive == "residual":
                        add(lambda n, c=in_ch: L.group_norm(c, n))
                        add(lambda n, c=in_ch: L.conv3x3(c, name=n))
                        pyramid_ch = in_ch
                else:
                    if self.progressive == "output_skip":
                        add(lambda n, c=in_ch: L.group_norm(c, n))
                        add(lambda n: L.conv3x3(total_channels, bias=True, dtype=cdtype,
                                                init_scale=self.init_scale, name=n))
                        pyramid_ch = total_channels
                    elif self.progressive == "residual":
                        add(lambda n, c=in_ch: L.Upsample(out_ch=c, with_conv=True,
                                                          fir=self.fir,
                                                          fir_kernel=self.fir_kernel, name=n))
                        pyramid_ch = in_ch
            if i_level != 0:
                if self.resblock_type == "ddpm":
                    add(lambda n: L.Upsample(with_conv=self.resamp_with_conv,
                                             fir=self.fir, fir_kernel=self.fir_kernel,
                                             name=n))
                else:
                    add(lambda n, i=in_ch: ResBlock(n, in_ch=i, up=True))

        assert not hs_c

        if self.progressive != "output_skip":
            add(lambda n, c=in_ch: L.group_norm(c, n))
            add(lambda n: L.conv3x3(total_channels, init_scale=self.init_scale, name=n))

        self.all_modules = modules
        self.output_layer = nn.Conv(2 * self.spatial_channels, (1, 1),
                                    name="output_layer")

    def __call__(self, x: jax.Array, time_cond: jax.Array | None = None) -> jax.Array:
        """x: (B, spatial_channels, F, T) complex -> same-shape complex output.

        Mirrors the reference forward's m_idx walk (ncsnpp.py:281-449).
        """
        act = self.act_fn
        modules = self.all_modules
        m_idx = 0
        num_resolutions = len(self.ch_mult)

        # complex -> real channels, NCHW -> NHWC (ncsnpp.py:290-297)
        chans = []
        for chan in range(self.spatial_channels):
            for in_chan in range(self._input_channels // 2):
                xc = x[:, chan + in_chan]
                chans.extend([xc.real, xc.imag])
        h0 = jnp.stack(chans, axis=-1)  # (B, F, T, total_channels)
        if self._cdtype is not None:
            h0 = h0.astype(self._cdtype)

        if self._time_conditional and time_cond is not None:
            if self.embedding_type == "fourier":
                temb = modules[m_idx](time_cond); m_idx += 1
            else:  # positional: sinusoidal, no module (ncsnpp.py:307-311)
                temb = L.get_timestep_embedding(time_cond, self.nf)
            if self._cdtype is not None:
                temb = temb.astype(self._cdtype)
            temb = modules[m_idx](temb); m_idx += 1
            temb = modules[m_idx](act(temb)); m_idx += 1
        else:
            temb = None

        if not self.centered:
            h0 = 2 * h0 - 1.0

        input_pyramid = None
        if self.progressive_input != "none":
            input_pyramid = h0

        hs = [modules[m_idx](h0)]; m_idx += 1
        for i_level in range(num_resolutions):
            for _ in range(self.num_res_blocks):
                h = modules[m_idx](hs[-1], temb); m_idx += 1
                # runtime check is on the frequency dim (ncsnpp.py:339-340)
                if h.shape[1] in self.attn_resolutions:
                    h = modules[m_idx](h); m_idx += 1
                hs.append(h)
            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](hs[-1]); m_idx += 1
                else:
                    h = modules[m_idx](hs[-1], temb); m_idx += 1
                if self.progressive_input == "input_skip":
                    input_pyramid = L.naive_downsample_2d(input_pyramid)
                    h = modules[m_idx](input_pyramid, h); m_idx += 1
                elif self.progressive_input == "residual":
                    input_pyramid = modules[m_idx](input_pyramid); m_idx += 1
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) * _INV_SQRT2
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        h = hs[-1]
        h = modules[m_idx](h, temb); m_idx += 1
        h = modules[m_idx](h); m_idx += 1
        h = modules[m_idx](h, temb); m_idx += 1

        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for _ in range(self.num_res_blocks + 1):
                h = modules[m_idx](jnp.concatenate([h, hs.pop()], axis=-1), temb)
                m_idx += 1
            if h.shape[1] in self.attn_resolutions:
                h = modules[m_idx](h); m_idx += 1
            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    pyramid = act(modules[m_idx](h)); m_idx += 1
                    pyramid = modules[m_idx](pyramid); m_idx += 1
                else:
                    if self.progressive == "output_skip":
                        pyramid = L.naive_upsample_2d(pyramid)
                        pyramid_h = act(modules[m_idx](h)); m_idx += 1
                        pyramid_h = modules[m_idx](pyramid_h); m_idx += 1
                        pyramid = pyramid + pyramid_h
                    elif self.progressive == "residual":
                        pyramid = modules[m_idx](pyramid); m_idx += 1
                        if self.skip_rescale:
                            pyramid = (pyramid + h) * _INV_SQRT2
                        else:
                            pyramid = pyramid + h
                        h = pyramid
            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](h); m_idx += 1
                else:
                    h = modules[m_idx](h, temb); m_idx += 1

        assert not hs

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = act(modules[m_idx](h)); m_idx += 1
            h = modules[m_idx](h); m_idx += 1

        assert m_idx == len(modules)

        h = h.astype(jnp.float32)
        h = self.output_layer(h)  # (B, F, T, 2*spatial)
        # channels -> complex (ncsnpp.py:445-448): index r*spatial + s
        s = self.spatial_channels
        real = h[..., 0:s]
        imag = h[..., s:2 * s]
        out = real + 1j * imag  # (B, F, T, spatial)
        return jnp.moveaxis(out, -1, 1)  # (B, spatial, F, T)


class NCSNppTimeModule(nn.Module):
    """NCSN++ wrapped with STFT/ISTFT (ncsnpp.py:455-506).

    Input (B, C, T) waveform -> STFT (hann, n_fft/hop from conf) -> pad
    frames to a multiple of 16 -> NCSNpp -> ISTFT cropped to input length.
    """
    n_fft: int = 510
    hop_length: int = 128
    net_kwargs: Any = None

    def setup(self):
        kwargs = {k: v for k, v in dict(self.net_kwargs or {}).items()
                  if k in NCSNpp.__dataclass_fields__}
        self.unet = NCSNpp(**kwargs, name="unet")

    def stft(self, sig: jax.Array) -> jax.Array:
        window = hann_window(self.n_fft, dtype=sig.dtype)
        spec = jstft(sig, window, n_fft=self.n_fft, hop_length=self.hop_length,
                     pad_mode="reflect")
        return pad_spec_frames(spec.astype(jnp.complex64), 16)

    def istft(self, spec: jax.Array, length: int) -> jax.Array:
        window = hann_window(self.n_fft)
        return jistft(spec, window, n_fft=self.n_fft,
                      hop_length=self.hop_length, length=length)

    def __call__(self, x: jax.Array, time_cond: jax.Array | None = None) -> jax.Array:
        B, C, T = x.shape
        spec = self.stft(x)              # (B, C, F, frames)
        spec = self.unet(spec, time_cond)
        return self.istft(spec, T)       # (B, C, T)


def NCSNppTime(stft=None, **kwargs) -> NCSNppTimeModule:
    """Config entry point (conf/network/ncsnpp.yaml `_target_`)."""
    assert stft is not None, "stft must be provided"
    net_kwargs = tuple(sorted(
        (k, tuple(v) if isinstance(v, list) else v) for k, v in kwargs.items()
        if k in NCSNpp.__dataclass_fields__))
    return NCSNppTimeModule(n_fft=int(stft["n_fft"]),
                            hop_length=int(stft["hop_length"]),
                            net_kwargs=net_kwargs)
