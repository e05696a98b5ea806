"""buddy_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of BUDDy.

BUDDy is "Single-channel Blind Unsupervised Dereverberation with Diffusion
Models" (reference: sp-uhh/buddy).  This package reimplements every capability
of the reference repo — unconditional EDM sampling, informed and blind
dereverberation via diffusion posterior sampling, and unsupervised EDM
training of the NCSN++ score network — as an idiomatic JAX framework:

* the score network is a Flax module over STFT spectrograms with optional
  Pallas-fused kernels (GroupNorm+SiLU, bottleneck attention, up-FIR-down),
* the reverse-diffusion loops (including the blind subband-filter inner
  optimization) compile into single ``jax.lax.scan`` programs with zero host
  round-trips,
* training is data-parallel over a ``jax.sharding.Mesh`` with psum-reduced
  metrics and Orbax checkpointing.
"""

__version__ = "0.1.0"
