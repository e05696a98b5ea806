from buddy_tpu.diffusion.edm import EDM

__all__ = ["EDM"]
