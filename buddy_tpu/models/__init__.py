from buddy_tpu.models.ncsnpp import NCSNpp, NCSNppTime

__all__ = ["NCSNpp", "NCSNppTime"]
