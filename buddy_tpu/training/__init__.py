from buddy_tpu.training.trainer import Trainer

__all__ = ["Trainer"]
