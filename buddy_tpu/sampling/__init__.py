from buddy_tpu.sampling.schedule import create_schedule, get_gamma

__all__ = ["create_schedule", "get_gamma"]
