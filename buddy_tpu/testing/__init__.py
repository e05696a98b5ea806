from buddy_tpu.testing.tester import Tester

__all__ = ["Tester"]
