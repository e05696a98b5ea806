from buddy_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding"]
