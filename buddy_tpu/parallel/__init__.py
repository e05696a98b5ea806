from buddy_tpu.parallel.mesh import (make_mesh, batch_sharding,
                                     replicated_sharding, shard_params,
                                     waveform_sharding, shard_waveform_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_params", "waveform_sharding", "shard_waveform_batch"]
