"""Device-mesh and sharding helpers.

The reference is strictly single-process/single-device (SURVEY.md §2:
"Parallelism strategies present in the reference: none"); its vendored
multi-process stats sync (utils/torch_utils/training_stats.py:232-258) is
dead code.  The TPU-native counterpart is free-standing data parallelism:
a 1-D ``dp`` mesh over all local devices, batches sharded along ``dp``,
parameters replicated, and XLA inserting the psum gradient/metric
reductions over ICI under SPMD jit.  Multi-host extends the same mesh via
``jax.distributed.initialize`` (DCN between hosts, ICI within).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> bool:
    """Initialize multi-host JAX when a coordinator is configured.

    Called by train.py before any device use.  On a multi-host TPU slice the
    launcher exports ``COORDINATOR_ADDRESS``/``NUM_PROCESSES``/``PROCESS_ID``
    (or the TPU metadata server provides them); single-host runs skip this —
    the same SPMD train step then spans all hosts' devices via
    ``jax.devices()`` (DCN between hosts, ICI within).
    """
    addr = (jax.config.jax_coordinator_address
            if hasattr(jax.config, "jax_coordinator_address") else None)
    import os
    addr = os.environ.get("COORDINATOR_ADDRESS", addr)
    if not addr:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ.get("NUM_PROCESSES", 1)),
        process_id=int(os.environ.get("PROCESS_ID", 0)))
    return True


def make_mesh(dp: int = -1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a 1-D data-parallel mesh.  dp=-1 uses all available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if dp in (-1, 0, None):
        dp = len(devices)
    assert dp <= len(devices), f"requested dp={dp} > {len(devices)} devices"
    import numpy as np
    return Mesh(np.asarray(devices[:dp]), axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across dp."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
