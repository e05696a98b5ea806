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


def make_mesh(dp: int = -1, tp: int = 1, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("dp"[, "tp"][, "sp"]) device mesh.

    ``dp`` data-parallel x ``tp`` tensor-parallel x ``sp`` sequence-
    parallel.  dp=-1 uses all devices left after the tp/sp axes are carved
    out.  tp=sp=1 (the default) degenerates to the 1-D data-parallel mesh
    every existing caller expects; tp>1 shards the U-Net conv kernels'
    output-channel axis over ``tp`` (see ``param_shardings``); sp>1 shards
    the waveform/time axis of each training example over ``sp`` (see
    ``waveform_sharding``), with XLA/GSPMD inserting the ICI halo
    exchanges for the convolutions and the psums for GroupNorm's spatial
    statistics.  Axes are laid out dp-major / sp-minor so the per-conv
    halo exchanges ride the fastest links.
    """
    devices = list(devices if devices is not None else jax.devices())
    tp = int(tp) if tp not in (None, 0, -1) else 1
    sp = int(sp) if sp not in (None, 0, -1) else 1
    if dp in (-1, 0, None):
        dp = len(devices) // (tp * sp)
    assert dp >= 1, \
        f"tp={tp} x sp={sp} leaves no devices for dp (have {len(devices)})"
    assert dp * tp * sp <= len(devices), \
        f"requested dp={dp} x tp={tp} x sp={sp} > {len(devices)} devices"
    import numpy as np
    shape = [("dp", dp)]
    if tp > 1:
        shape.append(("tp", tp))
    if sp > 1:
        shape.append(("sp", sp))
    if len(shape) == 1:
        return Mesh(np.asarray(devices[:dp]), axis_names=("dp",))
    names = tuple(n for n, _ in shape)
    dims = tuple(s for _, s in shape)
    n = int(np.prod(dims))
    return Mesh(np.asarray(devices[:n]).reshape(dims), axis_names=names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across dp."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def waveform_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (batch, samples) waveform batch: batch over ``dp``
    and, when the mesh has an ``sp`` axis, the sample/time axis over
    ``sp``.  The annotation is an input hint only: GSPMD is free to
    resolve the overlapped STFT framing (reflect-pad + offset strided
    slices, ops/stft.py:_frame_polyphase) by all-gathering the time axis
    rather than halo exchange, in which case sp spreads HBM pressure of
    the input pipeline but not compute.  Numerics are gated
    (tests/test_batched.py: sp-mesh == dp1); treat any perf claim as
    unmeasured until profiled on real multi-chip hardware."""
    if "sp" in mesh.axis_names:
        return NamedSharding(mesh, P("dp", "sp"))
    return batch_sharding(mesh)


def shard_waveform_batch(mesh: Mesh, batch):
    return jax.device_put(batch, waveform_sharding(mesh))


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


def param_shardings(mesh: Mesh, tree):
    """Tensor-parallel sharding rule for a network param pytree.

    Conv kernels (the only 4-D leaves, HWIO) shard their output-channel
    axis over ``tp`` when it divides; everything else (biases, GroupNorm
    scale/shift, NIN/Dense weights, embeddings) is replicated and GSPMD
    slices/reduces as needed.  Output-channel sharding keeps each device's
    GroupNorm groups whole (group count is min(C//4, 32), so the C/tp shard
    boundary always lands on a group boundary for the power-of-two widths
    NCSN++ uses), which keeps the per-group stats local — no cross-tp
    reduction inside GroupNorm.

    With tp=1 meshes this returns replicated shardings everywhere, i.e. the
    original pure-dp behavior.
    """
    tp = int(mesh.shape.get("tp", 1))

    def rule(leaf):
        if tp > 1 and getattr(leaf, "ndim", 0) == 4 and \
                leaf.shape[-1] % tp == 0:
            return NamedSharding(mesh, P(None, None, None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_params(mesh: Mesh, tree):
    """device_put a param pytree with the tensor-parallel rule."""
    return jax.device_put(tree, param_shardings(mesh, tree))
