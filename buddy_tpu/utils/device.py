"""Device-placement helpers + persistent compilation cache."""

from __future__ import annotations

import contextlib
import os

import jax


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The blind-DPS program costs ~50 s to compile over the TPU tunnel and the
    U-Net init several more; caching compiled executables on disk makes every
    process after the first reach timing in seconds.  Called by all entry
    points (bench.py, train.py, test.py, __graft_entry__.py).
    """
    if cache_dir is None:
        cache_dir = os.environ.get(
            "BUDDY_TPU_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def host_cpu_device():
    """Context manager placing eager ops on the host CPU backend.

    Operator constructors compute small constants (windows, OLA factors,
    direct-path corrections) with eager ops; over a remote-compiled TPU
    backend each eager op is a round-trip compile, so constants are built on
    the host and shipped once when first used inside a jitted program.
    """
    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()
