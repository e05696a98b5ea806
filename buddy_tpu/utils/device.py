"""Device-placement helpers."""

from __future__ import annotations

import contextlib

import jax


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
