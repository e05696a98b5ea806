"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on
host-platform virtual devices (the driver separately dry-runs the multichip
path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize imports jax before this conftest runs, locking jax_platforms
# to the env value ("axon"); override through the live config object.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
