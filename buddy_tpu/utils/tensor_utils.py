"""Small tensor utilities (utils/tensor_utils.py parity)."""

from __future__ import annotations

import jax.numpy as jnp

from buddy_tpu.ops.stft import pad_spec_frames as pad_spec  # noqa: F401 (re-export)


def pad_time(x: jnp.ndarray, multiple: int = 8192) -> jnp.ndarray:
    """Zero-pad the time axis to a multiple (tensor_utils.py:13-20)."""
    n = x.shape[-1]
    rem = n % multiple
    if rem == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, multiple - rem)])


def replace_denormals(x: jnp.ndarray, threshold: float = 1e-10) -> jnp.ndarray:
    """Zero out denormal-range values (tensor_utils.py:22-25)."""
    return jnp.where(jnp.abs(x) < threshold, 0.0, x)
