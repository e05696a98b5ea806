"""Sampling noise schedules and stochasticity (churn) parameters.

Parity targets: testing/Sampler.py:39-56 (EDM rho-warped sigma schedule with
T+1 points and t[-1]=0) and testing/EulerHeunSampler.py:24-39 (per-step gamma
churn gated to the [Stmin, Stmax] sigma range).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def create_schedule(T: int, *, sigma_min: float, sigma_max: float, rho: float,
                    schedule: str = "edm") -> jnp.ndarray:
    """EDM schedule: T+1 sigmas from sigma_max down past sigma_min, last = 0.

    Note the reference divides by (T-1), so index T-1 lands exactly on
    sigma_min and index T overshoots before being overwritten with 0
    (Sampler.py:53-55).  T=1 is degenerate in both implementations
    (0/0 -> NaN schedule); the minimum usable schedule is T=2.
    """
    if schedule != "edm":
        raise NotImplementedError(f"schedule {schedule} not implemented")
    a = np.arange(0, T + 1, dtype=np.float64)
    t = (sigma_max ** (1 / rho)
         + a / (T - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    t[-1] = 0.0
    return jnp.asarray(t, dtype=jnp.float32)


def get_gamma(t: jnp.ndarray, *, Schurn: float, Stmin: float, Stmax: float) -> jnp.ndarray:
    """Per-step churn factor (EulerHeunSampler.py:24-39).

    gamma_i = min(Schurn/N, sqrt(2)-1) where Stmin < t_i < Stmax, else 0;
    N is the full schedule length T+1 (t.shape[0]).
    """
    n = t.shape[0]
    base = min(Schurn / n, 2 ** 0.5 - 1)
    active = jnp.logical_and(t > Stmin, t < Stmax)
    return jnp.where(active, base, 0.0).astype(t.dtype)
