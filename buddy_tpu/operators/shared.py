"""Degradation-operator protocol.

Functional counterpart of the reference ABC (testing/operators/shared.py:5-28):
an operator owns a static config plus an explicit parameter pytree, and its
``degradation`` is a pure function of (params, x) so DPS guidance gradients
and the blind inner optimization run under jit/grad/scan.
"""

from __future__ import annotations

import abc
from typing import Any

import jax


class Operator(abc.ABC):
    """Base class for degradation operators A(x; params)."""

    params: Any = None

    @abc.abstractmethod
    def degradation(self, x: jax.Array, **kwargs) -> jax.Array:
        """Apply the forward model to a waveform."""

    @abc.abstractmethod
    def update_params(self, *args, **kwargs) -> None:
        """Set/refresh operator parameters."""

    def prepare_optimization(self, *args, **kwargs):
        return None

    def constrain_params(self, *args, **kwargs):
        return None
