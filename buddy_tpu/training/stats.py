"""Training statistics collection (training_stats API parity).

The reference vendors NVIDIA's training_stats (utils/torch_utils/
training_stats.py): a global ``report(name, value)`` accumulating
[count, sum, sum-of-squares] moments, synced across processes with
all_reduce and exposed through a ``Collector`` (mean/std).  Here the
host-side moments are fed from the trainer's *device-side* accumulator
(reduced across the SPMD mesh by XLA inside the jitted train step — the
functional counterpart of the reference's ``_sync`` all_reduce); the
``report``/``Collector`` API matches the reference for user code.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import numpy as np

_NUM_MOMENTS = 3

_counters: Dict[str, list] = defaultdict(list)


def report(name: str, value) -> None:
    """Accumulate [n, sum(x), sum(x^2)] for a named statistic
    (training_stats.py:54-97)."""
    x = np.asarray(value, np.float32).reshape(-1)
    moments = np.stack([np.float32(x.size), np.sum(x), np.sum(x * x)])
    _counters[name].append(moments)


def report_moments(name: str, *, n: float, total: float, total_sq: float) -> None:
    """Inject precomputed [n, sum, sum-of-squares] moments.

    The trainer accumulates moments ON DEVICE inside the jitted SPMD step
    (psum-reduced across the mesh by XLA — the functional counterpart of the
    reference's ``_sync`` all_reduce, training_stats.py:232-258) and feeds
    them here once per log interval, instead of reporting raw values with a
    per-step host sync."""
    _counters[name].append(np.asarray([n, total, total_sq], np.float64))


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
