"""Device-feeding training batch pipeline.

The reference uses a torch DataLoader with 4 worker processes and
prefetch_factor=20 (train.py:24).  Here the native C++ loader
(runtime/loader.cpp) fills a ring of float32 staging buffers with decoded
random segments on worker threads (no GIL), and ``DeviceLoader`` turns them
into device arrays with ``jax.device_put`` (optionally sharded over the
data-parallel mesh axis) one batch ahead of consumption.

Falls back to a pure-Python threaded loader when the shared library is
unavailable.
"""

from __future__ import annotations

import ctypes
import queue
import threading
from typing import Iterator

import numpy as np

from buddy_tpu.data import audio_io


class NativeBatchLoader:
    """ctypes wrapper over runtime/loader.cpp."""

    def __init__(self, files, batch_size: int, segment_length: int,
                 n_slots: int = 4, n_workers: int = 2, seed: int = 0):
        lib = audio_io._load_lib()
        if lib is None:
            raise RuntimeError("native runtime library not available")
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int64, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_uint64]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.loader_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self.batch_size = batch_size
        self.segment_length = segment_length
        arr = (ctypes.c_char_p * len(files))(*[f.encode() for f in files])
        self._handle = lib.loader_create(arr, len(files), batch_size,
                                         segment_length, n_slots, n_workers,
                                         seed)

    def next_batch(self) -> np.ndarray:
        data = ctypes.POINTER(ctypes.c_float)()
        slot = self._lib.loader_next(self._handle, ctypes.byref(data))
        if slot < 0:
            raise StopIteration
        n = self.batch_size * self.segment_length
        batch = np.ctypeslib.as_array(data, shape=(self.batch_size,
                                                   self.segment_length)).copy()
        self._lib.loader_release(self._handle, slot)
        return batch

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            yield self.next_batch()

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PythonBatchLoader:
    """Threaded fallback using the VCTKTrain iterator."""

    def __init__(self, dataset, batch_size: int, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self._q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        it = iter(self.dataset)
        while not self._stop.is_set():
            batch = np.stack([next(it) for _ in range(self.batch_size)])
            self._q.put(batch.astype(np.float32))

    def next_batch(self) -> np.ndarray:
        return self._q.get()

    def __iter__(self):
        while True:
            yield self.next_batch()

    def close(self):
        self._stop.set()


def make_train_loader(dataset, batch_size: int, num_workers: int = 2,
                      prefetch: int = 4, seed: int = 0):
    """Build the best available batch loader for a VCTKTrain dataset."""
    try:
        return NativeBatchLoader(dataset.train_samples, batch_size,
                                 dataset.segment_length,
                                 n_slots=prefetch, n_workers=num_workers,
                                 seed=seed)
    except Exception:
        return PythonBatchLoader(dataset, batch_size, prefetch=prefetch)


class DeviceLoader:
    """Wraps a batch loader; device_puts (and shards) one batch ahead."""

    def __init__(self, loader, sharding=None):
        import jax
        self.loader = loader
        self.sharding = sharding
        self._jax = jax
        self._next = None
        self._prefetch()

    def _put(self, batch: np.ndarray):
        if self.sharding is not None:
            return self._jax.device_put(batch, self.sharding)
        return self._jax.device_put(batch)

    def _prefetch(self):
        self._next = self._put(self.loader.next_batch())

    def __next__(self):
        out = self._next
        self._prefetch()
        return out

    def __iter__(self):
        return self
