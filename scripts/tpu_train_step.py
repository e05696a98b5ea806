"""TPU training-step throughput: steady-state ms/step of the jitted SPMD
train step at the reference's production config (batch 16, 65536 samples,
Adam + grad-clip + EMA + device-side metrics — trainer.py:140-192).

The reference trains on a single GPU with a per-step host sync
(/root/reference/training/trainer.py:203); here the whole step is one
compiled program and metrics accumulate on device.

Usage:  python scripts/tpu_train_step.py [batch] [dtype] [reps]
Prints one JSON line with ms/step and samples-of-audio-seconds/s.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

from buddy_tpu.config import compose, instantiate  # noqa: E402
from buddy_tpu.models import NetworkBundle  # noqa: E402
from buddy_tpu.training.trainer import Trainer  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "float32"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
AUDIO_LEN = 65536
SR = 16000


class RandomBatches:
    """Stand-in loader: the real input pipeline (native prefetch ring) is
    not the quantity under test here."""

    def __init__(self, batch, n):
        rng = np.random.default_rng(0)
        self._b = [0.05 * rng.standard_normal((batch, n)).astype(np.float32)
                   for _ in range(2)]
        self._i = 0

    def next_batch(self):
        self._i += 1
        return self._b[self._i % 2]


def main():
    extra = os.environ.get("TRAIN_OVERRIDES", "")
    args = compose("conf_VCTK.yaml", [
        f"exp.batch_size={BATCH}",
        f"network.compute_dtype={DTYPE}",
        "exp.resume=false",
        "logging.log=false",
    ] + ([o for o in extra.split() if "=" in o]))
    args["exp"]["model_dir"] = "/tmp/tpu_train_step"
    os.makedirs(args["exp"]["model_dir"], exist_ok=True)

    network = NetworkBundle(instantiate(args["network"]))
    diff_params = instantiate(args["diff_params"])
    dset = RandomBatches(BATCH, AUDIO_LEN)

    t0 = time.time()
    trainer = Trainer(args=args, dset=dset, network=network,
                      diff_params=diff_params, tester=None)
    print(f"trainer ready ({time.time()-t0:.0f}s); compiling train step...",
          file=sys.stderr, flush=True)

    t0 = time.time()
    trainer.train_step()  # compile + run
    jax.block_until_ready(trainer.params)
    compile_s = time.time() - t0
    print(f"train step compiled+ran ({compile_s:.0f}s); timing...",
          file=sys.stderr, flush=True)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        trainer.train_step()
        jax.block_until_ready(trainer.params)
        times.append(time.perf_counter() - t0)
    ms = float(np.min(times)) * 1e3

    print(json.dumps({
        "metric": "train step ms (batch 16, 4s audio, one chip)",
        "ms_per_step": round(ms, 1),
        "audio_seconds_per_second": round(BATCH * AUDIO_LEN / SR / (ms / 1e3), 1),
        "batch": BATCH, "dtype": DTYPE, "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
