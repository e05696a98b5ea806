"""Production-width tensor-parallel numerics gate (VERDICT r4 item 5).

The pytest tp gate (tests/test_batched.py) runs at nf=8 toy width; the
GroupNorm-group / tp-shard alignment argument, however, is about the
PRODUCTION widths (nf=128, groups = min(C//4, 32)).  This script runs ONE
SPMD train step at nf=128 on dp1 vs dp4xtp2 (8 virtual CPU devices) and
asserts loss / grad-norm / updated-params equality — the same gates as the
pytest test, at the width that matters.  Too slow for the suite (~10 min on
the 1-core box), so it lives here; the recorded run is TP_WIDTH_GATE.json.

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo python scripts/tp_width_gate.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle

AUDIO_LEN = 16384   # shortest length the 4-level U-Net + losses accept well
BATCH = 8
NF = 128            # production width (conf/network/ncsnpp.yaml)


def run(dp, tp):
    t0 = time.time()
    args = compose("conf_VCTK.yaml", [
        f"network.nf={NF}",
        f"exp.batch_size={BATCH}", f"exp.audio_len={AUDIO_LEN}",
        f"exp.mesh.dp={dp}", f"exp.mesh.tp={tp}",
        "exp.resume=False", "logging.log=False", "logging.save_model=False",
    ])
    args["model_dir"] = "/tmp/buddy_tp_width_gate"
    args["exp"]["model_dir"] = args["model_dir"]
    diff_params = instantiate(args["diff_params"])
    network = NetworkBundle(instantiate(args["network"]))
    network.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 1, AUDIO_LEN), jnp.float32),
                 jnp.zeros((1,), jnp.float32))

    rng = np.random.default_rng(0)
    fixed = rng.standard_normal((BATCH, AUDIO_LEN)).astype(np.float32) * 0.05

    class _Loader:
        def next_batch(self):
            return fixed

    trainer = instantiate(args["exp"]["trainer"], args, _Loader(), network,
                          diff_params, None)
    assert trainer.mesh.devices.size == dp * tp
    trainer.train_step()
    tp_sharded = any(
        getattr(leaf, "ndim", 0) == 4 and not leaf.sharding.is_fully_replicated
        for leaf in jax.tree.leaves(trainer.params))
    metrics = jax.device_get(trainer._metrics_acc)
    params = jax.device_get(trainer.params)
    print(f"dp{dp}xtp{tp}: loss={float(metrics['loss']):.6f} "
          f"({time.time()-t0:.0f}s, tp_sharded={tp_sharded})", flush=True)
    return metrics, params, tp_sharded


def main():
    t0 = time.time()
    m1, p1, _ = run(1, 1)
    m42, p42, tp_sharded = run(4, 2)
    assert tp_sharded, "no conv kernel tp-sharded on the (4,2) mesh at nf=128"
    np.testing.assert_allclose(m1["loss"], m42["loss"], rtol=1e-5)
    np.testing.assert_allclose(m1["grad_norm"], m42["grad_norm"], rtol=1e-5)
    np.testing.assert_allclose(m1["bin_sum"], m42["bin_sum"], rtol=1e-5,
                               atol=1e-7)
    max_rel = 0.0
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p42)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        denom = np.maximum(np.abs(a), 1e-5)
        max_rel = max(max_rel, float(np.max(np.abs(a - b) / denom)))
    out = {
        "nf": NF, "audio_len": AUDIO_LEN, "batch": BATCH,
        "loss_dp1": float(m1["loss"]), "loss_dp4tp2": float(m42["loss"]),
        "grad_norm_dp1": float(m1["grad_norm"]),
        "grad_norm_dp4tp2": float(m42["grad_norm"]),
        "max_param_rel_diff": max_rel, "ok": True,
        "wall_s": round(time.time() - t0, 1),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TP_WIDTH_GATE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
