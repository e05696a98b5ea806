"""Checkpoint save/load with rotation, resume-by-glob, and .pt conversion.

Counterpart of the reference's checkpoint machinery: state dict
``{it, network, optimizer, ema, args}`` saved every save_interval with
old-checkpoint rotation (training/trainer.py:171-191), resume by globbing
``{exp_name}-*`` and picking the max iteration (trainer.py:148-165), and the
multi-strategy loader (utils/training_utils.py:6-178) reduced to the cases
that exist here: buddy_tpu Orbax directories, npz fallbacks, and reference
torch ``.pt`` files (converted via buddy_tpu.models.convert).
"""

from __future__ import annotations

import os
import re
import shutil
from glob import glob
from typing import Any, Optional, Tuple

import numpy as np

import jax


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(path: str, *, params, ema_params, opt_state=None,
                    it: int = 0, rng=None, args=None) -> str:
    """Save the full training state to ``<path>.ckpt`` (npz of the flattened
    pytrees — portable, dependency-free, synchronous; Orbax directories are
    supported on the *load* side for externally produced checkpoints).

    Matches the reference's state dict ``{it, network, optimizer, ema, args}``
    (training/trainer.py:171-178), plus the PRNG key so a resumed run is
    bit-identical to an uninterrupted one (torch relies on unsaved global RNG
    there; we can do better).  Optimizer state is stored positionally
    (``opt/0000``...) and restored against a treedef template from
    ``opt.init(params)`` — see ``load_opt_state``.
    """
    path = path if path.endswith(".ckpt") else path + ".ckpt"
    flat = {}
    flat.update({f"params/{k}": v for k, v in _flatten(jax.device_get(params)).items()})
    flat.update({f"ema/{k}": v for k, v in _flatten(jax.device_get(ema_params)).items()})
    flat["it"] = np.asarray(it)
    if opt_state is not None:
        for i, leaf in enumerate(jax.tree.leaves(jax.device_get(opt_state))):
            flat[f"opt/{i:05d}"] = np.asarray(leaf)
    if rng is not None:
        flat["rng"] = np.asarray(jax.device_get(
            jax.random.key_data(rng) if jax.dtypes.issubdtype(
                getattr(rng, "dtype", np.uint32), jax.dtypes.prng_key) else rng))
    if args is not None:
        import json
        cfg = args.to_dict() if hasattr(args, "to_dict") else dict(args)
        flat["args_json"] = np.asarray(json.dumps(cfg, default=str))
    np.savez(path, **flat)
    # npz appends .npz; normalize name
    if os.path.exists(path + ".npz"):
        shutil.move(path + ".npz", path)
    return path


def load_opt_state(path: str, template) -> Optional[Any]:
    """Restore optimizer state saved by ``save_checkpoint`` against a
    template pytree (``opt.init(params)``); None if the checkpoint predates
    optimizer-state saving or is a foreign format."""
    if not path.endswith((".ckpt", ".npz")):
        return None
    data = np.load(path, allow_pickle=False)
    keys = sorted(k for k in data.files if k.startswith("opt/"))
    if not keys:
        return None
    leaves, treedef = jax.tree.flatten(template)
    if len(keys) != len(leaves):
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {len(keys)} leaves, "
            f"optimizer expects {len(leaves)} — was the optimizer config changed?")
    restored = [np.asarray(data[k]).astype(l.dtype).reshape(l.shape)
                for k, l in zip(keys, leaves)]
    return jax.tree.unflatten(treedef, restored)


def load_extras(path: str) -> dict:
    """Load the rng key and config snapshot, when present."""
    out = {}
    if path.endswith((".ckpt", ".npz")):
        data = np.load(path, allow_pickle=False)
        if "rng" in data.files:
            out["rng"] = np.asarray(data["rng"])
        if "args_json" in data.files:
            import json
            out["args"] = json.loads(str(data["args_json"]))
    return out


def _load_npz(path: str, prefer_ema: bool) -> Tuple[dict, int]:
    data = np.load(path, allow_pickle=False)
    it = int(data["it"]) if "it" in data else 0
    for head in (("ema", "params") if prefer_ema else ("params", "ema")):
        sub = {k[len(head) + 1:]: data[k] for k in data.files
               if k.startswith(head + "/")}
        if sub:
            return _unflatten(sub), it
    raise ValueError(f"no params found in {path}")


def load_any_checkpoint(path: str, prefer_ema: bool = True) -> Tuple[Any, int]:
    """Load network params from any supported checkpoint format."""
    if path.endswith(".pt"):
        from buddy_tpu.models.convert import load_torch_checkpoint
        return load_torch_checkpoint(path, prefer_ema=prefer_ema)
    if path.endswith((".ckpt", ".npz")):
        return _load_npz(path, prefer_ema)
    if os.path.isdir(path):  # orbax directory
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(path)
        it = int(tree.get("it", 0))
        key = "ema" if (prefer_ema and "ema" in tree) else "params"
        return tree[key], it
    raise ValueError(f"unrecognized checkpoint format: {path}")


_CKPT_RE = r"-(\d+)\.(ckpt|pt)$"


def find_latest_checkpoint(model_dir: str, exp_name: str) -> Optional[str]:
    """Resume-by-glob (trainer.py:148-165)."""
    candidates = (glob(os.path.join(model_dir, f"{exp_name}-*.ckpt"))
                  + glob(os.path.join(model_dir, f"{exp_name}-*.pt")))
    best, best_it = None, -1
    for c in candidates:
        m = re.search(_CKPT_RE, c)
        if m and int(m.group(1)) > best_it:
            best, best_it = c, int(m.group(1))
    return best


def remove_checkpoint(path: Optional[str]) -> None:
    if path and os.path.exists(path):
        try:
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
            print("removed last checkpoint", path)
        except OSError:
            print("could not remove last checkpoint", path)
