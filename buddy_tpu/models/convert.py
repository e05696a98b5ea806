"""PyTorch -> Flax checkpoint conversion for NCSN++.

The reference publishes a pretrained VCTK checkpoint (README.md:13) saved as
``{it, network, optimizer, ema, args}`` (training/trainer.py:171-178); the
tester loads the ``ema`` weights (testing/tester.py:60-67).  Because our Flax
module names mirror the reference's flat ``all_modules.{i}`` ordering
(buddy_tpu/models/ncsnpp.py), conversion is a mechanical per-tensor layout
transpose:

    Linear  weight (out,in)        -> Dense kernel (in,out)
    Conv2d  weight (O,I,kH,kW)     -> Conv kernel (kH,kW,I,O)
    GroupNorm weight/bias          -> scale/bias
    NIN W/b, GaussianFourier W     -> unchanged

Includes the non-trainable GaussianFourierProjection.W (layerspp.py:37) —
SURVEY.md §7 hard-part #5.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _to_numpy(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _convert_leaf(name: str, value: np.ndarray) -> tuple[str, np.ndarray]:
    if name == "weight":
        if value.ndim == 4:           # Conv2d OIHW -> HWIO
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:           # Linear (out,in) -> (in,out)
            return "kernel", value.T
        return "scale", value          # GroupNorm weight
    if name == "bias":
        return "bias", value
    return name, value                 # NIN W/b, GaussianFourier W


def convert_torch_state_dict(state_dict: Mapping[str, Any], *,
                             wrap_time: bool = True) -> dict:
    """Convert a reference ``network``/``ema`` state dict to Flax params.

    Torch keys ``all_modules.{i}[.{sub}].{param}`` map to the Flax tree
    ``all_modules_{i}[/{sub}]/{param'}``; ``output_layer.*`` likewise.  With
    ``wrap_time`` the tree nests under ``unet`` except nothing else exists at
    the NCSNppTime level (the wrapper adds no parameters; ncsnpp.py:455-506).
    """
    tree: dict = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] == "all_modules":
            path = [f"all_modules_{parts[1]}"] + parts[2:-1]
        elif parts[0] == "output_layer":
            path = ["output_layer"] + parts[1:-1]
        else:
            # unknown key (e.g. buffers from other variants) — skip
            continue
        leaf_name, leaf = _convert_leaf(parts[-1], _to_numpy(value))
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = leaf

    if wrap_time:
        tree = {"unet": tree}
    return {"params": tree}


def load_torch_checkpoint(path: str, *, prefer_ema: bool = True,
                          wrap_time: bool = True) -> tuple[dict, int]:
    """Load a reference ``.pt`` checkpoint file into Flax params.

    Follows the tester's strategy (tester.py:60-67): prefer the ``ema``
    weights, fall back to ``network``/``model``; returns (params, iteration).
    """
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    it = int(state.get("it", 0)) if isinstance(state, dict) else 0
    if isinstance(state, dict):
        # legacy format: {'model': state_dict, 'ema_weights': [tensors]}
        # zipped by key order (tester.py:78-93 / training_utils.py:88-130)
        if prefer_ema and "ema" not in state and "ema_weights" in state \
                and "model" in state:
            model_sd = state["model"]
            ema_w = state["ema_weights"]
            if len(ema_w) == len(model_sd):
                state = {k: w for k, w in zip(model_sd.keys(), ema_w)}
            else:  # ema covers trainable tensors only (requires_grad filter)
                merged, i = {}, 0
                for k, tensor in model_sd.items():
                    if tensor.requires_grad and i < len(ema_w):
                        merged[k] = ema_w[i]
                        i += 1
                    else:
                        merged[k] = tensor
                state = merged
        else:
            for key in (("ema", "network", "model") if prefer_ema
                        else ("network", "model", "ema")):
                if key in state and isinstance(state[key], dict):
                    state = state[key]
                    break
        # strip 'diffusion.'/'diffusion_ema.' prefixes (training_utils.py:131-178)
        if any(k.startswith(("diffusion.", "diffusion_ema.")) for k in state):
            pref = "diffusion_ema." if prefer_ema and any(
                k.startswith("diffusion_ema.") for k in state) else "diffusion."
            state = {k[len(pref):]: v for k, v in state.items()
                     if k.startswith(pref)}
    return convert_torch_state_dict(state, wrap_time=wrap_time), it
