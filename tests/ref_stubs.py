"""Import helpers for running the torch reference (read-only, /root/reference)
inside tests: stubs for packages absent from this environment.

The stubs cover only what the reference modules touch at import time or in
the code paths under test; notably the torchcde stand-in implements
differentiable piecewise-linear interpolation (the only torchcde feature the
reference uses, subband_filtering.py:233-235) so gradients flow in blind
inner-loop parity tests.
"""

import sys
import types

import torch

REF = "/root/reference"


def install_torchcde_stub():
    if "torchcde" in sys.modules and hasattr(sys.modules["torchcde"], "_differentiable"):
        return
    mod = types.ModuleType("torchcde")
    mod._differentiable = True

    def linear_interpolation_coeffs(x):
        return x

    class LinearInterpolation:
        def __init__(self, coeffs, t=None):
            self.coeffs = coeffs  # (B, K, C)
            self.t = t            # (K,)

        def evaluate(self, points):
            t, c = self.t, self.coeffs
            idx = torch.searchsorted(t, points).clamp(1, len(t) - 1)
            t0, t1 = t[idx - 1], t[idx]
            w = ((points - t0) / (t1 - t0)).clamp(0, 1)
            v0 = c[:, idx - 1, :]
            v1 = c[:, idx, :]
            return v0 + w[None, :, None] * (v1 - v0)

    mod.linear_interpolation_coeffs = linear_interpolation_coeffs
    mod.LinearInterpolation = LinearInterpolation
    sys.modules["torchcde"] = mod


def install_package_stubs():
    """plotly/soundfile/pandas/wandb/torchaudio/nara_wpe/tqdm stand-ins."""
    import importlib.machinery
    for name in ("plotly", "plotly.express", "plotly.graph_objects",
                 "soundfile", "pandas", "wandb", "torchaudio"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # torch._dynamo probes find_spec() on these; a None __spec__ raises
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod

    if "nara_wpe" not in sys.modules:
        pkg = types.ModuleType("nara_wpe")
        wpe_mod = types.ModuleType("nara_wpe.wpe")
        wpe_mod.wpe = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("nara_wpe stub: not runnable"))
        utils_mod = types.ModuleType("nara_wpe.utils")
        utils_mod.stft = wpe_mod.wpe
        utils_mod.istft = wpe_mod.wpe
        pkg.wpe = wpe_mod
        pkg.utils = utils_mod
        sys.modules["nara_wpe"] = pkg
        sys.modules["nara_wpe.wpe"] = wpe_mod
        sys.modules["nara_wpe.utils"] = utils_mod


def ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    install_torchcde_stub()
    install_package_stubs()
    return REF
