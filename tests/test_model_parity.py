"""Golden parity: Flax NCSN++ vs the PyTorch reference model.

Instantiates the reference implementation (read-only at /root/reference),
randomly initializes it, converts the torch state dict to Flax params with
buddy_tpu.models.convert, and checks both models produce the same outputs on
the same inputs — the strongest guarantee that the published checkpoint will
reproduce the same denoiser (BASELINE north-star: outputs match the PyTorch
reference within tolerance).
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _load_ref_ncsnpp():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from networks.ncsnpp import NCSNpp as TorchNCSNpp, NCSNppTime as TorchNCSNppTime
    return TorchNCSNpp, TorchNCSNppTime


SMALL = dict(nf=16, ch_mult=[1, 2, 2], num_res_blocks=1, attn_resolutions=[0],
             image_size=64, input_channels=2, spatial_channels=1,
             fourier_scale=16, dropout=0.0)


@pytest.fixture(scope="module")
def small_pair():
    TorchNCSNpp, _ = _load_ref_ncsnpp()
    torch.manual_seed(0)
    tmodel = TorchNCSNpp(**SMALL).eval()

    from buddy_tpu.models.ncsnpp import NCSNpp
    from buddy_tpu.models.convert import convert_torch_state_dict
    jmodel = NCSNpp(**{**SMALL, "ch_mult": tuple(SMALL["ch_mult"]),
                       "attn_resolutions": tuple(SMALL["attn_resolutions"])})
    params = convert_torch_state_dict(tmodel.state_dict(), wrap_time=False)
    return tmodel, jmodel, params


def test_param_count_matches(small_pair):
    tmodel, jmodel, params = small_pair
    n_torch = sum(p.numel() for p in tmodel.state_dict().values())
    n_jax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_torch == n_jax


def test_forward_parity_spec(small_pair, rng):
    tmodel, jmodel, params = small_pair
    x = (rng.standard_normal((2, 1, 64, 48)) + 1j * rng.standard_normal((2, 1, 64, 48))).astype(np.complex64)
    cnoise = np.asarray([-0.5, 0.3], dtype=np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), torch.from_numpy(cnoise)).numpy()
    ours = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(cnoise)))

    assert ours.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-4 * max(scale, 1.0), rtol=1e-3)


@pytest.mark.slow
def test_forward_parity_default_config(rng):
    """Parity at the reference's production config (nf=128, ch_mult [1,2,2,2],
    bottleneck attention; conf/network/ncsnpp.yaml:8-14) on a short input."""
    TorchNCSNpp, _ = _load_ref_ncsnpp()
    cfg = dict(nf=128, ch_mult=[1, 2, 2, 2], num_res_blocks=1,
               attn_resolutions=[0], image_size=256, input_channels=2,
               spatial_channels=1, fourier_scale=16, dropout=0.0)
    torch.manual_seed(2)
    tmodel = TorchNCSNpp(**cfg).eval()

    from buddy_tpu.models.ncsnpp import NCSNpp
    from buddy_tpu.models.convert import convert_torch_state_dict
    jmodel = NCSNpp(**{**cfg, "ch_mult": (1, 2, 2, 2), "attn_resolutions": (0,)})
    params = convert_torch_state_dict(tmodel.state_dict(), wrap_time=False)

    x = (rng.standard_normal((1, 1, 256, 32))
         + 1j * rng.standard_normal((1, 1, 256, 32))).astype(np.complex64)
    cnoise = np.asarray([-0.75], dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), torch.from_numpy(cnoise)).numpy()
    ours = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(cnoise)))
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(ours, ref, atol=5e-4 * scale, rtol=2e-3)


def test_forward_parity_positional_embedding(rng):
    """embedding_type=positional: sinusoidal temb, no Fourier module.

    The reference forward also indexes ``self.sigmas`` (ncsnpp.py:310) — an
    attribute its __init__ never defines (AttributeError upstream) and whose
    result is dead.  We patch a dummy onto the torch model so its forward
    runs; our port simply omits the dead lookup.
    """
    TorchNCSNpp, _ = _load_ref_ncsnpp()
    cfg = {**SMALL, "embedding_type": "positional"}
    torch.manual_seed(3)
    tmodel = TorchNCSNpp(**cfg).eval()
    tmodel.sigmas = torch.zeros(10000)  # dead upstream lookup (ncsnpp.py:310)

    from buddy_tpu.models.ncsnpp import NCSNpp
    from buddy_tpu.models.convert import convert_torch_state_dict
    jmodel = NCSNpp(**{**cfg, "ch_mult": tuple(SMALL["ch_mult"]),
                       "attn_resolutions": tuple(SMALL["attn_resolutions"])})
    params = convert_torch_state_dict(tmodel.state_dict(), wrap_time=False)

    n_torch = sum(p.numel() for p in tmodel.state_dict().values())
    n_jax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_torch == n_jax  # no GaussianFourier W in either

    x = (rng.standard_normal((2, 1, 64, 48))
         + 1j * rng.standard_normal((2, 1, 64, 48))).astype(np.complex64)
    timesteps = np.asarray([3.0, 17.0], dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), torch.from_numpy(timesteps)).numpy()
    ours = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(timesteps)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(ours, ref, atol=2e-4 * scale, rtol=1e-3)


def test_forward_parity_time_wrapper(rng):
    """Full NCSNppTime (STFT -> U-Net -> ISTFT) parity on waveforms."""
    _, TorchNCSNppTime = _load_ref_ncsnpp()
    from buddy_tpu.config import ConfigDict
    stft_kwargs = {"n_fft": 126, "hop_length": 32, "center": True}
    torch.manual_seed(1)
    # the reference accesses stft config both as attributes (get_window) and
    # as a mapping (**unpack) — ConfigDict supports both, like OmegaConf
    tmodel = TorchNCSNppTime(ConfigDict(stft_kwargs), **SMALL).eval()

    from buddy_tpu.models.ncsnpp import NCSNppTime
    from buddy_tpu.models.convert import convert_torch_state_dict
    jmodel = NCSNppTime(stft=stft_kwargs, **SMALL)
    params = convert_torch_state_dict(tmodel.state_dict(), wrap_time=True)

    x = rng.standard_normal((1, 1, 8192)).astype(np.float32) * 0.05
    cnoise = np.asarray([-1.2], dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), torch.from_numpy(cnoise)).numpy()
    ours = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(cnoise)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(ours, ref, atol=3e-3 * scale)


def test_legacy_checkpoint_formats(small_pair, tmp_path):
    """Every historical .pt layout the reference's 7-strategy loader
    handles (training_utils.py:88-178, tester.py:78-93) converts to the
    same Flax params as a direct state-dict conversion:

    * ``{'ema': sd}`` (modern, tester.py:49),
    * ``{'model': sd, 'ema_weights': [t]}`` zipped by key order,
    * the requires_grad-filtered zip (ema list covers trainable tensors
      only — buffers like GaussianFourierProjection.W come from 'model'),
    * ``diffusion.`` / ``diffusion_ema.`` prefixed flat dicts.
    """
    tmodel, _, base = small_pair
    from buddy_tpu.models.convert import load_torch_checkpoint
    sd = tmodel.state_dict()
    base_flat = jax.tree.leaves(base)

    def check(state, expect_flat, it=5):
        p = tmp_path / "ck.pt"
        torch.save({"it": it, **state}, str(p))
        params, got_it = load_torch_checkpoint(str(p), wrap_time=False)
        assert got_it == it
        got = jax.tree.leaves(params)
        assert len(got) == len(expect_flat)
        for a, b in zip(got, expect_flat):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # modern 'ema' key
    check({"ema": sd}, base_flat)

    # legacy zip, same length (tester.py:78-87)
    check({"model": sd, "ema_weights": [v.clone() for v in sd.values()]},
          base_flat)

    # requires_grad-filtered zip (training_utils.py:117-127): the filter
    # reads requires_grad off the SAVED tensors, so such checkpoints carry
    # live Parameters (keep_vars) — perturb the trainable ema tensors;
    # loaded params must reflect the perturbation for trainables and keep
    # the non-trainable GaussianFourierProjection.W from 'model'
    sd_vars = tmodel.state_dict(keep_vars=True)
    trainable = [k for k, v in sd_vars.items() if v.requires_grad]
    assert 0 < len(trainable) < len(sd)  # model has both kinds
    ema_w = [sd[k].detach() + 1.0 for k in trainable]
    from buddy_tpu.models.convert import convert_torch_state_dict
    merged = {k: (sd[k].detach() + 1.0 if k in trainable else sd[k])
              for k in sd}
    check({"model": sd_vars, "ema_weights": ema_w},
          jax.tree.leaves(convert_torch_state_dict(merged, wrap_time=False)))

    # diffusion_ema. prefix strip (training_utils.py:131-178)
    check({"network": {f"diffusion_ema.{k}": v for k, v in sd.items()}},
          base_flat)
