"""Entry-point tests: train.py / test.py mains with CLI-style overrides,
and loading a reference-format torch ``.pt`` checkpoint through the tester
(the path a user of the published VCTK checkpoint takes)."""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo")

AUDIO = "/root/reference/audio_examples"

TINY = ["network.nf=8", "network.ch_mult=[1,2]", "network.num_res_blocks=1"]


def _load_entry(name):
    """Import our entry module by explicit path — /root/reference (inserted
    by ref_stubs in other tests) also has train.py/test.py on sys.path."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"buddy_{name}", f"/root/repo/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_main(tmp_path):
    train_mod = _load_entry("train")

    argv = [
        "--config-name=conf_VCTK.yaml",
        *TINY,
        f"dset.train.path={AUDIO}/clean",
        "dset.train.speakers_discard=[]",
        "dset.train.speakers_test=[]",
        "dset.train.segment_length=4096",
        "exp.batch_size=2",
        "exp.audio_len=4096",
        "exp.resume=False",
        "exp.max_iters=1",
        "logging.log=False",
        "logging.save_model=False",
        f"model_dir={tmp_path}",
    ]
    train_mod.main(argv)  # one step, no crash


def test_test_main_with_torch_checkpoint(tmp_path):
    """Save a reference-format .pt (state under 'ema', tester.py:49/60-67)
    from the torch reference model, then run test.py's informed mode with it
    and check the outputs match the torch model's function."""
    from ref_stubs import ref_path
    ref_path()
    from networks.ncsnpp import NCSNppTime as TorchNCSNppTime
    from buddy_tpu.config import ConfigDict

    stft_cfg = {"n_fft": 510, "hop_length": 128, "center": True}
    torch.manual_seed(0)
    tmodel = TorchNCSNppTime(ConfigDict(stft_cfg), nf=8, ch_mult=[1, 2],
                             num_res_blocks=1, image_size=256,
                             input_channels=2, spatial_channels=1,
                             fourier_scale=16, dropout=0.0).eval()
    ckpt_path = str(tmp_path / "ref-5.pt")
    torch.save({"it": 5, "ema": tmodel.state_dict(),
                "network": tmodel.state_dict()}, ckpt_path)

    # load through the tester machinery
    from buddy_tpu.config import compose, instantiate
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.testing.tester import Tester

    args = compose("conf_VCTK.yaml", [
        "tester=informed_dereverberation_DPS",
        *TINY,
        "tester.sampling_params.T=3",
        f"model_dir={tmp_path}",
        "+tester.bucket_pad=16384",
    ])
    network = NetworkBundle(instantiate(args["network"]))
    diff_params = instantiate(args["diff_params"])
    tester = Tester(args, network, diff_params)
    assert tester.load_checkpoint(ckpt_path)
    assert tester.it == 5

    # converted params reproduce the torch model's function
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 1, 8192)).astype(np.float32) * 0.05
    cnoise = np.asarray([-0.8], np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x), torch.from_numpy(cnoise)).numpy()
    ours = np.asarray(network.module.apply(network.params, jnp.asarray(x),
                                           jnp.asarray(cnoise)))
    scale = max(np.abs(ref_out).max(), 1e-3)
    np.testing.assert_allclose(ours, ref_out, atol=3e-3 * scale)

    # and the full informed pipeline runs on a fixture utterance
    from buddy_tpu.data.vctk import VCTKTestPaired
    ds = VCTKTestPaired(fs=16000, segment_length=-1, path=AUDIO,
                        speakers_discard=[], speakers_test=["p226"],
                        num_examples=1, shuffle=False)
    ds.test_audio[0] = ds.test_audio[0][:16000]
    ds.test_rir[0] = ds.test_rir[0][:2000]
    tester.test_set = ds
    tester.do_test()
    rec_dir = tester.paths["informed_dereverberationreconstructed"]
    assert len(os.listdir(rec_dir)) == 1
