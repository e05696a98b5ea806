"""End-to-end integration tests on the reference's audio_examples fixtures —
the counterpart of the reference's shell-script smoke tests (SURVEY.md §4):
training steps with checkpoint save/resume, and the three tester workloads
driven through the real config tree with CLI-style overrides, on a tiny
model and short schedules so they run on CPU.
"""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, "/root/repo")

AUDIO = "/root/reference/audio_examples"

TINY_NET = [
    "network.nf=8",
    "network.ch_mult=[1,2]",
    "network.num_res_blocks=1",
    "network.image_size=256",
]


def compose_args(tester, extra):
    from buddy_tpu.config import compose
    return compose("conf_VCTK.yaml", [f"tester={tester}", *TINY_NET, *extra])


@pytest.fixture(scope="module")
def tiny_network():
    from buddy_tpu.config import compose, instantiate
    from buddy_tpu.models import NetworkBundle
    args = compose("conf_VCTK.yaml", TINY_NET)
    net = NetworkBundle(instantiate(args["network"]))
    import jax.numpy as jnp
    net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 4096)), jnp.zeros((1,)))
    return net


def test_trainer_steps_and_resume(tmp_path):
    """A few optimization steps reduce nothing catastrophic: loss finite,
    params move, EMA tracks, checkpoint save + resume restores iteration."""
    from buddy_tpu.config import compose, instantiate
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.data.loader import make_train_loader

    args = compose("conf_VCTK.yaml", [
        *TINY_NET,
        f"dset.train.path={AUDIO}/clean",
        "dset.train.speakers_discard=[]",
        "dset.train.speakers_test=[]",
        "exp.batch_size=2",
        "exp.audio_len=4096",
        "dset.train.segment_length=4096",
        "exp.resume=False",
        "logging.log=False",
        "logging.save_model=True",
        "logging.save_interval=2",
        "exp.max_iters=3",
        f"model_dir={tmp_path}",
    ])
    args["exp"]["model_dir"] = str(tmp_path)

    train_set = instantiate(args["dset"]["train"])
    loader = make_train_loader(train_set, batch_size=2, num_workers=1)
    diff_params = instantiate(args["diff_params"])
    network = NetworkBundle(instantiate(args["network"]))
    trainer = instantiate(args["exp"]["trainer"], args, loader, network,
                          diff_params, None)

    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)
    trainer.training_loop()
    assert trainer.it == 4
    moved = [not np.allclose(a, np.asarray(b))
             for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(trainer.params))]
    # most leaves move (params feeding zero-init convs get grads below Adam's
    # eps and barely move — same as the torch reference's init_scale=0 convs)
    assert sum(moved) >= 0.8 * len(moved)
    # the frozen W stayed frozen (stop_gradient parity with requires_grad=False)
    w0 = p0["params"]["unet"]["all_modules_0"]["W"]
    w1 = np.asarray(trainer.params["params"]["unet"]["all_modules_0"]["W"])
    np.testing.assert_array_equal(w0, w1)
    assert trainer.latest_checkpoint is not None
    assert os.path.exists(trainer.latest_checkpoint)

    # resume: a new trainer picks up the saved iteration
    args["exp"]["resume"] = True
    network2 = NetworkBundle(instantiate(args["network"]))
    trainer2 = instantiate(args["exp"]["trainer"], args, loader, network2,
                           diff_params, None)
    assert trainer2.it == 2  # saved at it=2
    e0 = jax.tree.leaves(trainer.ema_params)[0]
    loader.close()


@pytest.mark.parametrize("mode_cfg", [
    ("only_unconditional", ["tester.sampling_params.T=6",
                            "tester.unconditional.audio_len=4096",
                            "tester.unconditional.num_samples=2"]),
])
def test_tester_unconditional(tmp_path, tiny_network, mode_cfg):
    from buddy_tpu.config import instantiate
    from buddy_tpu.testing.tester import Tester

    tester_name, extra = mode_cfg
    args = compose_args(tester_name, extra + [f"model_dir={tmp_path}"])
    args["exp"]["audio_len"] = 4096
    diff_params = instantiate(args["diff_params"])
    t = Tester(args, tiny_network, diff_params)
    preds = t.do_test()
    preds = np.asarray(preds)
    assert preds.shape == (2, 4096)
    assert np.isfinite(preds).all()
    wavs = [f for f in os.listdir(t.paths["unconditional"]) if f.endswith(".wav")]
    assert len(wavs) == 2


def test_tester_informed_dereverberation(tmp_path, tiny_network):
    from buddy_tpu.config import instantiate
    from buddy_tpu.testing.tester import Tester
    from buddy_tpu.data.vctk import VCTKTestPaired

    args = compose_args("informed_dereverberation_DPS",
                        ["tester.sampling_params.T=4",
                         f"model_dir={tmp_path}",
                         "+tester.bucket_pad=16384"])
    diff_params = instantiate(args["diff_params"])
    ds = VCTKTestPaired(fs=16000, segment_length=-1, path=AUDIO,
                        speakers_discard=[], speakers_test=["p226"],
                        num_examples=1, shuffle=False)
    # crop fixture audio/RIR so the CPU-compiled program stays small
    ds.test_audio[0] = ds.test_audio[0][:24000]
    ds.test_rir[0] = ds.test_rir[0][:4000]
    t = Tester(args, tiny_network, diff_params, test_set=ds)
    t.do_test()
    mode = "informed_dereverberation"
    for sub in ("original", "degraded", "reconstructed", "true_rir"):
        files = os.listdir(t.paths[mode + sub])
        assert len(files) == 1, sub
    rec, sr = _read(t.paths[mode + "reconstructed"])
    assert np.isfinite(rec).all()


def test_tester_blind_dereverberation(tmp_path, tiny_network):
    """The flagship workload end-to-end: blind BUDDy on a fixture utterance
    (tiny schedule + operator updates for CPU)."""
    from buddy_tpu.config import instantiate
    from buddy_tpu.testing.tester import Tester
    from buddy_tpu.data.vctk import VCTKTestPaired

    args = compose_args("blind_dereverberation_BUDDy",
                        ["tester.sampling_params.T=2",
                         "tester.posterior_sampling.blind_hp.op_updates_per_step=2",
                         "tester.posterior_sampling.warm_initialization.wpe.taps=10",
                         f"model_dir={tmp_path}",
                         "+tester.bucket_pad=16384"])
    diff_params = instantiate(args["diff_params"])
    ds = VCTKTestPaired(fs=16000, segment_length=-1, path=AUDIO,
                        speakers_discard=[], speakers_test=["p287"],
                        num_examples=1, shuffle=False)
    # crop fixture audio/RIR so the CPU-compiled program stays small
    ds.test_audio[0] = ds.test_audio[0][:24000]
    ds.test_rir[0] = ds.test_rir[0][:4000]
    t = Tester(args, tiny_network, diff_params, test_set=ds)
    t.do_test()
    mode = "blind_dereverberation"
    for sub in ("original", "degraded", "reconstructed", "true_rir",
                "estimated_rir"):
        files = os.listdir(t.paths[mode + sub])
        assert len(files) == 1, sub
    rec, sr = _read(t.paths[mode + "reconstructed"])
    assert np.isfinite(rec).all()
    est, _ = _read(t.paths[mode + "estimated_rir"])
    assert np.isfinite(est).all()
    assert est.shape[-1] > 1000  # a full-length estimated RIR was written


def _read(dirpath):
    from buddy_tpu.data.audio_io import read_wav
    f = [x for x in os.listdir(dirpath) if x.endswith(".wav")][0]
    return read_wav(os.path.join(dirpath, f))


def test_tester_chunked_long_utterance(tmp_path, tiny_network):
    """Utterances beyond tester.chunked.threshold go through overlap-add
    chunked inference (BASELINE config 5) — one compiled program per chunk
    size, crossfaded output of full length."""
    from buddy_tpu.config import instantiate
    from buddy_tpu.testing.tester import Tester
    from buddy_tpu.data.vctk import VCTKTestPaired

    args = compose_args("informed_dereverberation_DPS",
                        ["tester.sampling_params.T=2",
                         f"model_dir={tmp_path}",
                         "+tester.bucket_pad=8192",
                         "+tester.chunked.threshold=16384",
                         "+tester.chunked.chunk_size=16384",
                         "+tester.chunked.overlap=4096"])
    diff_params = instantiate(args["diff_params"])
    ds = VCTKTestPaired(fs=16000, segment_length=-1, path=AUDIO,
                        speakers_discard=[], speakers_test=["p226"],
                        num_examples=1, shuffle=False)
    n_long = 40000  # > threshold -> 3 chunks
    ds.test_audio[0] = ds.test_audio[0][:n_long]
    ds.test_rir[0] = ds.test_rir[0][:2000]
    t = Tester(args, tiny_network, diff_params, test_set=ds)
    t.do_test()
    mode = "informed_dereverberation"
    rec, sr = _read(t.paths[mode + "reconstructed"])
    assert rec.shape[-1] == n_long
    assert np.isfinite(rec).all()
