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
import jax.numpy as jnp

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


def test_chunked_crossfade_is_identity(tmp_path, tiny_network):
    """If the sampler reproduces each chunk exactly, the overlap-add
    crossfade must reassemble the input exactly — validates the window
    math (weights normalize to 1, no seams, exact length)."""
    from buddy_tpu.config import instantiate
    from buddy_tpu.testing.tester import Tester

    args = compose_args("informed_dereverberation_DPS",
                        ["tester.sampling_params.T=2",
                         f"model_dir={tmp_path}",
                         "+tester.chunked.threshold=16384",
                         "+tester.chunked.chunk_size=16384",
                         "+tester.chunked.overlap=4096"])
    diff_params = instantiate(args["diff_params"])
    t = Tester(args, tiny_network, diff_params)

    class _IdentitySampler:
        def predict_conditional(self, y_c, operator, shape=None, blind=False,
                                rng=None, **_):
            return np.asarray(y_c)
    t.sampler = _IdentitySampler()

    n = 40000
    y = np.random.default_rng(0).standard_normal((1, n)).astype(np.float32)
    out = t._predict_chunked(jnp.asarray(y), operator=None, blind=False, n=n)
    assert out.shape == (1, n)
    np.testing.assert_allclose(out, y, rtol=1e-5, atol=1e-6)


def _oracle_net(edm):
    """A scale-invariant 'oracle' denoiser mock: x_den = sigma_data * x /
    std(x).  Recovers x and t from the preconditioned net inputs (cin*x,
    cnoise = log(t)/4), so the DPS machinery runs unchanged while the score
    model is deterministic — isolates the chunking/crossfade design from
    random-weight noise."""
    def net(z, cnoise):
        t = jnp.exp(4.0 * cnoise)
        t = jnp.reshape(t, (-1,) + (1,) * (z.ndim - 1))
        x = z / edm.cin(t)
        target = 0.05 * x / (jnp.std(x, axis=-1, keepdims=True) + 1e-12)
        return (target - edm.cskip(t) * x) / edm.cout(t)
    return net


def test_chunked_blind_matches_unchunked(tmp_path):
    """Chunked overlap-add blind output vs an unchunked run of the same
    utterance with a deterministic oracle denoiser (VERDICT round-1 item 9).

    Exact waveform match is NOT expected: the serving path renormalizes
    x_den to sigma_data per program (constraint_speech_magnitude), so each
    chunk carries its own local scale, and the blind filter is estimated on
    chunk 1 only — both inherent to the chunked design.  Calibrated values
    on this config: rel=0.55, corr=0.85.  The gates catch crossfade/
    plumbing regressions (a seam or misalignment drops corr below ~0.5);
    exact crossfade math is pinned by test_chunked_crossfade_is_identity."""
    from buddy_tpu.config import instantiate
    from buddy_tpu.testing.tester import Tester
    from buddy_tpu.data.vctk import VCTKTestPaired

    def build(threshold):
        args = compose_args(
            "blind_dereverberation_BUDDy",
            ["tester.sampling_params.T=3",
             "tester.posterior_sampling.blind_hp.op_updates_per_step=2",
             "tester.sampling_params.Schurn=0",
             "tester.posterior_sampling.warm_initialization.mode=reverb_scaled",
             f"model_dir={tmp_path}",
             "+tester.bucket_pad=8192",
             f"+tester.chunked.threshold={threshold}",
             "+tester.chunked.chunk_size=16384",
             "+tester.chunked.overlap=4096"])
        diff_params = instantiate(args["diff_params"])
        ds = VCTKTestPaired(fs=16000, segment_length=-1, path=AUDIO,
                            speakers_discard=[], speakers_test=["p226"],
                            num_examples=1, shuffle=False)
        n_long = 40000
        ds.test_audio[0] = ds.test_audio[0][:n_long]
        ds.test_rir[0] = ds.test_rir[0][:2000]
        t = Tester(args, _oracle_net(diff_params), diff_params, test_set=ds,
                   rng=jax.random.PRNGKey(123))
        t.do_test()
        rec, _ = _read(t.paths["blind_dereverberation" + "reconstructed"])
        import shutil
        shutil.rmtree(t.path_sampling)
        return rec

    full = build(threshold=163840)   # unchunked
    chunked = build(threshold=16384)  # 3 chunks
    assert full.shape == chunked.shape
    assert np.isfinite(chunked).all()
    rel = np.linalg.norm(chunked - full) / (np.linalg.norm(full) + 1e-12)
    assert rel < 0.7, f"chunked output diverges from unchunked: rel={rel:.3f}"
    corr = np.corrcoef(chunked.ravel(), full.ravel())[0, 1]
    assert corr > 0.75, f"chunked/unchunked decorrelated: corr={corr:.3f}"


def test_chunked_informed_matches_unchunked(tmp_path):
    """Chunked-vs-unchunked in INFORMED mode with every stochastic/structural
    confound removed, so the gates are tight enough to catch sub-seam drift
    (VERDICT r2 item 7):

    * stationary input (white noise, not speech) — the oracle denoiser and
      the warm init both normalize by per-program std, so with equal chunk
      stds the per-chunk-gain confound of the blind variant vanishes;
    * short RIR (500 taps << 4096-sample overlap) — the reverb tail leaking
      across chunk boundaries stays inside the crossfade region;
    * sigma_max=1e-3 << the 0.05 signal scale — the per-chunk random warm
      init noise is ~2% of signal, and Schurn=0 removes churn noise.

    What remains is the chunk plumbing itself: alignment, hann crossfade,
    operator reuse, guidance scaling across chunk lengths.  Gates are
    calibrated value +10% (measured on this config: rel=0.0459,
    corr=0.99895)."""
    from buddy_tpu.config import instantiate
    from buddy_tpu.testing.tester import Tester
    from buddy_tpu.data.vctk import VCTKTestPaired

    rng0 = np.random.default_rng(0)
    n_long = 40000
    sig = rng0.standard_normal(n_long).astype(np.float32)
    rir = (rng0.standard_normal(500)
           * np.exp(-np.arange(500) / 80.0)).astype(np.float32)
    rir[0] = 1.0

    def build(threshold):
        args = compose_args(
            "informed_dereverberation_DPS",
            ["tester.sampling_params.T=5",
             "tester.sampling_params.Schurn=0",
             "tester.sampling_params.sde_hp.sigma_max=1e-3",
             "tester.sampling_params.sde_hp.sigma_min=1e-5",
             f"model_dir={tmp_path}",
             "+tester.bucket_pad=8192",
             f"+tester.chunked.threshold={threshold}",
             "+tester.chunked.chunk_size=16384",
             "+tester.chunked.overlap=4096"])
        diff_params = instantiate(args["diff_params"])
        ds = VCTKTestPaired(fs=16000, segment_length=-1, path=AUDIO,
                            speakers_discard=[], speakers_test=["p226"],
                            num_examples=1, shuffle=False)
        ds.test_audio[0] = sig.copy()
        ds.test_rir[0] = rir.copy()
        t = Tester(args, _oracle_net(diff_params), diff_params, test_set=ds,
                   rng=jax.random.PRNGKey(123))
        t.do_test()
        rec, _ = _read(t.paths["informed_dereverberation" + "reconstructed"])
        import shutil
        shutil.rmtree(t.path_sampling)
        return rec

    full = build(threshold=163840)    # unchunked
    chunked = build(threshold=16384)  # 3 chunks
    assert full.shape == chunked.shape
    assert np.isfinite(chunked).all()
    rel = np.linalg.norm(chunked - full) / (np.linalg.norm(full) + 1e-12)
    assert rel < 0.0505, f"chunked informed output drifted: rel={rel:.4f}"
    corr = np.corrcoef(chunked.ravel(), full.ravel())[0, 1]
    assert corr > 0.99884, f"chunked informed decorrelated: corr={corr:.5f}"


def _make_trainer(tmp_path, resume: bool):
    """A trainer over a constant batch (deterministic trajectory)."""
    from buddy_tpu.config import compose, instantiate
    from buddy_tpu.models import NetworkBundle

    audio_len = 4096
    args = compose("conf_VCTK.yaml", [
        *TINY_NET,
        "exp.batch_size=2", f"exp.audio_len={audio_len}",
        "exp.mesh.dp=1",
        f"exp.resume={resume}", "logging.log=False", "logging.save_model=True",
        f"model_dir={tmp_path}",
    ])
    args["exp"]["model_dir"] = str(tmp_path)
    args["model_dir"] = str(tmp_path)
    diff_params = instantiate(args["diff_params"])
    network = NetworkBundle(instantiate(args["network"]))
    import jax.numpy as jnp
    network.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 1, audio_len), jnp.float32),
                 jnp.zeros((1,), jnp.float32))

    fixed = np.random.default_rng(0).standard_normal(
        (2, audio_len)).astype(np.float32) * 0.05

    class _Loader:
        def next_batch(self):
            return fixed

    return instantiate(args["exp"]["trainer"], args, _Loader(), network,
                       diff_params, None)


def test_resume_is_bit_faithful(tmp_path):
    """A save/resume run reproduces the uninterrupted trajectory exactly:
    the checkpoint round-trips params + EMA + Adam moments + the PRNG key
    (reference trainer.py:171-178 saves the optimizer; round 1 re-inited
    Adam on resume, silently diverging)."""
    from buddy_tpu.training import checkpoint as ckpt

    tA = _make_trainer(tmp_path, resume=False)
    for _ in range(3):
        tA.train_step()
    tA.it = 3
    tA.save_checkpoint()
    for _ in range(3):
        tA.train_step()
    pA = jax.device_get(tA.params)
    eA = jax.device_get(tA.ema_params)

    tB = _make_trainer(tmp_path, resume=True)
    assert tB.it == 3  # resumed
    for _ in range(3):
        tB.train_step()
    pB = jax.device_get(tB.params)
    eB = jax.device_get(tB.ema_params)

    for a, b in zip(jax.tree.leaves(pA), jax.tree.leaves(pB)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(eA), jax.tree.leaves(eB)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the config snapshot rode along (reference saves `args`)
    extras = ckpt.load_extras(tA.latest_checkpoint)
    assert extras["args"]["exp"]["batch_size"] == 2
    assert "rng" in extras


def test_sigma_bin_stats_match_numpy_oracle(tmp_path):
    """The device-side sigma-bin accumulator equals a numpy re-computation
    from the same error/sigma draw (VERDICT round-1 item 8)."""
    from functools import partial

    trainer = _make_trainer(tmp_path, resume=False)
    rng0 = trainer.rng
    # snapshot before the step: train_step donates its param buffers, and
    # network.params aliases them (same-device device_put is no-copy)
    params0 = jax.device_get(trainer.params)
    trainer.train_step()
    acc = jax.device_get(trainer._metrics_acc)

    # replay the step's randomness: train_step splits rng once
    _, k = jax.random.split(rng0)
    batch = trainer.dset.next_batch()

    def net_fn(params, x, cnoise):
        return trainer.network.module.apply(params, x[:, None, :], cnoise)[:, 0, :]

    error, sigma = trainer.diff_params.loss_fn(
        partial(net_fn, params0), k, jax.numpy.asarray(batch))
    error = np.asarray(error)
    sigma = np.asarray(sigma).reshape(-1)

    per_item = error.reshape(error.shape[0], -1).mean(axis=1)
    bins = trainer.sigma_bins
    idx = np.clip(np.searchsorted(bins, sigma), 0, len(bins) - 1)
    bin_sum = np.zeros(len(bins)); bin_sumsq = np.zeros(len(bins))
    bin_count = np.zeros(len(bins))
    for i, b in enumerate(idx):
        bin_sum[b] += per_item[i]
        bin_sumsq[b] += per_item[i] ** 2
        bin_count[b] += 1

    np.testing.assert_allclose(acc["loss"], error.mean(), rtol=1e-5)
    np.testing.assert_array_equal(acc["bin_count"], bin_count)
    np.testing.assert_allclose(acc["bin_sum"], bin_sum, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(acc["bin_sumsq"], bin_sumsq, rtol=1e-4, atol=1e-9)

    # and the stats pipeline (training_stats parity) reports the same means
    from buddy_tpu.training import stats
    stats._counters.clear()
    trainer.easy_logging()
    c = trainer.stats_collector
    assert abs(c.mean("loss") - float(error.mean())) < 1e-5


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
