"""Objective-metric module tests (buddy_tpu/evaluation.py) + the tester's
metrics.jsonl output path (tester.evaluate.use)."""

import json
import os
import sys

import numpy as np

import jax

sys.path.insert(0, "/root/repo")

from buddy_tpu import evaluation


def test_si_sdr_basics(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    # identical signal: very high SI-SDR; scaled signal: identical (scale-inv)
    assert evaluation.si_sdr(x, x) > 60
    assert evaluation.si_sdr(x, 3.7 * x) > 60  # scale-invariant
    # known SNR: target + noise at 10 dB
    noise = rng.standard_normal(16000).astype(np.float32)
    noise *= np.linalg.norm(x) / np.linalg.norm(noise) / (10 ** 0.5)
    est = evaluation.si_sdr(x, x + noise)
    assert 9.0 < est < 11.0, est


def test_lsd_zero_for_identical(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    assert evaluation.log_spectral_distance(x, x) < 1e-6
    y = rng.standard_normal(16000).astype(np.float32)
    assert evaluation.log_spectral_distance(x, y) > 1.0


def test_rir_edc_error(rng):
    t = np.arange(4000, dtype=np.float32)
    rir = np.exp(-t / 500) * rng.standard_normal(4000).astype(np.float32)
    rir[0] = 1.0
    assert evaluation.rir_edc_error(rir, rir) < 1e-6
    # wrong decay rate -> large EDC error
    rir2 = np.exp(-t / 100) * rng.standard_normal(4000).astype(np.float32)
    rir2[0] = 1.0
    assert evaluation.rir_edc_error(rir, rir2) > 3.0


def test_evaluate_utterance_keys(rng):
    clean = rng.standard_normal(8000).astype(np.float32)
    deg = clean + 0.1 * rng.standard_normal(8000).astype(np.float32)
    m = evaluation.evaluate_utterance(clean, deg, degraded=deg,
                                      true_rir=np.ones(100), est_rir=np.ones(100))
    assert set(m) == {"si_sdr", "lsd", "si_sdr_degraded", "lsd_degraded",
                      "rir_edc_rmse_db"}
    # estimate == degraded here, so the improvement deltas are ~0
    assert abs(m["si_sdr"] - m["si_sdr_degraded"]) < 1e-6


def test_tester_writes_metrics(tmp_path, rng):
    """Informed-DPS run with tester.evaluate.use=True writes metrics.jsonl
    with one row per utterance."""
    import jax.numpy as jnp
    from buddy_tpu.config import compose, instantiate
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.testing.tester import Tester
    from buddy_tpu.data.vctk import VCTKTestPaired

    N = 16384
    args = compose("conf_VCTK.yaml", [
        "tester=informed_dereverberation_DPS",
        "network.nf=8", "network.ch_mult=[1,2]", "network.num_res_blocks=1",
        "tester.sampling_params.T=2",
        "tester.evaluate.use=True",
        f"model_dir={tmp_path}",
        "+tester.bucket_pad=16384",
    ])
    net = NetworkBundle(instantiate(args["network"]))
    net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, N)), jnp.zeros((1,)))
    ds = VCTKTestPaired(fs=16000, segment_length=-1,
                        path="/root/reference/audio_examples",
                        speakers_discard=[], speakers_test=["p226"],
                        num_examples=1, shuffle=False)
    ds.test_audio[0] = ds.test_audio[0][:N]
    ds.test_rir[0] = ds.test_rir[0][:2000]
    t = Tester(args, net, instantiate(args["diff_params"]), test_set=ds)
    t.do_test()

    mode = "informed_dereverberation"
    metrics_path = os.path.join(
        os.path.dirname(t.paths[mode + "reconstructed"]), "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_path)]
    assert len(rows) == 1
    assert {"si_sdr", "lsd", "si_sdr_degraded", "lsd_degraded",
            "file"} <= set(rows[0])
    assert np.isfinite(rows[0]["si_sdr"])
