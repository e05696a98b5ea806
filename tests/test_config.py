"""Config system tests: Hydra-compatible composition and overrides."""

from buddy_tpu.config import compose, instantiate, ConfigDict


def test_compose_defaults():
    cfg = compose("conf_VCTK.yaml")
    assert cfg.network._target_.endswith("NCSNppTime")
    assert cfg.diff_params.sde_hp.sigma_data == 0.05
    assert cfg.tester.sampling_params.T == 201
    assert cfg.exp.batch_size == 16
    assert cfg.model_dir == "experiments"


def test_group_swap_and_overrides():
    """The reference shell-wrapper grammar (test_blind_dereverberation.sh)."""
    cfg = compose("conf_VCTK.yaml", [
        "tester=blind_dereverberation_BUDDy",
        "tester.sampling_params.T=201",
        "dset=vctk_16k_4s_test-benchmark",
        "dset.test.path=audio_examples",
        "dset.test.num_examples=2",
        "+gpu=0",
    ])
    assert cfg.tester.name == "blind_dereverberation_buddy"
    assert cfg.tester.sampling_params.Schurn == 50
    assert cfg.tester.posterior_sampling.blind_hp.op_updates_per_step == 10
    assert cfg.dset.test.segment_length == -1
    assert cfg.dset.test.path == "audio_examples"
    assert cfg.dset.test.num_examples == 2
    assert cfg.gpu == 0


def test_instantiate():
    cfg = compose("conf_VCTK.yaml")
    edm = instantiate(cfg.diff_params)
    assert edm.sigma_data == 0.05 and edm.rho == 10.0


def test_configdict_semantics():
    """OmegaConf-node API surface used by the reference code."""
    d = ConfigDict({"a": {"b": 1}, "c": [1, {"d": 2}]})
    assert d.a.b == 1
    assert d.c[1].d == 2
    assert "a" in d.keys()
    assert d.get("missing", 7) == 7
    d.a.e = {"f": 3}
    assert d.a.e.f == 3
    assert {**d.a} == {"b": 1, "e": {"f": 3}}
    round_trip = d.to_dict()
    assert round_trip["c"][1]["d"] == 2


def test_init_distributed_noop_without_coordinator(monkeypatch):
    """Single-host runs (no COORDINATOR_ADDRESS) skip jax.distributed."""
    import os
    from buddy_tpu.parallel.mesh import init_distributed
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False
