"""bfloat16 mixed-precision gate for the benchmarked serving path.

bench.py runs the U-Net body in bfloat16 (network.compute_dtype) — these
tests pin that configuration against full f32: a denoiser-forward tolerance
and a full 50-step blind-DPS run tolerance (VERDICT round-1 item 1a).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N = 16384

TINY = [
    "network.nf=8",
    "network.ch_mult=[1,2]",
    "network.num_res_blocks=1",
    "network.image_size=256",
]


def _bundle(compute_dtype):
    from buddy_tpu.config import compose, instantiate
    from buddy_tpu.models import NetworkBundle
    args = compose("conf_VCTK.yaml",
                   TINY + [f"network.compute_dtype={compute_dtype}"])
    net = NetworkBundle(instantiate(args["network"]))
    # identical init regardless of compute dtype (params stay f32)
    net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, N)), jnp.zeros((1,)))
    return net, args


def test_bf16_params_identical_and_forward_close():
    """compute_dtype only casts activations: the param pytree is identical
    to f32 init, and a denoiser forward matches f32 within bf16 tolerance."""
    from buddy_tpu.config import instantiate

    net32, args32 = _bundle("null")
    net16, _ = _bundle("bfloat16")
    for a, b in zip(jax.tree.leaves(net32.params), jax.tree.leaves(net16.params)):
        assert a.dtype == b.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    edm = instantiate(args32["diff_params"])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, N)) * 0.05
    sigma = jnp.asarray([0.1], jnp.float32)

    def fwd(net):
        return np.asarray(edm.denoiser(x, net, sigma))

    y32 = fwd(net32)
    y16 = fwd(net16)
    assert y16.dtype == np.float32  # output is cast back before the head
    rel = np.linalg.norm(y16 - y32) / (np.linalg.norm(y32) + 1e-12)
    assert rel < 0.05, f"bf16 denoiser diverges from f32: rel={rel:.4f}"


def _run_blind(T, compute_dtype):
    from buddy_tpu.config import compose, instantiate
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.operators.subband import BlindSubbandFiltering

    args = compose("conf_VCTK.yaml", [
        "tester=blind_dereverberation_BUDDy",
        *TINY,
        f"network.compute_dtype={compute_dtype}",
        f"tester.sampling_params.T={T}",
        "tester.posterior_sampling.warm_initialization.wpe.taps=10",
    ])
    net = NetworkBundle(instantiate(args["network"]))
    net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, N)), jnp.zeros((1,)))
    diff_params = instantiate(args["diff_params"])
    sampler = instantiate(args["tester"]["sampler"], net, diff_params, args)

    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.standard_normal((1, N)).astype(np.float32) * 0.05)
    op = BlindSubbandFiltering(
        args["tester"]["informed_dereverberation"]["op_hp"],
        sample_rate=16000)
    op.reset(jax.random.PRNGKey(3))
    pred = sampler.predict_conditional(y, op, shape=(1, N), blind=True,
                                       rng=jax.random.PRNGKey(4))
    return np.asarray(pred)


@pytest.mark.slow
def test_bf16_blind_dps_50_steps_close_to_f32():
    """Full 50-step blind dereverberation in bf16 stays within tolerance of
    the f32 run (same rng, same operator init) — the gate for bench.py's
    bfloat16 default."""
    p32 = _run_blind(50, "null")
    p16 = _run_blind(50, "bfloat16")
    assert np.isfinite(p16).all()
    rel = np.linalg.norm(p16 - p32) / (np.linalg.norm(p32) + 1e-12)
    corr = np.corrcoef(p16.ravel(), p32.ravel())[0, 1]
    # The guided trajectory is chaotic: per-step bf16 rounding (~1e-3)
    # compounds through 50 steps of operator-Adam + grad-norm-normalized
    # guidance (calibrated divergence on this config: rel 0.000 at T=2,
    # 0.024 at T=10, 0.34 at T=50 with corr 0.94 — exponential growth of a
    # tiny per-step error, not a quality defect; f32-vs-f64 behaves the
    # same way).  Gate at the calibrated values with headroom: the
    # reconstructions must stay the *same signal* (corr), and a crossfade/
    # dtype bug would blow both gates by an order of magnitude.
    assert rel < 0.6, f"bf16 blind DPS diverges from f32: rel={rel:.4f}"
    assert corr > 0.85, f"bf16/f32 outputs decorrelated: corr={corr:.4f}"


def test_bf16_blind_dps_10_steps_tight():
    """Short-horizon (pre-chaos) gate: at T=10 the bf16 trajectory must
    track f32 closely (calibrated rel 0.024) — this is the bound that
    actually certifies per-step bf16 numerics."""
    p32 = _run_blind(10, "null")
    p16 = _run_blind(10, "bfloat16")
    rel = np.linalg.norm(p16 - p32) / (np.linalg.norm(p32) + 1e-12)
    assert rel < 0.08, f"bf16 per-step error too large: rel={rel:.4f}"
