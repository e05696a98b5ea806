"""Init-params disk cache (cold-start, VERDICT r2 item 6): a warm
NetworkBundle.init must load the identical pytree from .param_cache
instead of re-compiling the init program, and the key must distinguish
seed / shape / module config."""

import jax
import jax.numpy as jnp
import numpy as np

from buddy_tpu.models import NetworkBundle
from buddy_tpu.models.ncsnpp import NCSNpp


SMALL = dict(nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(0,),
             image_size=64, input_channels=2, spatial_channels=1)


def _init(tmp, seed=0, **over):
    m = NCSNpp(**{**SMALL, **over})
    net = NetworkBundle(m)
    net.init(jax.random.PRNGKey(seed), jnp.zeros((1, 1, 64, 48), jnp.complex64),
             jnp.zeros((1,), jnp.float32), cache_dir=str(tmp))
    return jax.tree.map(np.asarray, net.params)


def test_cache_roundtrip_identical(tmp_path):
    cold = _init(tmp_path)
    assert len(list(tmp_path.glob("init-*.npz"))) == 1
    warm = _init(tmp_path)
    assert jax.tree_util.tree_structure(cold) == jax.tree_util.tree_structure(warm)
    for a, b in zip(jax.tree.leaves(cold), jax.tree.leaves(warm)):
        np.testing.assert_array_equal(a, b)


def test_cache_keys_on_seed_and_config(tmp_path):
    a = _init(tmp_path, seed=0)
    b = _init(tmp_path, seed=1)
    assert any(not np.array_equal(x, y)
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))
    _init(tmp_path, nf=16)
    assert len(list(tmp_path.glob("init-*.npz"))) == 3


def test_cache_key_ignores_apply_only_fields(tmp_path):
    """compute_dtype / quantize_int8 / fuse_resample change apply(), never the
    init variable tree — one cache entry must serve all of them (the entry is
    111 MB for the production net and a cold init costs 11-49 min)."""
    _init(tmp_path)
    _init(tmp_path, compute_dtype="bfloat16")
    _init(tmp_path, quantize_int8=True)
    _init(tmp_path, fuse_resample=True)
    assert len(list(tmp_path.glob("init-*.npz"))) == 1
    # static quantization adds a "quant" collection at init: separate key
    _init(tmp_path, quantize_int8=True, quantize_static=True)
    assert len(list(tmp_path.glob("init-*.npz"))) == 2


def test_static_quant_synthesizes_from_nonstatic_cache(tmp_path):
    """quantize_static only adds a 'quant' collection of zero scalars: when
    the non-static entry is cached, init must synthesize those zeros from an
    eval_shape trace instead of a full cold init, and persist the result
    under the static key so later cold processes skip the synthesis too."""
    base = _init(tmp_path, quantize_int8=True)
    files0 = set(tmp_path.glob("init-*.npz"))
    m = NCSNpp(**SMALL, quantize_int8=True, quantize_static=True)
    net = NetworkBundle(m)
    sta = net.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 1, 64, 48), jnp.complex64),
                   jnp.zeros((1,), jnp.float32), cache_dir=str(tmp_path))
    files1 = set(tmp_path.glob("init-*.npz"))
    assert len(files1 - files0) == 1  # synthesized entry saved (static key)
    assert "quant" in sta
    # a fresh init now loads the static entry directly (no new writes) and
    # reproduces the same tree bit-exactly
    net2 = NetworkBundle(NCSNpp(**SMALL, quantize_int8=True,
                                quantize_static=True))
    sta2 = net2.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 1, 64, 48), jnp.complex64),
                     jnp.zeros((1,), jnp.float32), cache_dir=str(tmp_path))
    assert set(tmp_path.glob("init-*.npz")) == files1
    for a, b in zip(jax.tree.leaves(sta), jax.tree.leaves(sta2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all((np.asarray(v) == 0.0).all()
               for v in jax.tree.leaves(sta["quant"]))
    for a, b in zip(jax.tree.leaves(base["params"]),
                    jax.tree.leaves(sta["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cache_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("BUDDY_PARAM_CACHE", "0")
    _init(tmp_path)
    assert not list(tmp_path.glob("init-*.npz"))


def test_packed_transfer_roundtrip():
    """_packed_transfer (single-device one-buffer load) reproduces the tree
    bit-exactly; mixed-dtype trees decline (caller falls back)."""
    from buddy_tpu.models import NetworkBundle

    rng = np.random.default_rng(0)
    tree = {"a": {"kernel": rng.standard_normal((3, 3, 4, 8)).astype(np.float32),
                  "bias": rng.standard_normal(8).astype(np.float32)},
            "b": {"scale": rng.standard_normal((16,)).astype(np.float32)}}
    packed = NetworkBundle._packed_transfer(tree)
    assert packed is not None
    assert (jax.tree_util.tree_structure(packed)
            == jax.tree_util.tree_structure(tree))
    for a, b in zip(jax.tree.leaves(packed), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), b)
        assert a.dtype == np.float32

    mixed = dict(tree, c=np.zeros((), np.int32))
    assert NetworkBundle._packed_transfer(mixed) is None
