"""Calibration for round-2 test tolerances (CPU): bf16-vs-f32 divergence by
horizon, and chunked-vs-unchunked with a scale-invariant oracle denoiser."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle
from buddy_tpu.operators.subband import BlindSubbandFiltering

N = 16384
TINY = ["network.nf=8", "network.ch_mult=[1,2]", "network.num_res_blocks=1",
        "network.image_size=256"]

# ---- bf16 divergence vs horizon ----------------------------------------
def run_bf16(compute_dtype, T):
    args = compose("conf_VCTK.yaml", [
        "tester=blind_dereverberation_BUDDy", *TINY,
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
    op = BlindSubbandFiltering(args["tester"]["informed_dereverberation"]["op_hp"],
                               sample_rate=16000)
    op.reset(jax.random.PRNGKey(3))
    return np.asarray(sampler.predict_conditional(
        y, op, shape=(1, N), blind=True, rng=jax.random.PRNGKey(4)))

for T in (2, 10, 50):
    p32 = run_bf16("null", T)
    p16 = run_bf16("bfloat16", T)
    rel = np.linalg.norm(p16 - p32) / np.linalg.norm(p32)
    corr = np.corrcoef(p16.ravel(), p32.ravel())[0, 1]
    print(f"bf16 T={T}: rel={rel:.4f} corr={corr:.4f}", flush=True)

# ---- chunked vs unchunked with scale-invariant oracle denoiser ----------
from buddy_tpu.testing.tester import Tester
from buddy_tpu.data.vctk import VCTKTestPaired

AUDIO = "/root/reference/audio_examples"


def make_oracle(edm):
    def net(z, cnoise):
        t = jnp.exp(4.0 * cnoise)          # invert cnoise = log(t)/4
        t = jnp.reshape(t, (-1,) + (1,) * (z.ndim - 1))
        cin, cskip, cout = edm.cin(t), edm.cskip(t), edm.cout(t)
        x = z / cin
        target = 0.05 * x / (jnp.std(x, axis=-1, keepdims=True) + 1e-12)
        return (target - cskip * x) / cout
    return net


def run_chunked(threshold):
    args = compose("conf_VCTK.yaml", [
        "tester=blind_dereverberation_BUDDy", *TINY,
        "tester.sampling_params.T=3",
        "tester.posterior_sampling.blind_hp.op_updates_per_step=2",
        "tester.sampling_params.Schurn=0",
        "tester.posterior_sampling.warm_initialization.mode=reverb_scaled",
        "model_dir=/tmp/chunkcal",
        "+tester.bucket_pad=8192",
        f"+tester.chunked.threshold={threshold}",
        "+tester.chunked.chunk_size=16384",
        "+tester.chunked.overlap=4096"])
    os.makedirs("/tmp/chunkcal", exist_ok=True)
    diff_params = instantiate(args["diff_params"])
    ds = VCTKTestPaired(fs=16000, segment_length=-1, path=AUDIO,
                        speakers_discard=[], speakers_test=["p226"],
                        num_examples=1, shuffle=False)
    ds.test_audio[0] = ds.test_audio[0][:40000]
    ds.test_rir[0] = ds.test_rir[0][:2000]
    t = Tester(args, make_oracle(diff_params), diff_params, test_set=ds,
               rng=jax.random.PRNGKey(123))
    t.do_test()
    d = t.paths["blind_dereverberationreconstructed"]
    from buddy_tpu.data.audio_io import read_wav
    f = [x for x in os.listdir(d) if x.endswith(".wav")][0]
    rec, _ = read_wav(os.path.join(d, f))
    import shutil
    shutil.rmtree(t.path_sampling)
    return rec

full = run_chunked(163840)
chunked = run_chunked(16384)
rel = np.linalg.norm(chunked - full) / np.linalg.norm(full)
corr = np.corrcoef(chunked.ravel(), full.ravel())[0, 1]
print(f"chunked: rel={rel:.4f} corr={corr:.4f}", flush=True)
