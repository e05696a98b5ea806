"""Production-path blind dereverb on TPU (small T) through the real API."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle
from buddy_tpu.diffusion.edm import EDM
from buddy_tpu.operators.reverb import RIROperator
from buddy_tpu.operators.subband import BlindSubbandFiltering
from buddy_tpu.data.audio_io import read_wav

T = int(sys.argv[1]) if len(sys.argv) > 1 else 2
AUDIO_LEN = 65536

args = compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy",
                                  f"tester.sampling_params.T={T}"])
module = instantiate(args["network"])
edm = EDM(sde_hp=dict(args["diff_params"]["sde_hp"]))
network = NetworkBundle(module)
network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, AUDIO_LEN)), jnp.zeros((1,)))
print("network ready", flush=True)

sampler = instantiate(args["tester"]["sampler"], network, edm, args)

clean, _ = read_wav("/root/reference/audio_examples/clean/p226/p226_003.wav")
rir, _ = read_wav("/root/reference/audio_examples/rir/p226/p226_003.wav")
rir = rir[int(np.argmax(np.abs(rir))):]
rir = rir / np.abs(rir).max()
seg = np.zeros(AUDIO_LEN, np.float32)
n = min(len(clean), AUDIO_LEN)
seg[:n] = clean[:n]
seg = 0.05 * seg / seg.std(ddof=1)

op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
ref_op = RIROperator(op_hp, time_kernel_size=len(rir), sample_rate=16000)
ref_op.update_params(jnp.asarray(rir))
y = ref_op.degradation(jnp.asarray(seg)[None, :])

blind_op = BlindSubbandFiltering(op_hp, sample_rate=16000)
blind_op.reset(jax.random.PRNGKey(3))
print("operator ready; running predict_conditional...", flush=True)

t0 = time.time()
pred = sampler.predict_conditional(y, blind_op, shape=(1, AUDIO_LEN),
                                   blind=True, rng=jax.random.PRNGKey(4))
pred = np.asarray(pred)
print(f"first run (compile) {time.time()-t0:.0f}s, finite={np.isfinite(pred).all()}",
      flush=True)

t0 = time.time()
pred = np.asarray(sampler.predict_conditional(
    y, blind_op, shape=(1, AUDIO_LEN), blind=True, rng=jax.random.PRNGKey(5)))
wall = time.time() - t0
print(f"steady run {wall:.2f}s  per-step {wall/T*1e3:.0f}ms  "
      f"RTF {AUDIO_LEN/16000/wall:.2f}x", flush=True)
