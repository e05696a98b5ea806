"""Capture a TPU trace of the U-Net forward and print the op breakdown."""
import glob
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle
from buddy_tpu.diffusion.edm import EDM

AUDIO_LEN = 65536
args = compose("conf_VCTK.yaml")
module = instantiate(args["network"])
edm = EDM(sde_hp=dict(args["diff_params"]["sde_hp"]))
network = NetworkBundle(module)
network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, AUDIO_LEN)), jnp.zeros((1,)))
print("net ready", flush=True)


@jax.jit
def fwd(params, xx):
    net = lambda z, cn: module.apply(params, z, cn)
    return edm.denoiser(xx[:, None, :], net, jnp.float32(0.3))[:, 0, :]


x = jax.random.normal(jax.random.PRNGKey(1), (1, AUDIO_LEN)) * 0.05
fwd(network.params, x).block_until_ready()
print("compiled", flush=True)

trace_dir = "/tmp/unet_trace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for _ in range(5):
    out = fwd(network.params, x)
out.block_until_ready()
jax.profiler.stop_trace()
print("trace captured", flush=True)

xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xplanes, flush=True)

from tensorboard_plugin_profile.convert import raw_to_tool_data

data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "framework_op_stats^", {})
import io, csv
# data is CSV text for op stats
rows = list(csv.reader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
hdr = rows[0]
print(hdr[:12], flush=True)
try:
    i_name = hdr.index("Operation")
except ValueError:
    i_name = 1
cols = {h: i for i, h in enumerate(hdr)}
time_col = None
for cand in ("Total self-time (us)", "Self time (us)", "Avg. self-time (us)",
             "Total self time in us", "total_self_time_in_us"):
    if cand in cols:
        time_col = cols[cand]
        break
if time_col is None:
    print("columns:", hdr, flush=True)
else:
    entries = []
    for r in rows[1:]:
        try:
            entries.append((float(r[time_col]), r[i_name][:80], r[cols.get('Type', 0)]))
        except Exception:
            pass
    entries.sort(reverse=True)
    for t, name, typ in entries[:25]:
        print(f"{t/5:10.1f} us/call  {typ:20s} {name}", flush=True)
