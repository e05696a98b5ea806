"""Capture a TPU trace of the full batched blind-DPS program and print the
device op breakdown (grouped + top ops).  Usage:

    python scripts/tpu_profile_blind.py [T] [B] [dtype]
"""
import glob
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle
from buddy_tpu.operators.subband import BlindSubbandFiltering
from buddy_tpu.utils.device import enable_compilation_cache

enable_compilation_cache()

T = int(sys.argv[1]) if len(sys.argv) > 1 else 5
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DTYPE = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
AUDIO_LEN = 65536

args = compose("conf_VCTK.yaml", [
    "tester=blind_dereverberation_BUDDy",
    f"tester.sampling_params.T={T}",
    f"network.compute_dtype={DTYPE}",
    f"network.quantize_int8={os.environ.get('BENCH_INT8', '0') == '1' and 'true' or 'false'}",
    f"network.quantize_accum={os.environ.get('BENCH_INT8_ACCUM', 'int32')}",
    "network.quantize_bwd="
    f"{str(os.environ.get('BENCH_INT8_BWD', '0') == '1').lower()}",
    "network.fuse_resample="
    f"{str(os.environ.get('BENCH_FUSE_UP', '1') == '1').lower()}",  # match bench.py
    "tester.posterior_sampling.guidance_jacobian="
    f"{os.environ.get('BENCH_GUIDANCE', 'full')}",
])
network = NetworkBundle(instantiate(args["network"]))
network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, AUDIO_LEN)), jnp.zeros((1,)))
edm = instantiate(args["diff_params"])
sampler = instantiate(args["tester"]["sampler"], network, edm, args)
print("net ready", flush=True)

rng = np.random.default_rng(7)
ys = jnp.asarray(rng.standard_normal((B, 1, AUDIO_LEN)).astype(np.float32) * 0.05)
op = BlindSubbandFiltering(args["tester"]["informed_dereverberation"]["op_hp"],
                           sample_rate=16000)
op_params_b, H_b = op.reset_batched(jax.random.PRNGKey(3), B)
print("operator ready", flush=True)


def run(key):
    return sampler.predict_conditional_batched(
        ys, op, blind=True, rng=key,
        op_params_batch=op_params_b, H_batch=H_b)


out = run(jax.random.PRNGKey(0))
jax.block_until_ready(out)
print("compiled", flush=True)

trace_dir = "/tmp/blind_trace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
out = run(jax.random.PRNGKey(1))
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace captured", flush=True)

xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)

from xprof.convert import raw_to_tool_data

data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "framework_op_stats^", {})
import io, csv
rows = list(csv.reader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
hdr = rows[0]
cols = {h: i for i, h in enumerate(hdr)}
time_col = None
for cand in ("Total self-time (us)", "Self time (us)", "Avg. self-time (us)",
             "Total self time in us", "total_self_time_in_us"):
    if cand in cols:
        time_col = cols[cand]
        break
if time_col is None:
    print("columns:", hdr, flush=True)
    sys.exit(1)

i_name = cols.get("Operation", 1)
i_type = cols.get("Type", 0)
entries = []
for r in rows[1:]:
    try:
        entries.append((float(r[time_col]), r[i_name], r[i_type]))
    except Exception:
        pass

total = sum(t for t, _, _ in entries)
print(f"\ntotal device time: {total/1e3:.1f} ms for T={T} steps, B={B}, {DTYPE}")
print(f"per step: {total/1e3/T:.1f} ms;  per utt-step: {total/1e3/T/B:.2f} ms\n")

# group by op type
from collections import defaultdict
groups = defaultdict(float)
for t, name, typ in entries:
    groups[typ] += t
print("--- by op type ---")
for typ, t in sorted(groups.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {typ}")

print("\n--- top 30 ops ---")
entries.sort(reverse=True)
for t, name, typ in entries[:30]:
    print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {typ:22s} {name[:90]}")
