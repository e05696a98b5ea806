"""Parse an xprof framework_op_stats dump for a captured trace dir and print
the device-op breakdown.  Usage: python scripts/xprof_opstats.py /tmp/blind_trace [T] [B]
"""
import glob
import json
import re
import sys
from collections import defaultdict

trace_dir = sys.argv[1]
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1

xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
from xprof.convert import raw_to_tool_data

data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "framework_op_stats^", {})
text = data.decode() if isinstance(data, bytes) else data

# gviz DataTable literal: rows:[{"c":[{"v":...},...]},...]
rows = re.findall(r'\{"c":\[(.*?)\]\}', text)
entries = []
for r in rows:
    vals = re.findall(r'\{"v":(.*?)\}(?:,|$)', r)
    # vals: rank, host/device, type, operation, occurrences, total_time,
    #       avg_time, total_self_time, ...
    if len(vals) < 8:
        continue
    try:
        dev = json.loads(vals[1])
        typ = json.loads(vals[2])
        name = json.loads(vals[3])
        occ = float(vals[4])
        self_t = float(vals[7])
    except Exception:
        continue
    if dev != "Device":
        continue
    entries.append((self_t, occ, typ, name))

# the gviz dump repeats every row (observed: each (type, name) appears
# exactly twice with identical values) — dedupe or the totals double
seen = set()
deduped = []
for t, occ, typ, name in entries:
    if (typ, name) in seen:
        continue
    seen.add((typ, name))
    deduped.append((t, occ, typ, name))
entries = deduped

total = sum(t for t, _, _, _ in entries)
print(f"total device self-time: {total/1e3:.1f} ms  (T={T}, B={B})")
print(f"per step: {total/1e3/T:.2f} ms;  per utt-step: {total/1e3/T/B:.3f} ms\n")

groups = defaultdict(float)
for t, _, typ, _ in entries:
    groups[typ] += t
print("--- by op type ---")
for typ, t in sorted(groups.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {typ}")

print("\n--- top 35 ops ---")
entries.sort(reverse=True)
for t, occ, typ, name in entries[:35]:
    print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  x{occ:6.0f}  {typ:18s} {name[:95]}")
