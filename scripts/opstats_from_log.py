"""Parse a tpu_profile_blind.py stdout log (raw gviz framework_op_stats dump)
into the device-op breakdown, without re-running xprof conversion.

Usage: python scripts/opstats_from_log.py /tmp/prof.log [T] [B]
"""
import json
import re
import sys
from collections import defaultdict

path = sys.argv[1]
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1

text = open(path).read()
# tpu_profile_blind.py printed text.split(",") as a Python list; rejoin it.
if "', '" in text:
    text = text.replace("', '", ",")
rows = re.findall(r'\{"c":\[(.*?)\]\}', text)
entries = []
for r in rows:
    vals = re.findall(r'\{"v":(.*?)\}(?:,|$)', r)
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

# xprof emits every row twice in this dump; dedupe exact duplicates.
entries = list({(t, o, ty, n) for (t, o, ty, n) in entries})

total = sum(t for t, _, _, _ in entries)
print(f"total device self-time: {total/1e3:.1f} ms  (T={T}, B={B})")
print(f"per step: {total/1e3/T:.2f} ms\n")

groups = defaultdict(float)
for t, _, typ, _ in entries:
    groups[typ] += t
print("--- by op type ---")
for typ, t in sorted(groups.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {typ}")

print("\n--- top 40 ops ---")
for t, occ, typ, name in sorted(entries, key=lambda e: -e[0])[:40]:
    print(f"{t/1e3:9.2f} ms  x{occ:5.0f}  {typ:24s} {name[-90:]}")
