#!/bin/bash
# Round-3 TPU measurement queue — run when the tunnel is up.  Each step is
# independent; a dead tunnel makes bench.py emit its error JSON and the
# queue moves on.  Results land in /tmp/benchq_<tag>.json|.log.
# Usage: bash scripts/run_tpu_queue.sh [start_index]
set -u
cd "$(dirname "$0")/.."
START=${1:-0}

run() {
  local tag=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] $tag : $* ==="
  env "$@" python bench.py > "/tmp/benchq_${tag}.json" 2> "/tmp/benchq_${tag}.log"
  cat "/tmp/benchq_${tag}.json"
}

i=0
step() {  # step <tag> [ENV=V ...]
  local tag=$1; shift
  if [ "$i" -ge "$START" ]; then run "$tag" "$@"; else echo "skip $tag"; fi
  i=$((i+1))
}

# 0: the driver's exact end-of-round command — validates the serving default
#    (bf16 + fused up-convs, full guidance) under the CURRENT tree and warms
#    .jax_cache so the driver's bench skips the cold compile
step default
# 1: best overall (int8 static scales + fused up-convs + identity guidance);
#    reconfirms the 7.159 measurement under the current tree
step int8s_id BENCH_INT8=1 BENCH_INT8_STATIC=1 BENCH_GUIDANCE=identity
# 2: identity path at B=16 — the fwd-only program has lower arithmetic
#    intensity than full DPS; batch scaling may not be done at B=8 there
step id_b16 BENCH_GUIDANCE=identity BENCH_B=16
# 3: training throughput — the one workload never TPU-measured (reference
#    trains f32 batch 16); bf16 body variant after it
if [ "$i" -ge "$START" ]; then
  python scripts/tpu_train_step.py 16 float32 10 \
    > /tmp/benchq_train_f32.json 2> /tmp/benchq_train_f32.log
  cat /tmp/benchq_train_f32.json
  python scripts/tpu_train_step.py 16 bfloat16 10 \
    > /tmp/benchq_train_bf16.json 2> /tmp/benchq_train_bf16.log
  cat /tmp/benchq_train_bf16.json
fi
echo "=== queue done ==="
