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

# 0: baseline bf16 (warm cache — validates 3.371 under current tree)
step bf16
# 1: int8 with the rewritten quant chain (dynamic scales, int32 accum)
step int8 BENCH_INT8=1
# 2: int8 with dequant inside the conv op (bf16 accum)
step int8_bf16accum BENCH_INT8=1 BENCH_INT8_ACCUM=bfloat16
# 3: int8 + int8 dL/dx adjoint convs
step int8_bwd BENCH_INT8=1 BENCH_INT8_ACCUM=bfloat16 BENCH_INT8_BWD=1
# 4: bf16 + fused up-resample convs
step fuseup BENCH_FUSE_UP=1
# 5: larger serving batch
step bf16_b16 BENCH_B=16
# 6: identity-Jacobian guidance (skips the U-Net backward; ~2x FLOP cut)
step idguide BENCH_GUIDANCE=identity
# 7: identity guidance + int8 forward convs
step idguide_int8 BENCH_GUIDANCE=identity BENCH_INT8=1 BENCH_INT8_ACCUM=bfloat16
echo "=== queue done ==="
