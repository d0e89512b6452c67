#!/bin/bash
# Block-row sweep on the real TPU (run serially — never two TPU processes).
# Each bench.py invocation recompiles everything; budget ~10 min per run.
# Usage: bash scripts/sweep_rows.sh 2>&1 | tee /tmp/sweep_rows.log
set -u
cd "$(dirname "$0")/.."

run() {
  local mode="$1"; shift
  echo "=== mode=$mode $* $(date +%H:%M:%S)"
  timeout 2400 env "$@" python bench.py --steps 10 --occ_axis 0 \
    --mode "$mode" 2>/dev/null | tail -1
}

# render axis: re-measure _PASS_ROWS after the transposed rgb/lane-dense IO
run render MOCO_PASS_ROWS=3072   # baseline, current default
run render MOCO_PASS_ROWS=4096
run render MOCO_PASS_ROWS=6144

# train axis: NeRF backward row budget (1024 current; chain stays 768)
run train MOCO_BWD_ROWS=1024     # baseline
run train MOCO_BWD_ROWS=1536
run train MOCO_CHAIN_BWD_ROWS=896
