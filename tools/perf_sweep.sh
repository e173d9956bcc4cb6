#!/bin/bash
# Sequential TPU perf A/B sweep (one TPU process at a time).
# Usage: bash tools/perf_sweep.sh > /tmp/perf_sweep.log 2>&1
set -u
cd "$(dirname "$0")/.."

run() {
    echo "=== $* ==="
    env "$@" python bench.py 2>/dev/null | tail -1
}

run BENCH_EVAL=0                                         # baseline
run BENCH_EVAL=0 BENCH_SCAN_STEPS=100                    # deeper dispatch fusion
run BENCH_EVAL=0 TEXPOSE_ST_SUBTILES_FWD=2               # fwd 2 tiles/grid-step
run BENCH_EVAL=0 TEXPOSE_ST_SUBTILES_FWD=2 TEXPOSE_ST_SUBTILES_BWD=2
run BENCH_EVAL=0 BENCH_SCAN_STEPS=100 TEXPOSE_ST_SUBTILES_FWD=2 TEXPOSE_ST_SUBTILES_BWD=2
echo "=== sweep done ==="
