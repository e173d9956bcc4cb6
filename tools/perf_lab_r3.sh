#!/bin/bash
# r3 kernel lab: sequential TPU A/Bs (ONE client at a time; no kills).
# Usage: bash tools/perf_lab_r3.sh [stage]
set -u
cd "$(dirname "$0")/.."

stage="${1:-ab}"

run() {
  echo "=== $* ==="
  "$@" 2>&1 | grep -v "Platform 'axon'"
}

if [ "$stage" = "probe" ]; then
  run python tools/mxu_probe.py shapes
  run python tools/mxu_probe.py xla
  run python tools/mxu_probe.py int8
fi

if [ "$stage" = "ab" ]; then
  echo "--- r2 baseline (pack off, posenc in-kernel) ---"
  TEXPOSE_ST_PACK_HEADS=0 TEXPOSE_ST_POSENC_OUTSIDE=0 \
    TEXPOSE_TRUNK_POSENC_OUTSIDE=0 BENCH_KERNELS_SECTIONS=0 \
    run python tools/bench_kernels.py 512 512
  echo "--- posenc outside ---"
  TEXPOSE_ST_PACK_HEADS=0 TEXPOSE_ST_POSENC_OUTSIDE=1 \
    BENCH_KERNELS_SECTIONS=1 run python tools/bench_kernels.py 512 512
  echo "--- posenc outside + packed heads ---"
  TEXPOSE_ST_PACK_HEADS=1 TEXPOSE_ST_POSENC_OUTSIDE=1 \
    BENCH_KERNELS_SECTIONS=0 run python tools/bench_kernels.py 512 512
  echo "--- + bwd subtiles 4 ---"
  TEXPOSE_ST_PACK_HEADS=1 TEXPOSE_ST_POSENC_OUTSIDE=1 \
    TEXPOSE_ST_SUBTILES_BWD=4 BENCH_KERNELS_SECTIONS=0 \
    run python tools/bench_kernels.py 512 512
fi
