#!/bin/bash
# r3 VMEM-budget lab: can a raised Mosaic scoped-VMEM budget (new
# kernels/_params.py knob) buy back the larger tiles that OOM'd at the
# 16 MB default in r2?  Sequential TPU A/Bs — ONE client at a time.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* [VMEM=${TEXPOSE_VMEM_LIMIT_MB:-def} SUBF=${TEXPOSE_ST_SUBTILES_FWD:-def} SUBB=${TEXPOSE_ST_SUBTILES_BWD:-def} ] ==="
  "$@" 2>&1 | grep -v "Platform 'axon'"
}

export BENCH_KERNELS_SECTIONS=0

echo "--- 1. baseline: split+xext defaults (512/512, sub 4/2) ---"
run python tools/bench_kernels.py 512 512

echo "--- 2. VMEM=64, same tiles (knob sanity) ---"
TEXPOSE_VMEM_LIMIT_MB=64 run python tools/bench_kernels.py 512 512

echo "--- 3. VMEM=64, fwd 4096-row stream (512 x sub 8) ---"
TEXPOSE_VMEM_LIMIT_MB=64 TEXPOSE_ST_SUBTILES_FWD=8 \
  run python tools/bench_kernels.py 512 512

echo "--- 4. VMEM=64, fwd 4096-row stream (1024 x sub 4) ---"
TEXPOSE_VMEM_LIMIT_MB=64 run python tools/bench_kernels.py 1024 512

echo "--- 5. VMEM=64, bwd 2048 stream (512 x sub 4) ---"
TEXPOSE_VMEM_LIMIT_MB=64 TEXPOSE_ST_SUBTILES_BWD=4 \
  run python tools/bench_kernels.py 512 512

echo "--- 6. VMEM=64, bwd 2048 stream (1024 x sub 2) ---"
TEXPOSE_VMEM_LIMIT_MB=64 run python tools/bench_kernels.py 512 1024

echo "--- 8. VMEM=100, fwd 8192-row stream (1024 x sub 8) ---"
TEXPOSE_VMEM_LIMIT_MB=100 TEXPOSE_ST_SUBTILES_FWD=8 \
  run python tools/bench_kernels.py 1024 512

echo "DONE"
