#!/bin/bash
# r3 pretrain lab: coarse-kernel posenc mode + scoped-VMEM A/Bs on the
# full pretrain train step (scan-fused blocking timing).  Sequential TPU
# runs — ONE client at a time.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== [POSENC=${TEXPOSE_COARSE_POSENC:-def} VMEM=${TEXPOSE_VMEM_LIMIT_MB:-def} SUBF=${TEXPOSE_COARSE_SUBTILES_FWD:-def} SUBB=${TEXPOSE_COARSE_SUBTILES_BWD:-def}] ==="
  python tools/bench_pretrain_step.py 2>&1 | grep -v "Platform 'axon'" | tail -2
}

echo "--- 1. baseline (sinext, sub 2/1) ---"
run

echo "--- 2. xext ---"
TEXPOSE_COARSE_POSENC=xext run

echo "--- 3. xext + VMEM=64 + fwd subtiles 4 ---"
TEXPOSE_COARSE_POSENC=xext TEXPOSE_VMEM_LIMIT_MB=64 \
  TEXPOSE_COARSE_SUBTILES_FWD=4 run

echo "DONE"
