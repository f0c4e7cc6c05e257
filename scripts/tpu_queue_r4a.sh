#!/bin/bash
# Round-4 queue, part A: everything that needs NO dataset and NO prior
# checkpoint (the machine was recycled; /tmp and exp/ were wiped).
# Sequential — the chip serializes on one process.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q

echo "=== 1. headline bench k=4 (BENCH semantics since r3) ==="
timeout 2400 python bench.py 2>&1 | tail -2 | tee /tmp/r4q/bench_k4.txt

echo "=== 1b. bench k=1 (BENCH_r01/r02 per-step-dispatch semantics) ==="
DSS_BENCH_SCAN=1 timeout 1800 python bench.py 2>&1 | tail -1 | tee /tmp/r4q/bench_k1.txt

echo "=== 1c. bench k=8 (dispatch amortization A/B) ==="
DSS_BENCH_SCAN=8 timeout 1800 python bench.py 2>&1 | tail -1 | tee /tmp/r4q/bench_k8.txt

echo "=== 2. multi-scene batched training (BASELINE config 5: 4x25k, 8 views) ==="
timeout 3600 python -m dss_tpu.apps.train_multiscene --scenes 4 --points 25000 \
  --views 8 --iters 60 --json-out /tmp/r4q/multiscene.json 2>&1 | tail -5

echo "=== 3. kernel + 100k scale bench ==="
timeout 3600 python scripts/bench_scale.py 2>&1 | tail -12 | tee /tmp/r4q/scale.txt

echo "=== 3b. 100k pair-cap sweep ==="
timeout 3600 python scripts/sweep_pair_caps.py 2>&1 | grep -E "^fwd" | tee /tmp/r4q/paircaps.txt

echo "=== part A done $(date) ==="
