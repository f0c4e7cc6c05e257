#!/bin/bash
# Round-3 TPU measurement queue — run ONCE when the relay recovers.
# The chip serializes on one process, so everything is sequential here.
# Usage: bash scripts/tpu_queue_r3.sh
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3q

echo "=== 1. headline bench (matmul-scatter default) ==="
timeout 1800 python bench.py 2>&1 | tail -2 | tee /tmp/r3q/bench.txt

echo "=== 1b. bench at k=8 scan window (dispatch amortization A/B) ==="
DSS_BENCH_SCAN=8 timeout 1800 python bench.py 2>&1 | tail -1 | tee /tmp/r3q/bench_k8.txt

echo "=== 2. multi-scene batched training (BASELINE config 5) ==="
timeout 2400 python -m dss_tpu.apps.train_multiscene --scenes 4 --points 25000 \
  --views 8 --iters 60 --json-out /tmp/r3q/multiscene.json 2>&1 | tail -5

echo "=== 3. kernel + 100k scale bench ==="
timeout 3600 python scripts/bench_scale.py 2>&1 | tail -12 | tee /tmp/r3q/scale.txt

echo "=== 3b. 100k pair-cap sweep ==="
timeout 3600 python scripts/sweep_pair_caps.py 2>&1 | grep -E "^fwd" | tee /tmp/r3q/paircaps.txt

echo "=== 4. E17: extend the shading normals-refine, then jet-refine ==="
timeout 5400 python train_mvr.py --config configs/exp_e15c_refine.yml \
  --max-iters 16000 2>&1 | tail -3
timeout 1200 python -m dss_tpu.apps.refine_normals \
  --ckpt exp/dss_e15c_refine/model.npz --data /tmp/yoga6_data --platform cpu \
  2>&1 | tail -3 | tee /tmp/r3q/e17.txt

echo "=== queue done ==="
