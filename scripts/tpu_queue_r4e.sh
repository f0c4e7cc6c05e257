#!/bin/bash
# Round-4 queue, part E (post-r4d chip time): the kNN dispatch A/B that
# died on an import error inside r4d, then E23 — the depth-supervised
# fine phase composing the round's two strongest quality levers.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q

echo "=== E. kNN dispatch A/B (brute MXU vs grid, 20k-100k) $(date) ==="
timeout 2400 python scripts/bench_knn.py 2>&1 | tail -6 | tee /tmp/r4q/knn_ab.txt

echo "=== E23: depth-supervised fine phase (->15000) $(date) ==="
mkdir -p exp/dss_e23_depth_fine
cp exp/dss_e18_depth/model_best.npz exp/dss_e23_depth_fine/model.npz
timeout 5400 python train_mvr.py --config configs/exp_e23_depth_fine.yml \
  --max-iters 15000 2>&1 | tail -3 | tee /tmp/r4q/e23.txt

echo "=== part E done $(date) ==="
