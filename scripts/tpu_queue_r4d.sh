#!/bin/bash
# Round-4 orchestrator: one chip consumer for everything left after the
# part-A rerun.  The container reset wiped /tmp datasets and exp/
# checkpoints, so the datasets regenerate here (on the chip — the 1-core
# CPU fallback takes hours), then the kNN dispatch A/B (the multi-scene
# 4.01 -> 6.94 s/it regression suspect), then the part-B quality queues.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q
M=/root/reference/example_data/pointclouds/yoga6_out.ply

if [ ! -f /tmp/yoga6_data/data_dict.npz ]; then
  echo "=== D1. regen 512^2 dataset on the chip $(date) ==="
  timeout 3600 python -m dss_tpu.apps.create_mvr_data --mesh "$M" \
    --out /tmp/yoga6_data --num-cameras 128 --image-size 512 \
    --tri-color-lights --point-lights 2>&1 | tail -2 | tee /tmp/gen512.log
fi
if [ ! -f /tmp/yoga6_1024x128/data_dict.npz ]; then
  echo "=== D2. regen 1024^2 dataset on the chip $(date) ==="
  timeout 5400 python -m dss_tpu.apps.create_mvr_data --mesh "$M" \
    --out /tmp/yoga6_1024x128 --num-cameras 128 --image-size 1024 \
    --tri-color-lights --point-lights 2>&1 | tail -2 | tee /tmp/gen1024.log
fi

echo "=== D3. kNN dispatch A/B (multi-scene regression isolation) $(date) ==="
timeout 3600 python scripts/bench_knn.py 2>&1 | tail -6 | tee /tmp/r4q/knn_ab.txt

bash scripts/tpu_queue_r4b1.sh
bash scripts/tpu_queue_r4b2.sh
