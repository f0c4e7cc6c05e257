#!/bin/bash
# Round-5 queue, part B: the Kangaroo second-scene flagship (VERDICT r4 #7),
# serialized behind part A (tpu_queue_r5.sh).  The dataset is generated on
# the TPU (the 512^2x128 mesh-raster shape is compile-cached from the yoga6
# generations; CPU measured ~40 s/view).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5q
echo $$ > /tmp/r5q/queue_b.pid

if [ ! -f /tmp/r5q/queue.pid ]; then
  echo "expected /tmp/r5q/queue.pid (part A running) — refusing to start" >&2
  exit 1
fi
while kill -0 "$(cat /tmp/r5q/queue.pid)" 2>/dev/null; do sleep 30; done

echo "=== B0. kangaroo dataset gen (TPU) $(date) ==="
rm -rf /tmp/kangaroo_data
timeout 3600 python -m dss_tpu.apps.create_mvr_data \
  --mesh /root/reference/example_data/pointclouds/Kangaroo_V10k.ply \
  --out /tmp/kangaroo_data --num-cameras 128 --image-size 512 \
  --tri-color-lights --point-lights 2>&1 | tail -2
N_IMG=$(ls /tmp/kangaroo_data/image 2>/dev/null | wc -l)
if [ "$N_IMG" -lt 128 ]; then
  echo "kangaroo dataset incomplete ($N_IMG/128 views) — aborting" >&2
  exit 1
fi

echo "=== B1. Kangaroo flagship (depth recipe, unmodified) $(date) ==="
python train_mvr.py --config configs/dss_depth.yml --max-iters 6000 \
  --data-dir /tmp/kangaroo_data --name kangaroo_depth 2>&1 | tail -3 \
  | tee /tmp/r5q/kangaroo_p1.txt
mkdir -p exp/kangaroo_depth_fine
cp exp/kangaroo_depth/model_best.npz exp/kangaroo_depth_fine/model.npz
python train_mvr.py --config configs/dss_depth_fine.yml --max-iters 14000 \
  --data-dir /tmp/kangaroo_data --name kangaroo_depth_fine 2>&1 | tail -3 \
  | tee /tmp/r5q/kangaroo_p2.txt

echo "=== B2. post-process + report (CPU) $(date) ==="
timeout 1800 python -m dss_tpu.apps.prune_floaters \
  --ckpt exp/kangaroo_depth_fine/model_best.npz --data /tmp/kangaroo_data \
  --depth-tol 0.03 --depth-min-views 3 --platform cpu 2>&1 | tail -4
timeout 1800 python -m dss_tpu.apps.refine_normals \
  --ckpt exp/kangaroo_depth_fine/model_best_pruned.npz \
  --data /tmp/kangaroo_data --jet-passes 3 --platform cpu 2>&1 | tail -3
mkdir -p /tmp/r5q/kangaroo_report
timeout 2400 python scripts/make_result_report.py \
  --ckpt exp/kangaroo_depth_fine/model_best_pruned_jet.npz \
  --data /tmp/kangaroo_data --platform cpu --out /tmp/r5q/kangaroo_report \
  --recipe "dss+depth -> fine+depth -> depth-prune -> jet (Kangaroo_V10k)" \
  2>&1 | tail -3

echo "=== r5 part B done $(date) ==="
