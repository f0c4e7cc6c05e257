#!/bin/bash
# Round-4 queue, part B2: runs after part B1 (flagship phases 1-3 + E18 +
# E20p1) and the 1024² dataset regen.  Sequence:
#   0. multi-scene A/B with the grid-kNN build_knn dispatch (no data needed)
#   1. flagship phases 4-6 (1024² hires -> refine2 -> jet fit + prune) + eval
#   2. E21 jet-anchored normal refine (trained field < 0.3 target)
#   3. E19 coverage reseed + settle + jet + prune + eval (Hausdorff <= 0.1)
#   4. E20 fine phase (10k budget, floor 0.5) + eval (chamfer <= 0.0015)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q

# wait for part B1 (chip is serial) and the 1024² dataset
while kill -0 "$(cat /tmp/r4qb1.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
echo "=== B2.0 multi-scene grid-kNN A/B (4x25k, 8 views) $(date) ==="
timeout 3600 python -m dss_tpu.apps.train_multiscene --scenes 4 --points 25000 \
  --views 8 --iters 60 --json-out /tmp/r4q/multiscene_gridknn.json 2>&1 | tail -4

while ! grep -q "^wrote" /tmp/gen1024.log 2>/dev/null; do sleep 60; done

echo "=== B2.1 flagship phase 4 (dss_hires.yml 1024², ->15500) $(date) ==="
mkdir -p exp/dss_hires
cp exp/dss_refine/model.npz exp/dss_hires/model.npz
timeout 10800 python train_mvr.py --config configs/dss_hires.yml \
  --max-iters 15500 2>&1 | tail -3 | tee /tmp/r4q/p4.txt

echo "=== B2.2 flagship phase 5 (dss_refine2.yml, ->18000) $(date) ==="
mkdir -p exp/dss_refine2
cp exp/dss_hires/model_best.npz exp/dss_refine2/model.npz
timeout 7200 python train_mvr.py --config configs/dss_refine2.yml \
  --max-iters 18000 2>&1 | tail -3 | tee /tmp/r4q/p5.txt

echo "=== B2.3 flagship jet fit + floater prune + eval $(date) ==="
timeout 1800 python -m dss_tpu.apps.refine_normals \
  --ckpt exp/dss_refine2/model.npz --data /tmp/yoga6_data --platform cpu \
  2>&1 | tail -3
timeout 1800 python -m dss_tpu.apps.prune_floaters \
  --ckpt exp/dss_refine2/model_jet.npz --data /tmp/yoga6_data --platform cpu \
  2>&1 | tail -4
timeout 2400 python scripts/make_result_report.py \
  --ckpt exp/dss_refine2/model_jet_pruned.npz --data /tmp/yoga6_data \
  --platform cpu --out docs --recipe \
  "dss -> fine -> refine -> hires -> refine2 -> jet -> prune (r4 rerun)" \
  2>&1 | tail -3
cp docs/yoga6_metrics.json /tmp/r4q/flagship_metrics.json

echo "=== B2.4 E21 jet-anchored normal refine (->20000) $(date) ==="
mkdir -p exp/dss_e21_jetanchor
cp exp/dss_refine2/model.npz exp/dss_e21_jetanchor/model.npz
# the rebuilt refine2 chain ends at it=18000; 21000 => 3000 refine iters
timeout 7200 python train_mvr.py --config configs/exp_e21_jetanchor.yml \
  --max-iters 21000 2>&1 | tail -3 | tee /tmp/r4q/e21.txt

echo "=== B2.5 E19 coverage reseed + settle $(date) ==="
mkdir -p exp/dss_e19_reseed
timeout 3600 python -m dss_tpu.apps.reseed_coverage \
  --ckpt exp/dss_refine2/model_jet_pruned.npz --data /tmp/yoga6_data \
  --out exp/dss_e19_reseed/model.npz --platform cpu 2>&1 | tail -4
# reseed keeps the source checkpoint's it scalar (18000 after refine2);
# 21000 => 3000 settle iters — 15500 would have exited before training
timeout 7200 python train_mvr.py --config configs/exp_e19_reseed.yml \
  --max-iters 21000 2>&1 | tail -3 | tee /tmp/r4q/e19_train.txt
timeout 1800 python -m dss_tpu.apps.refine_normals \
  --ckpt exp/dss_e19_reseed/model_best.npz --data /tmp/yoga6_data \
  --platform cpu 2>&1 | tail -3
timeout 1800 python -m dss_tpu.apps.prune_floaters \
  --ckpt exp/dss_e19_reseed/model_best_jet.npz --data /tmp/yoga6_data \
  --platform cpu 2>&1 | tail -4
mkdir -p /tmp/r4q/e19_report
timeout 2400 python scripts/make_result_report.py \
  --ckpt exp/dss_e19_reseed/model_best_jet_pruned.npz --data /tmp/yoga6_data \
  --platform cpu --out /tmp/r4q/e19_report 2>&1 | tail -3
cp /tmp/r4q/e19_report/yoga6_metrics.json /tmp/r4q/e19_metrics.json

echo "=== B2.6 E20 fine (10k budget, floor 0.5, ->21000) $(date) ==="
mkdir -p exp/dss_e20_10k_fine
cp exp/dss_e20_10k/model_best.npz exp/dss_e20_10k_fine/model.npz
timeout 10800 python train_mvr.py --config configs/exp_e20_budget10k_fine.yml \
  --max-iters 15000 2>&1 | tail -3 | tee /tmp/r4q/e20_fine.txt
mkdir -p /tmp/r4q/e20_report
timeout 2400 python scripts/make_result_report.py \
  --ckpt exp/dss_e20_10k_fine/model_best.npz --data /tmp/yoga6_data \
  --platform cpu --out /tmp/r4q/e20_report 2>&1 | tail -3
cp /tmp/r4q/e20_report/yoga6_metrics.json /tmp/r4q/e20_metrics.json

echo "=== part B2 done $(date) ==="
