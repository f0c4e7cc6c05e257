#!/bin/bash
# Round-4 queue, part B: quality runs.  The machine was recycled between
# rounds (exp/ and /tmp wiped), so every quality experiment re-derives its
# inputs here: first the base six-phase flagship (re-establishes the r3
# checkpoints + metrics artifact), then the round-4 levers from VERDICT:
#   E20 10k point budget (ask #3), E21 jet-anchored normal refine (ask #4),
#   E18 depth-L1 on the lean depth channel (ask #7), E19 coverage reseed
#   (asks #2/#3).
# Needs /tmp/yoga6_data (512²) and /tmp/yoga6_1024x128 (1024²).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q

echo "=== B1. base flagship (six-phase recipe) $(date) ==="
timeout 14400 bash scripts/train_flagship.sh /tmp/yoga6_data /tmp/yoga6_1024x128 \
  2>&1 | tail -6 | tee /tmp/r4q/flagship.txt
timeout 1200 python -m dss_tpu.apps.evaluate_pcl \
  --pred exp/dss_refine2/model_jet_pruned.npz \
  --gt /tmp/yoga6_data/pointcloud.npz \
  --json-out /tmp/r4q/flagship_metrics.json 2>&1 | tail -3

echo "=== B2. E21 jet-anchored normal refine (trained field < 0.3) $(date) ==="
mkdir -p exp/dss_e21_jetanchor
cp exp/dss_refine2/model.npz exp/dss_e21_jetanchor/model.npz
timeout 7200 python train_mvr.py --config configs/exp_e21_jetanchor.yml \
  --max-iters 20000 2>&1 | tail -3 | tee /tmp/r4q/e21_train.txt

echo "=== B3. E18 depth-L1 supervision (lean depth channel, 6000 iters) $(date) ==="
timeout 7200 python train_mvr.py --config configs/exp_e18_depth.yml \
  --max-iters 6000 2>&1 | tail -4 | tee /tmp/r4q/e18.txt

echo "=== B4. E20 10k point budget, phases 1+2 $(date) ==="
timeout 7200 python train_mvr.py --config configs/exp_e20_budget10k.yml \
  --max-iters 6000 2>&1 | tail -3 | tee /tmp/r4q/e20_p1.txt
mkdir -p exp/dss_e20_10k_fine
cp exp/dss_e20_10k/model_best.npz exp/dss_e20_10k_fine/model.npz
timeout 10800 python train_mvr.py --config configs/exp_e20_budget10k_fine.yml \
  --max-iters 15000 2>&1 | tail -3 | tee /tmp/r4q/e20_fine.txt

echo "=== B5. E19 coverage-reseed settle $(date) ==="
mkdir -p exp/dss_e19_reseed
timeout 3600 python -m dss_tpu.apps.reseed_coverage \
  --ckpt exp/dss_refine2/model_jet_pruned.npz --data /tmp/yoga6_data \
  --out exp/dss_e19_reseed/model.npz --platform cpu 2>&1 | tail -4
timeout 5400 python train_mvr.py --config configs/exp_e19_reseed.yml \
  --max-iters 15500 2>&1 | tail -3 | tee /tmp/r4q/e19_train.txt
timeout 1200 python -m dss_tpu.apps.refine_normals \
  --ckpt exp/dss_e19_reseed/model_best.npz --data /tmp/yoga6_data --platform cpu \
  2>&1 | tail -3 | tee /tmp/r4q/e19_jet.txt
timeout 1200 python -m dss_tpu.apps.prune_floaters \
  --ckpt exp/dss_e19_reseed/model_best_jet.npz --data /tmp/yoga6_data \
  --platform cpu 2>&1 | tail -4 | tee /tmp/r4q/e19_prune.txt

echo "=== part B done $(date) ==="
