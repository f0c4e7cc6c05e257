#!/bin/bash
# Round-4 queue, part B1: everything that needs ONLY the 512² dataset
# (the 1024² set regenerates on CPU in parallel).  Sequential — one chip.
#   phases 1-3 of the flagship recipe, then E18 (depth supervision) and
#   E20 phase 1 (10k budget) from scratch.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q

echo "=== B1.1 flagship phase 1 (dss.yml, 6000) $(date) ==="
timeout 3600 python train_mvr.py --config configs/dss.yml --max-iters 6000 \
  2>&1 | tail -3 | tee /tmp/r4q/p1.txt
mkdir -p exp/dss_fine
cp exp/dss_proj/model_best.npz exp/dss_fine/model.npz

echo "=== B1.2 flagship phase 2 (dss_fine.yml, ->9000) $(date) ==="
timeout 3600 python train_mvr.py --config configs/dss_fine.yml --max-iters 9000 \
  2>&1 | tail -3 | tee /tmp/r4q/p2.txt
mkdir -p exp/dss_refine
cp exp/dss_fine/model_best.npz exp/dss_refine/model.npz

echo "=== B1.3 flagship phase 3 (dss_refine.yml, ->11000) $(date) ==="
timeout 3600 python train_mvr.py --config configs/dss_refine.yml --max-iters 11000 \
  2>&1 | tail -3 | tee /tmp/r4q/p3.txt

echo "=== B1.4 E18 depth-L1 supervision (6000, lean depth channel) $(date) ==="
timeout 5400 python train_mvr.py --config configs/exp_e18_depth.yml \
  --max-iters 6000 2>&1 | tail -4 | tee /tmp/r4q/e18.txt

echo "=== B1.5 E20 10k budget phase 1 (6000) $(date) ==="
timeout 5400 python train_mvr.py --config configs/exp_e20_budget10k.yml \
  --max-iters 6000 2>&1 | tail -3 | tee /tmp/r4q/e20_p1.txt

echo "=== part B1 done $(date) ==="
