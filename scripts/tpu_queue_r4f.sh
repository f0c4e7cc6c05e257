#!/bin/bash
# Round-4 queue, part F: everything left after the r4d queue died with its
# host session mid-B2.5.  Chip-serial; each job bounded by timeout.
#   1. kNN dispatch A/B (import fixed in 564fe29 — the r4d capture is a
#      traceback) -> resolves the multi-scene 4.01 -> 6.94 s/it regression.
#   2. Multi-scene with the grid dispatch forced OFF (DSS_KNN_GRID_THRESHOLD
#      knob) — direct confirmation of the regression cause at the workload.
#   3. E23 depth-supervised fine phase (E18 best + floor 0.5).
#   4. E21 jet-anchored normal refine re-run (the first run exited after 16
#      iters on the --epochs 1000 cap; train_mvr now widens epochs to cover
#      --max-iters).
#   5. E19 coverage reseed + settle + jet + prune + report.
#   6. E20 fine phase (10k budget) + report.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q
# parts G/H gate on this pid (ADVICE r4: it was never written, so their
# wait loops exited immediately — two concurrent chip consumers)
echo $$ > /tmp/r4f.pid

echo "=== F1. kNN dispatch A/B (brute MXU vs grid) $(date) ==="
timeout 2400 python scripts/bench_knn.py 2>&1 | tail -8 | tee /tmp/r4q/knn_ab.txt

echo "=== F2. multi-scene 4x25k with grid dispatch OFF $(date) ==="
DSS_KNN_GRID_THRESHOLD=1000000000 timeout 3600 \
  python -m dss_tpu.apps.train_multiscene --scenes 4 --points 25000 \
  --views 8 --iters 60 --json-out /tmp/r4q/multiscene_brute.json 2>&1 | tail -4

echo "=== F3. E23 depth-supervised fine (->15000) $(date) ==="
mkdir -p exp/dss_e23_depth_fine
cp exp/dss_e18_depth/model_best.npz exp/dss_e23_depth_fine/model.npz
timeout 5400 python train_mvr.py --config configs/exp_e23_depth_fine.yml \
  --max-iters 15000 2>&1 | tail -3 | tee /tmp/r4q/e23.txt

echo "=== F4. E21 jet-anchored normal refine re-run (->21000) $(date) ==="
rm -rf exp/dss_e21_jetanchor
mkdir -p exp/dss_e21_jetanchor
cp exp/dss_refine2/model.npz exp/dss_e21_jetanchor/model.npz
timeout 7200 python train_mvr.py --config configs/exp_e21_jetanchor.yml \
  --max-iters 21000 2>&1 | tail -3 | tee /tmp/r4q/e21.txt
# report the TRAINED field as-is (no jet post-process) — VERDICT r3 #4 asks
# for the pre-post-process chamfer_normal
mkdir -p /tmp/r4q/e21_report
timeout 2400 python scripts/make_result_report.py \
  --ckpt exp/dss_e21_jetanchor/model_best.npz --data /tmp/yoga6_data \
  --platform cpu --out /tmp/r4q/e21_report --recipe \
  "refine2 + E21 jet-anchored refine (trained field, no post-process)" \
  2>&1 | tail -3
cp /tmp/r4q/e21_report/yoga6_metrics.json /tmp/r4q/e21_metrics.json 2>/dev/null

echo "=== F5. E19 coverage reseed + settle $(date) ==="
mkdir -p exp/dss_e19_reseed
timeout 3600 python -m dss_tpu.apps.reseed_coverage \
  --ckpt exp/dss_refine2/model_jet_pruned.npz --data /tmp/yoga6_data \
  --out exp/dss_e19_reseed/model.npz --platform cpu 2>&1 | tail -4 | tee /tmp/r4q/e19_reseed.txt
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
cp /tmp/r4q/e19_report/yoga6_metrics.json /tmp/r4q/e19_metrics.json 2>/dev/null

echo "=== F6. E20 fine (10k budget, floor 0.5, ->15000) $(date) ==="
mkdir -p exp/dss_e20_10k_fine
cp exp/dss_e20_10k/model_best.npz exp/dss_e20_10k_fine/model.npz
timeout 10800 python train_mvr.py --config configs/exp_e20_budget10k_fine.yml \
  --max-iters 15000 2>&1 | tail -3 | tee /tmp/r4q/e20_fine.txt
mkdir -p /tmp/r4q/e20_report
timeout 2400 python scripts/make_result_report.py \
  --ckpt exp/dss_e20_10k_fine/model_best.npz --data /tmp/yoga6_data \
  --platform cpu --out /tmp/r4q/e20_report 2>&1 | tail -3
cp /tmp/r4q/e20_report/yoga6_metrics.json /tmp/r4q/e20_metrics.json 2>/dev/null

echo "=== part F done $(date) ==="
