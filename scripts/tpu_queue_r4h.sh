#!/bin/bash
# Round-4 queue, part H (after part F):
#   H1. kNN A/B with the new approx_min_k arm (the multi-scene profile
#       showed 87% of the 4.0 s step is sort-lowered top_k).
#   H2. multi-scene with DSS_KNN_APPROX=1 — the BASELINE config-5 number
#       if the approx path delivers.
#   H3. E23 post-process: jet fit + floater prune + report — E23 hit best
#       chamfer 0.001384 (old best 0.002308), this makes it the flagship
#       candidate.
#   H4. E24: depth-supervised 1024² phase from the E23 best, then jet +
#       prune + report.
#   H5. approx-kNN quality A/B: rerun the E23 fine phase with
#       DSS_KNN_APPROX=1 — same init/config/iters, chamfer delta = the
#       quality cost of recall<1 neighbor sets.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q
echo $$ > /tmp/r4h.pid

# serialize behind part G (not F): G itself waits on F, and the relay
# tolerates only one chip consumer.  Fail loudly if the awaited pid file
# is missing instead of sailing through (ADVICE r4).
if [ ! -f /tmp/r4g.pid ]; then
  echo "expected /tmp/r4g.pid (part G running) — refusing to start" >&2
  exit 1
fi
while kill -0 "$(cat /tmp/r4g.pid)" 2>/dev/null; do sleep 60; done

echo "=== H1. kNN A/B incl. approx_min_k $(date) ==="
timeout 2400 python scripts/bench_knn.py --sizes 5000 25000 50000 100000 \
  2>&1 | tail -6 | tee /tmp/r4q/knn_ab2.txt

echo "=== H2. multi-scene 4x25k with approx kNN $(date) ==="
DSS_KNN_APPROX=1 timeout 3600 \
  python -m dss_tpu.apps.train_multiscene --scenes 4 --points 25000 \
  --views 8 --iters 60 --json-out /tmp/r4q/multiscene_approx.json 2>&1 | tail -4

echo "=== H3. E23 jet fit + floater prune + report $(date) ==="
timeout 1800 python -m dss_tpu.apps.refine_normals \
  --ckpt exp/dss_e23_depth_fine/model_best.npz --data /tmp/yoga6_data \
  --platform cpu 2>&1 | tail -3
timeout 1800 python -m dss_tpu.apps.prune_floaters \
  --ckpt exp/dss_e23_depth_fine/model_best_jet.npz --data /tmp/yoga6_data \
  --platform cpu 2>&1 | tail -4
mkdir -p /tmp/r4q/e23_report
timeout 2400 python scripts/make_result_report.py \
  --ckpt exp/dss_e23_depth_fine/model_best_jet_pruned.npz \
  --data /tmp/yoga6_data --platform cpu --out /tmp/r4q/e23_report --recipe \
  "dss+depth -> fine+depth -> jet -> prune (E18/E23 chain)" \
  2>&1 | tail -3
cp /tmp/r4q/e23_report/yoga6_metrics.json /tmp/r4q/e23_metrics.json 2>/dev/null

echo "=== H4. E24 depth-supervised 1024^2 (->18000) $(date) ==="
mkdir -p exp/dss_e24_depth_hires
cp exp/dss_e23_depth_fine/model_best.npz exp/dss_e24_depth_hires/model.npz
timeout 10800 python train_mvr.py --config configs/exp_e24_depth_hires.yml \
  --max-iters 18000 2>&1 | tail -3 | tee /tmp/r4q/e24.txt
timeout 1800 python -m dss_tpu.apps.refine_normals \
  --ckpt exp/dss_e24_depth_hires/model_best.npz --data /tmp/yoga6_data \
  --platform cpu 2>&1 | tail -3
timeout 1800 python -m dss_tpu.apps.prune_floaters \
  --ckpt exp/dss_e24_depth_hires/model_best_jet.npz --data /tmp/yoga6_data \
  --platform cpu 2>&1 | tail -4
mkdir -p /tmp/r4q/e24_report
timeout 2400 python scripts/make_result_report.py \
  --ckpt exp/dss_e24_depth_hires/model_best_jet_pruned.npz \
  --data /tmp/yoga6_data --platform cpu --out /tmp/r4q/e24_report --recipe \
  "dss+depth -> fine+depth -> hires+depth -> jet -> prune (E24 chain)" \
  2>&1 | tail -3
cp /tmp/r4q/e24_report/yoga6_metrics.json /tmp/r4q/e24_metrics.json 2>/dev/null

echo "=== H5. E23 rerun with approx kNN (quality A/B, ->15000) $(date) ==="
mkdir -p exp/dss_e23_approx
cp exp/dss_e18_depth/model_best.npz exp/dss_e23_approx/model.npz
cp configs/exp_e23_depth_fine.yml /tmp/e23_approx.yml
sed -i 's/^name: dss_e23_depth_fine/name: dss_e23_approx/' /tmp/e23_approx.yml
DSS_KNN_APPROX=1 timeout 5400 python train_mvr.py --config /tmp/e23_approx.yml \
  --max-iters 15000 2>&1 | tail -3 | tee /tmp/r4q/e23_approx.txt

echo "=== part H done $(date) ==="
