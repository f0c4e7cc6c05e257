#!/bin/bash
# Round-5 serial TPU queue (ONE chip consumer — CLAUDE.md: a second client
# can wedge the relay):
#   R1. kNN A/B with the FIXED approx arm (bee52ad added the permutation
#       de-correlation; the r4 capture predates it and read agree≈0).
#   R2. multi-scene 4x25k with DSS_KNN_APPROX=1 — the BASELINE config-5
#       row at its real speed if approx delivers (profile: 3.5 s of the
#       4.0 s step is sort-lowered top_k).
#   R3. Second-scene flagship (VERDICT r4 #7): the depth-supervised recipe
#       UNMODIFIED on Kangaroo_V10k — waits for the CPU dataset gen.
#   R4. bench.py capture on the final tree.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5q
echo $$ > /tmp/r5q/queue.pid

echo "=== R1. kNN A/B, post-permutation-fix approx arm $(date) ==="
timeout 2400 python scripts/bench_knn.py --sizes 5000 25000 50000 100000 \
  2>&1 | tail -6 | tee /tmp/r5q/knn_ab3.txt

echo "=== R2. multi-scene 4x25k with approx kNN $(date) ==="
DSS_KNN_APPROX=1 timeout 3600 \
  python -m dss_tpu.apps.train_multiscene --scenes 4 --points 25000 \
  --views 8 --iters 60 --json-out /tmp/r5q/multiscene_approx.json \
  2>&1 | tail -4 | tee /tmp/r5q/multiscene_approx.txt

echo "=== R3. Kangaroo flagship (depth recipe, unmodified) $(date) ==="
# wait for the CPU dataset generator; fail loudly if it died (ADVICE r4:
# never proceed silently past a missing/dead awaited pid)
GEN_PID=$(cat /tmp/gen_kangaroo.pid 2>/dev/null || echo "")
if [ -n "$GEN_PID" ]; then
  while kill -0 "$GEN_PID" 2>/dev/null; do sleep 20; done
fi
N_IMG=$(ls /tmp/kangaroo_data/image 2>/dev/null | wc -l)
if [ "$N_IMG" -lt 128 ]; then
  echo "kangaroo dataset incomplete ($N_IMG/128 views) — aborting R3" >&2
else
  python train_mvr.py --config configs/dss_depth.yml --max-iters 6000 \
    --data-dir /tmp/kangaroo_data --name kangaroo_depth 2>&1 | tail -3 \
    | tee /tmp/r5q/kangaroo_p1.txt
  mkdir -p exp/kangaroo_depth_fine
  cp exp/kangaroo_depth/model_best.npz exp/kangaroo_depth_fine/model.npz
  python train_mvr.py --config configs/dss_depth_fine.yml --max-iters 14000 \
    --data-dir /tmp/kangaroo_data --name kangaroo_depth_fine 2>&1 | tail -3 \
    | tee /tmp/r5q/kangaroo_p2.txt
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
fi

echo "=== R4. bench.py final capture $(date) ==="
timeout 3600 python bench.py 2>&1 | tail -2 | tee /tmp/r5q/bench_final.txt

echo "=== r5 queue done $(date) ==="
