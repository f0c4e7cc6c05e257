#!/bin/bash
# Round-4 TPU measurement queue — run ONCE when the relay recovers
# (scripts/relay_watch.sh launches it automatically).
# The chip serializes on one process, so everything is sequential here.
# Ordered by deliverable value: bench A/Bs first (VERDICT r4 ask #1),
# then scale/multi-scene rows, then the long quality runs.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q

echo "=== 1. headline bench k=4 (BENCH semantics since r3) ==="
timeout 2400 python bench.py 2>&1 | tail -2 | tee /tmp/r4q/bench_k4.txt

echo "=== 1b. bench k=1 (BENCH_r01/r02 per-step-dispatch semantics) ==="
DSS_BENCH_SCAN=1 timeout 1800 python bench.py 2>&1 | tail -1 | tee /tmp/r4q/bench_k1.txt

echo "=== 1c. bench k=8 (dispatch amortization A/B) ==="
DSS_BENCH_SCAN=8 timeout 1800 python bench.py 2>&1 | tail -1 | tee /tmp/r4q/bench_k8.txt

echo "=== 2. multi-scene batched training (BASELINE config 5: 4x25k, 8 views) ==="
timeout 2400 python -m dss_tpu.apps.train_multiscene --scenes 4 --points 25000 \
  --views 8 --iters 60 --json-out /tmp/r4q/multiscene.json 2>&1 | tail -5

echo "=== 3. kernel + 100k scale bench ==="
timeout 3600 python scripts/bench_scale.py 2>&1 | tail -12 | tee /tmp/r4q/scale.txt

echo "=== 3b. 100k pair-cap sweep ==="
timeout 3600 python scripts/sweep_pair_caps.py 2>&1 | grep -E "^fwd" | tee /tmp/r4q/paircaps.txt

echo "=== 4. E18: depth-L1 supervision smoke (fragment path, 600 iters) ==="
timeout 3600 python train_mvr.py --config configs/exp_e18_depth.yml \
  --max-iters 600 2>&1 | tail -4 | tee /tmp/r4q/e18_smoke.txt

echo "=== 5. E19: coverage-reseed settle (Hausdorff gt->pred tail) ==="
# the reseeded checkpoint is precomputed on CPU (apps/reseed_coverage);
# regenerate here only if missing
if [ ! -f exp/dss_e19_reseed/model.npz ]; then
  mkdir -p exp/dss_e19_reseed
  timeout 3600 python -m dss_tpu.apps.reseed_coverage \
    --ckpt exp/dss_e15c_refine/model_jet_pruned.npz --data /tmp/yoga6_data \
    --out exp/dss_e19_reseed/model.npz --platform cpu 2>&1 | tail -4
fi
timeout 5400 python train_mvr.py --config configs/exp_e19_reseed.yml \
  --max-iters 15500 2>&1 | tail -3 | tee /tmp/r4q/e19_train.txt
timeout 1200 python -m dss_tpu.apps.refine_normals \
  --ckpt exp/dss_e19_reseed/model_best.npz --data /tmp/yoga6_data --platform cpu \
  2>&1 | tail -3 | tee /tmp/r4q/e19_jet.txt
timeout 1200 python -m dss_tpu.apps.prune_floaters \
  --ckpt exp/dss_e19_reseed/model_best_jet.npz --data /tmp/yoga6_data \
  --platform cpu 2>&1 | tail -4 | tee /tmp/r4q/e19_prune.txt

echo "=== 6. E17: extend the shading normals-refine, then jet-refine ==="
timeout 7200 python train_mvr.py --config configs/exp_e15c_refine.yml \
  --max-iters 16000 2>&1 | tail -3 | tee /tmp/r4q/e17_train.txt
timeout 1200 python -m dss_tpu.apps.refine_normals \
  --ckpt exp/dss_e15c_refine/model.npz --data /tmp/yoga6_data --platform cpu \
  2>&1 | tail -3 | tee /tmp/r4q/e17.txt

echo "=== 6b. E21: jet-anchored normal refine (trained field < 0.3 target) ==="
mkdir -p exp/dss_e21_jetanchor
cp exp/dss_e15c_refine/model.npz exp/dss_e21_jetanchor/model.npz
timeout 7200 python train_mvr.py --config configs/exp_e21_jetanchor.yml \
  --max-iters 16000 2>&1 | tail -3 | tee /tmp/r4q/e21_train.txt

echo "=== 7. E20: 10k point budget from phase 1 ==="
timeout 7200 python train_mvr.py --config configs/exp_e20_budget10k.yml \
  --max-iters 6000 2>&1 | tail -3 | tee /tmp/r4q/e20_p1.txt
mkdir -p exp/dss_e20_10k_fine
cp exp/dss_e20_10k/model_best.npz exp/dss_e20_10k_fine/model.npz
timeout 10800 python train_mvr.py --config configs/exp_e20_budget10k_fine.yml \
  --max-iters 15000 2>&1 | tail -3 | tee /tmp/r4q/e20_fine.txt

echo "=== queue done ==="
