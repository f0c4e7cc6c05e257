#!/bin/bash
# Flagship recipe (BENCHMARKS.md E5-E16), end to end:
#   1. configs/dss.yml        — coarse convergence (repulsion 0.1, floor 1.0)
#   2. configs/dss_fine.yml   — pixel-scale silhouette refinement (floor 0.5)
#   3. configs/dss_refine.yml — freeze points, refine normals under shading
#   4. configs/dss_hires.yml  — 1024² silhouette-dominant geometry push
#   5. configs/dss_refine2.yml — re-refine normals on the moved geometry
#   6. apps/refine_normals    — geometry-driven jet + bilateral normal fit
# Yields chamfer 0.00273 / chamfer_normal 0.244 on the yoga6 demo
# (~35 min on one v5e chip).  Usage: bash scripts/train_flagship.sh \
#   [data_dir_512] [data_dir_1024]
set -euo pipefail
cd "$(dirname "$0")/.."
DATA="${1:-/tmp/yoga6_data}"
DATA_HIRES="${2:-/tmp/yoga6_1024x128}"

if [ ! -d "$DATA" ]; then
  echo "dataset $DATA missing — generate it first:" >&2
  echo "  python -m dss_tpu.apps.create_mvr_data --mesh <mesh.ply> --out $DATA \\" >&2
  echo "      --num-cameras 128 --image-size 512 --tri-color-lights --point-lights" >&2
  exit 1
fi
if [ ! -d "$DATA_HIRES" ]; then
  echo "hi-res dataset $DATA_HIRES missing — generate it first:" >&2
  echo "  python -m dss_tpu.apps.create_mvr_data --mesh <mesh.ply> --out $DATA_HIRES \\" >&2
  echo "      --num-cameras 128 --image-size 1024 --tri-color-lights --point-lights" >&2
  exit 1
fi

python train_mvr.py --config configs/dss.yml --max-iters 6000
mkdir -p exp/dss_fine
cp exp/dss_proj/model_best.npz exp/dss_fine/model.npz
python train_mvr.py --config configs/dss_fine.yml --max-iters 9000
mkdir -p exp/dss_refine
cp exp/dss_fine/model_best.npz exp/dss_refine/model.npz
python train_mvr.py --config configs/dss_refine.yml --max-iters 11000
mkdir -p exp/dss_hires
cp exp/dss_refine/model.npz exp/dss_hires/model.npz
python train_mvr.py --config configs/dss_hires.yml --max-iters 15500
mkdir -p exp/dss_refine2
cp exp/dss_hires/model_best.npz exp/dss_refine2/model.npz
python train_mvr.py --config configs/dss_refine2.yml --max-iters 18000
python -m dss_tpu.apps.refine_normals --ckpt exp/dss_refine2/model.npz --data "$DATA"
python -m dss_tpu.apps.prune_floaters --ckpt exp/dss_refine2/model_jet.npz --data "$DATA"
echo "final model: exp/dss_refine2/model_jet_pruned.npz (+ model_jet_pruned.ply)"
