#!/bin/bash
# Three-phase flagship recipe (BENCHMARKS.md E5-E11), end to end:
#   1. configs/dss.yml      — coarse convergence (repulsion 0.1, floor 1.0)
#   2. configs/dss_fine.yml — pixel-scale silhouette refinement (floor 0.5)
#   3. configs/dss_refine.yml — freeze points, refine normals
# Yields chamfer 0.0033 / chamfer_normal 0.39 / PSNR 17.4 on the yoga6 demo
# (~20 min on one v5e chip).  Usage: bash scripts/train_flagship.sh [data_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
DATA="${1:-/tmp/yoga6_data}"

if [ ! -d "$DATA" ]; then
  echo "dataset $DATA missing — generate it first:" >&2
  echo "  python -m dss_tpu.apps.create_mvr_data --mesh <mesh.ply> --out $DATA \\" >&2
  echo "      --num-cameras 128 --image-size 512 --tri-color-lights --point-lights" >&2
  exit 1
fi

python train_mvr.py --config configs/dss.yml --max-iters 6000
mkdir -p exp/dss_fine
cp exp/dss_proj/model_best.npz exp/dss_fine/model.npz
python train_mvr.py --config configs/dss_fine.yml --max-iters 9000
mkdir -p exp/dss_refine
cp exp/dss_fine/model_best.npz exp/dss_refine/model.npz
python train_mvr.py --config configs/dss_refine.yml --max-iters 11000
echo "final model: exp/dss_refine/model.npz (+ shape_pts.ply)"
