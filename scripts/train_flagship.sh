#!/bin/bash
# Flagship recipe (depth-supervised chain, BENCHMARKS.md round 5), end to end:
#   1. configs/dss_depth.yml      — coarse convergence + dense-depth L1
#   2. configs/dss_depth_fine.yml — pixel-scale silhouette refinement (floor 0.5)
#   3. apps/prune_floaters --depth-tol — interior-floater removal (depth
#      consistency; the silhouette hull is blind to interior points)
#   4. apps/refine_normals        — geometry-driven jet normal fit on the
#      pruned cloud (floaters otherwise pollute jet neighborhoods)
# Yields chamfer 0.00061 / hausdorff 0.068 / chamfer_normal 0.196 /
# PSNR 21.9 on the yoga6 demo (~25 min on one v5e chip).  The depth-free
# recipe this replaces (dss -> fine -> refine -> hires -> refine2 -> jet)
# reached 0.00231/0.121/0.229/20.4; its configs remain in configs/.
#
# RUN_HIRES=1 inserts a 1024² depth phase (configs/dss_depth_hires.yml)
# before the post-process: chamfer edges down to 0.00060 but hausdorff/
# normal/IoU all measure slightly worse (BENCHMARKS.md round 5) — kept as
# an option, not the default.
# Usage: bash scripts/train_flagship.sh [data_dir_512] [data_dir_1024]
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
if [ ! -d "$DATA/depth" ]; then
  echo "dataset $DATA has no dense depth maps — regenerate with create_mvr_data" >&2
  exit 1
fi

python train_mvr.py --config configs/dss_depth.yml --max-iters 6000 \
  --data-dir "$DATA"
mkdir -p exp/dss_depth_fine
cp exp/dss_depth/model_best.npz exp/dss_depth_fine/model.npz
python train_mvr.py --config configs/dss_depth_fine.yml --max-iters 14000 \
  --data-dir "$DATA"

FINAL_DIR=exp/dss_depth_fine
if [ "${RUN_HIRES:-0}" = "1" ]; then
  if [ ! -d "$DATA_HIRES" ]; then
    echo "hi-res dataset $DATA_HIRES missing (create_mvr_data --image-size 1024)" >&2
    exit 1
  fi
  mkdir -p exp/dss_depth_hires
  cp exp/dss_depth_fine/model_best.npz exp/dss_depth_hires/model.npz
  python train_mvr.py --config configs/dss_depth_hires.yml --max-iters 18000 \
    --data-dir "$DATA_HIRES"
  FINAL_DIR=exp/dss_depth_hires
fi

python -m dss_tpu.apps.prune_floaters \
  --ckpt "$FINAL_DIR/model_best.npz" --data "$DATA" \
  --depth-tol 0.03 --depth-min-views 3
python -m dss_tpu.apps.refine_normals \
  --ckpt "$FINAL_DIR/model_best_pruned.npz" --data "$DATA" \
  --jet-passes 3
echo "final model: $FINAL_DIR/model_best_pruned_jet.npz (+ .ply)"
