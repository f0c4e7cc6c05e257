"""Point-cloud evaluation CLI: CD / Hausdorff / point-to-surface / NUC table.

Reference: scripts/evaluatePointClouds.py (36-166) — compares predicted
clouds against GT clouds and writes a metrics table (the reference depended
on the uninstalled pytorch_points package; see dss_tpu.training.metrics).

Usage:
  python -m dss_tpu.apps.evaluate_pcl --pred out1.ply out2.ply --gt gt.ply \
      [--csv metrics.csv] [--platform cpu]
"""
from __future__ import annotations

import argparse
import csv
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate point clouds vs GT")
    parser.add_argument("--pred", nargs="+", required=True)
    parser.add_argument("--gt", required=True)
    parser.add_argument("--csv", default=None)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args(argv)

    import jax

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax.numpy as jnp

    from dss_tpu.data.io import read_ply
    from dss_tpu.training.metrics import (
        chamfer_hausdorff,
        point_to_surface,
        uniformity_nuc,
    )

    gt = read_ply(args.gt)
    gt_pts = jnp.asarray(gt.points)
    gt_normals = None if gt.normals is None else jnp.asarray(gt.normals)

    rows = []
    for pred_path in args.pred:
        pred = read_ply(pred_path)
        pp = jnp.asarray(pred.points)
        m = chamfer_hausdorff(pp, gt_pts)
        p2f = point_to_surface(pp, gt_pts, gt_normals)
        nuc = uniformity_nuc(pp)
        row = {
            "name": os.path.basename(pred_path),
            "chamfer": float(m["chamfer"]),
            "hausdorff": float(m["hausdorff"]),
            "p2f": float(p2f),
            "nuc": float(nuc),
        }
        rows.append(row)
        print(
            "%-40s chamfer %.6g  hausdorff %.6g  p2f %.6g  nuc %.4f"
            % (row["name"], row["chamfer"], row["hausdorff"], row["p2f"], row["nuc"])
        )

    if args.csv:
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print("wrote", args.csv)
    return rows


if __name__ == "__main__":
    main()
