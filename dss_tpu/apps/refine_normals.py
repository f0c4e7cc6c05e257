"""Post-training normal refinement (flagship recipe phase 4).

Loads a train_mvr checkpoint, re-estimates the normal field from the point
GEOMETRY with `geometry.normals.refine_normals` (weighted osculating-jet fit
+ bilateral smoothing, oriented by the trained normals), and writes the
refined checkpoint + PLY.  If the dataset directory is given, prints
chamfer_point / chamfer_normal before and after (same
`training.trainer.chamfer_distance` the train CLI's eval uses).

The reference ships no analogue — its normals come solely from the shading
gradient (train_mvr.py:150 trains them jointly); this phase exploits that
the converged flagship GEOMETRY (chamfer ~0.0027) carries more normal
information than the shading signal recovers (BENCHMARKS.md E16:
chamfer_normal 0.360 → 0.244; the transplant bound is 0.087).

Usage:
  python -m dss_tpu.apps.refine_normals --ckpt exp/dss_refine/model.npz \
      [--out exp/dss_refine/model_jet.npz] [--data /tmp/yoga6_data] \
      [--k 48] [--jet-passes 2] [--sigma 0.5] [--bilateral-iters 2]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", default=None,
                        help="output npz (default: <ckpt base>_jet.npz)")
    parser.add_argument("--data", default=None,
                        help="MVR dataset dir for before/after eval")
    parser.add_argument("--platform", default=None)
    parser.add_argument("--k", type=int, default=48)
    parser.add_argument("--jet-passes", type=int, default=2)
    parser.add_argument("--sigma", type=float, default=0.5)
    parser.add_argument("--bilateral-k", type=int, default=16)
    parser.add_argument("--bilateral-iters", type=int, default=2)
    args = parser.parse_args(argv)

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax.numpy as jnp

    from dss_tpu.geometry.normals import refine_normals
    from dss_tpu.training.trainer import chamfer_distance

    ck = dict(np.load(args.ckpt))
    pts = jnp.asarray(ck["params/points"])
    nrm = jnp.asarray(ck["params/normals"])
    act_keys = [k for k in ck if k.endswith("activation")]
    mask = (
        jnp.asarray(ck[act_keys[0]]).astype(bool)
        if act_keys
        else jnp.ones((pts.shape[0],), bool)
    )

    refined = refine_normals(
        pts,
        nrm,
        mask,
        neighborhood_size=args.k,
        jet_passes=args.jet_passes,
        bilateral_sigma=args.sigma,
        bilateral_k=args.bilateral_k,
        bilateral_iters=args.bilateral_iters,
    )

    if args.data:
        from dss_tpu.data.dataset import MVRDataset

        gt_pts, gt_nrm, _ = MVRDataset(args.data).get_pointclouds()
        if gt_pts is None or gt_nrm is None:
            raise SystemExit(
                f"--data {args.data} has no ground-truth point cloud; "
                "drop --data or point it at a dataset with GT points+normals"
            )
        for tag, n in (("before", nrm), ("after ", refined)):
            cd, cn = chamfer_distance(
                jnp.asarray(gt_pts),
                pts,
                jnp.asarray(gt_nrm),
                n,
                y_mask=mask,
            )
            print(
                f"{tag}: chamfer_point {float(cd):.6f}"
                f" chamfer_normal {float(cn):.4f}"
            )

    out = args.out or os.path.splitext(args.ckpt)[0] + "_jet.npz"
    if not out.endswith(".npz"):
        out += ".npz"  # np.savez appends it anyway; keep the log truthful
    ck["params/normals"] = np.asarray(refined, np.float32)
    np.savez(out, **ck)
    print(f"wrote {out}")

    from dss_tpu.data.io import save_ply

    am = np.asarray(mask)
    save_ply(
        os.path.splitext(out)[0] + ".ply",
        np.asarray(pts)[am],
        normals=np.asarray(refined)[am],
    )


if __name__ == "__main__":
    main()
