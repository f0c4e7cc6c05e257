"""Post-training floater pruning (flagship recipe final pass).

Loads a train_mvr checkpoint + its MVR dataset, computes the GT-free
silhouette-consistency keep-mask (`models.point_model.prune_outside_
silhouette`: a true surface point projects inside the object mask in every
view; floaters don't), ANDs it into the checkpoint's activation filter, and
writes the pruned checkpoint + PLY.  If the dataset carries a GT cloud,
prints chamfer/Hausdorff before and after.

The reference's only pruning is gradient-support based (Model.prune_points,
point_modeling.py:114-133) which cannot catch floaters — they still receive
silhouette gradients, they are just wrong.  Measured on the yoga6 flagship
cloud: removes 9/5000 points, Hausdorff 0.424 -> 0.150, chamfer 0.002728 ->
0.002650 (VERDICT r3 ask #2).

With --depth-tol the INTERIOR-floater criterion is ANDed in
(`prune_depth_inconsistent`): points never on the front depth surface in
any view are dropped.  Requires the dataset's dense depth maps (the
silhouette hull cannot see points strictly inside it).  Measured on the
depth-supervised E24 cloud: chamfer 0.001231 -> 0.000570, Hausdorff
0.1172 -> 0.0788 (BENCHMARKS.md round 5).

Usage:
  python -m dss_tpu.apps.prune_floaters --ckpt exp/dss_e15c_refine/model_jet.npz \
      --data /tmp/yoga6_data [--outside-frac 0.09] [--depth-tol 0.03] \
      [--depth-min-views 3] [--platform cpu]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data", required=True, help="MVR dataset dir (masks + cameras)")
    parser.add_argument("--out", default=None,
                        help="output npz (default: <ckpt base>_pruned.npz)")
    parser.add_argument("--outside-frac", type=float, default=0.09)
    parser.add_argument("--mask-threshold", type=float, default=0.5)
    parser.add_argument(
        "--depth-tol", type=float, default=None,
        help="also prune interior floaters: keep only points within this "
        "view-space depth tolerance of the dataset's dense front depth in "
        ">= --depth-min-views views",
    )
    parser.add_argument("--depth-min-views", type=int, default=1)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax.numpy as jnp

    from dss_tpu.data.dataset import MVRDataset
    from dss_tpu.geometry.cameras import cameras_from_matrix
    from dss_tpu.models.point_model import (
        prune_depth_inconsistent,
        prune_outside_silhouette,
    )
    from dss_tpu.training.metrics import chamfer_hausdorff

    ds = MVRDataset(args.data, load_dense_depth=args.depth_tol is not None)
    cams = cameras_from_matrix(ds.camera_mat, **ds.cameras_params)

    ck = dict(np.load(args.ckpt))
    pts = jnp.asarray(ck["params/points"])
    act_keys = [k for k in ck if k.endswith("activation")]
    active = (
        jnp.asarray(ck[act_keys[0]]).astype(bool)
        if act_keys
        else jnp.ones((pts.shape[0],), bool)
    )

    keep = prune_outside_silhouette(
        pts,
        cams,
        jnp.asarray(ds.masks),
        outside_frac=args.outside_frac,
        mask_threshold=args.mask_threshold,
    )
    if args.depth_tol is not None:
        keep_depth = prune_depth_inconsistent(
            pts,
            cams,
            jnp.asarray(ds.get_depths()),
            tol=args.depth_tol,
            min_views=args.depth_min_views,
        )
        print(
            f"depth-consistency drops "
            f"{int(jnp.sum(active & ~keep_depth))} active points"
        )
        keep = keep & keep_depth
    new_active = active & keep
    n_pruned = int(jnp.sum(active & ~keep))
    print(f"pruned {n_pruned}/{int(active.sum())} active points")

    if ds.points is not None:
        gt = jnp.asarray(ds.points)
        for tag, m in (("before", active), ("after ", new_active)):
            r = chamfer_hausdorff(pts, gt, pred_mask=m)
            print(
                f"{tag}: chamfer {float(r['chamfer']):.6f}"
                f" hausdorff {float(r['hausdorff']):.4f}"
            )

    out = args.out or os.path.splitext(args.ckpt)[0] + "_pruned.npz"
    if act_keys:
        for k in act_keys:
            ck[k] = np.asarray(new_active)
    else:
        ck["filters/activation"] = np.asarray(new_active)
    np.savez(out, **ck)
    print(f"wrote {out}")

    from dss_tpu.data.io import save_ply

    am = np.asarray(new_active)
    nrm = ck.get("params/normals")
    save_ply(
        os.path.splitext(out)[0] + ".ply",
        np.asarray(pts)[am],
        normals=None if nrm is None else np.asarray(nrm)[am],
    )


if __name__ == "__main__":
    main()
