"""Coverage-driven reseeding CLI (between training phases).

Renders the current model's silhouettes, finds pixels where the GT masks
have coverage the render lacks, back-projects them through the visual hull
(models.reseed), and writes a checkpoint extended with the new points (new
Adam moments zeroed, filters active) ready to resume a refine phase —
train_mvr's checkpoint loader is shape-agnostic, so the next phase picks up
the larger cloud regardless of its config's n_points_per_cloud.

GT-free (training masks + cameras only).  If the dataset carries a GT
cloud, prints chamfer/Hausdorff before and after for the record.

Usage:
  python -m dss_tpu.apps.reseed_coverage --ckpt exp/dss_refine2/model.npz \
      --data /tmp/yoga6_data --out exp/dss_reseed/model.npz \
      [--n-new 256] [--views 32] [--platform cpu]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def extend_checkpoint(ck: dict, n_old: int, new_arrays: dict) -> dict:
    """Extend every per-point array in a checkpoint dict from n_old to
    n_old + n_new rows.  `new_arrays` supplies rows for specific keys
    (e.g. params/points); other per-point arrays get zeros (Adam moments)
    or True (boolean filters)."""
    some_new = next(iter(new_arrays.values()))
    n_new = some_new.shape[0]
    out = {}
    for k, v in ck.items():
        v = np.asarray(v)
        if v.ndim >= 1 and v.shape[0] == n_old:
            if k in new_arrays:
                tail = np.asarray(new_arrays[k], v.dtype)
            elif v.dtype == bool:
                tail = np.ones((n_new,) + v.shape[1:], bool)
            else:
                tail = np.zeros((n_new,) + v.shape[1:], v.dtype)
            out[k] = np.concatenate([v, tail], axis=0)
        else:
            out[k] = v
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data", required=True)
    parser.add_argument("--out", default=None,
                        help="output npz (default: <ckpt base>_reseed.npz)")
    parser.add_argument("--n-new", type=int, default=256)
    parser.add_argument("--views", type=int, default=32,
                        help="views to render for deficit detection "
                        "(evenly spaced; hull test always uses ALL views)")
    parser.add_argument("--hull-outside-frac", type=float, default=0.05)
    parser.add_argument("--use-depth", action="store_true",
                        help="use the dataset's dense depth maps: exact "
                        "candidate placement + occluded-hole detection "
                        "(holes behind other geometry that the silhouette "
                        "cannot see)")
    parser.add_argument("--depth-tol", type=float, default=0.05)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax
    import jax.numpy as jnp

    from dss_tpu import config as config_mod
    from dss_tpu.data.dataset import MVRDataset
    from dss_tpu.geometry.cameras import cameras_from_matrix
    from dss_tpu.models.point_model import (
        PointModelParams,
        render_model,
    )
    from dss_tpu.geometry.pointclouds import PointFilters
    from dss_tpu.models.reseed import reseed_coverage
    from dss_tpu.training.metrics import chamfer_hausdorff

    ds = MVRDataset(args.data, load_dense_depth=args.use_depth)
    all_cams = cameras_from_matrix(ds.camera_mat, **ds.cameras_params)
    n_views_total = len(all_cams)

    ck = dict(np.load(args.ckpt))
    pts = jnp.asarray(ck["params/points"])
    nrm = jnp.asarray(ck["params/normals"])
    col = jnp.asarray(ck["params/colors"])
    p = pts.shape[0]
    act_keys = [k for k in ck if k.endswith("activation")]
    active = (
        jnp.asarray(ck[act_keys[0]]).astype(bool)
        if act_keys
        else jnp.ones((p,), bool)
    )

    # Render predicted silhouettes on an evenly spaced view subset.
    vsel = np.unique(
        np.linspace(0, n_views_total - 1, min(args.views, n_views_total))
        .round().astype(int)
    )
    _, msk, cams, lights = ds.get_batch(vsel)
    cfg = config_mod.load_config("configs/dss.yml")
    settings = config_mod.create_raster_settings(cfg)
    # render at the DATASET's resolution, not the flagship config's —
    # the deficit test compares pred alpha against the dataset masks
    settings = settings.replace(image_size=int(np.asarray(msk).shape[-1]))
    if args.use_depth:
        # zbuf-carrying fragment path so the render exposes front depth
        settings = settings.replace(lean_fragments=False)
    params = PointModelParams(points=pts, normals=nrm, colors=col)
    filters = PointFilters(active, active, active)
    alphas, depths = [], []
    for i in range(0, len(vsel), 8):
        sub = jax.tree_util.tree_map(lambda x: x[i : i + 8], cams)
        sl = None if lights is None else jax.tree_util.tree_map(
            lambda x: x[i : i + 8], lights
        )
        if args.use_depth:
            from dss_tpu.models.point_model import point_model_forward

            out, _ = point_model_forward(params, filters, sub, sl, settings)
            a = np.asarray(out["mask_img_pred"])
            zfar = float(np.asarray(cams.zfar)[0])
            d = np.where(a > 0.5, np.asarray(out["depth_pred"]), zfar)
            alphas.append(a)
            depths.append(d)
        else:
            rgba = render_model(params, filters, sub, sl, settings)
            alphas.append(np.asarray(rgba[..., 3]))
    pred_alpha = np.concatenate(alphas, axis=0)
    gt_depths = pred_depths = None
    if args.use_depth:
        pred_depths = jnp.asarray(np.concatenate(depths, axis=0))
        gt_depths = jnp.asarray(ds.get_depths(vsel))

    new_pts, near_idx = reseed_coverage(
        pts,
        active,
        cams,
        jnp.asarray(msk),
        jnp.asarray(pred_alpha),
        n_new=args.n_new,
        hull_outside_frac=args.hull_outside_frac,
        seed=args.seed,
        gt_depths=gt_depths,
        pred_depths=pred_depths,
        depth_tol=args.depth_tol,
    )
    print(f"reseeded {new_pts.shape[0]} points (asked {args.n_new})")
    if new_pts.shape[0] == 0:
        print("no coverage deficit found; nothing to write")
        return

    # Hull test against ALL views for the record (reseed_coverage already
    # enforced it against the subset's cameras/masks? No — it used the
    # subset masks; re-check against the full set and drop violators).
    from dss_tpu.models.point_model import prune_outside_silhouette

    keep = prune_outside_silhouette(
        jnp.asarray(new_pts), all_cams, jnp.asarray(ds.masks),
        outside_frac=args.hull_outside_frac,
    )
    if not bool(keep.all()):
        print(f"dropping {int((~keep).sum())} proposals outside the full hull")
        new_pts = new_pts[np.asarray(keep)]
        near_idx = near_idx[np.asarray(keep)]
    if new_pts.shape[0] == 0:
        print("no proposals survived the full-view hull test")
        return

    if ds.points is not None:
        gt = jnp.asarray(ds.points)
        before = chamfer_hausdorff(pts, gt, pred_mask=active)
        allp = jnp.concatenate([pts, jnp.asarray(new_pts)])
        allm = jnp.concatenate([active, jnp.ones((new_pts.shape[0],), bool)])
        after = chamfer_hausdorff(allp, gt, pred_mask=allm)
        for tag, r in (("before", before), ("after ", after)):
            print(
                f"{tag}: chamfer {float(r['chamfer']):.6f}"
                f" hausdorff {float(r['hausdorff']):.4f}"
            )

    new_arrays = {
        "params/points": new_pts,
        "params/normals": np.asarray(nrm)[near_idx],
        "params/colors": np.asarray(col)[near_idx],
    }
    out_ck = extend_checkpoint(ck, p, new_arrays)
    out = args.out or os.path.splitext(args.ckpt)[0] + "_reseed.npz"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(out, **out_ck)
    print(f"wrote {out} ({p} -> {p + new_pts.shape[0]} points)")


if __name__ == "__main__":
    main()
