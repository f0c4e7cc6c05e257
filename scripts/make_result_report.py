"""Render a GT-vs-prediction comparison + metrics for a trained yoga6 model.

Usage: python scripts/make_result_report.py [--ckpt exp/.../model.npz]
           [--out docs] [--platform cpu] [--recipe "dss.yml -> ..."]
Reads the checkpoint and /tmp/yoga6_data; writes docs/yoga6_gt_vs_pred.png
and docs/yoga6_metrics.json (chamfer / hausdorff / p2f / chamfer_normal /
psnr / iou over the sample views).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs")
    ap.add_argument("--ckpt", default=None, help="checkpoint npz file")
    ap.add_argument("--ckpt-dir", default="exp/dss_proj",
                    help="fallback: directory holding model.npz")
    ap.add_argument("--data", default="/tmp/yoga6_data")
    ap.add_argument("--views", type=int, nargs="+", default=[0, 5, 11, 17])
    ap.add_argument("--recipe", default=None, help="recipe string for the report")
    ap.add_argument("--json-name", default="yoga6_metrics.json",
                    help="output json filename (and the image grid name "
                         "derives from its stem)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax.numpy as jnp

    from dss_tpu import config as config_mod
    from dss_tpu.data.dataset import MVRDataset
    from dss_tpu.models.point_model import render_model
    from dss_tpu.training.checkpoint import CheckpointIO
    from dss_tpu.training.losses import iou_loss
    from dss_tpu.training.metrics import chamfer_hausdorff, point_to_surface
    from dss_tpu.training.trainer import (
        chamfer_distance,
        create_train_state,
        psnr,
    )
    from dss_tpu.utils.visualize import save_image_grid

    cfg = config_mod.load_config("configs/dss.yml")
    ds = MVRDataset(args.data)
    params, learn = config_mod.create_model_params(cfg)
    settings = config_mod.create_raster_settings(cfg)
    optimizer = config_mod.create_optimizer(cfg, learn)
    state = create_train_state(params, optimizer)
    if args.ckpt:
        ckpt_dir, ckpt_file = os.path.split(args.ckpt)
    else:
        ckpt_dir, ckpt_file = args.ckpt_dir, "model.npz"
    state, scalars = CheckpointIO(ckpt_dir).load(ckpt_file, state)
    it = int(scalars.get("it", -1))
    print("loaded checkpoint at it", it)

    img, msk, cams, lights = ds.get_batch(args.views)
    rgba = np.asarray(
        jax.jit(lambda p, f: render_model(p, f, cams, lights, settings))(
            state.params, state.filters
        )
    )
    rows = []
    for i in range(len(args.views)):
        rows.append(img[i])
        a = rgba[i, ..., 3:4]
        rows.append(np.clip(rgba[i, ..., :3], 0, 1) * a)
    os.makedirs(args.out, exist_ok=True)
    save_image_grid(
        np.stack(rows),
        os.path.join(
            args.out,
            args.json_name.replace("_metrics.json", "") + "_gt_vs_pred.png",
        ),
        ncols=2,
    )

    gt = jnp.asarray(ds.points)
    gtn = None if ds.normals is None else jnp.asarray(ds.normals)
    active = state.filters.activation
    m = chamfer_hausdorff(state.params.points, gt, pred_mask=active)
    p2f = point_to_surface(state.params.points, gt, gtn, pred_mask=active)
    report = {
        "iters": it,
        "chamfer": float(m["chamfer"]),
        "hausdorff": float(m["hausdorff"]),
        "p2f": float(p2f),
    }
    if args.recipe:
        report["recipe"] = args.recipe
    if gtn is not None:
        _, cn = chamfer_distance(
            gt, state.params.points, gtn, state.params.normals, y_mask=active
        )
        report["chamfer_normal"] = float(cn)
    pred_mask_img = rgba[..., 3]
    # Composite the prediction over the dataset's background color (mean GT
    # color outside the mask): mesh-generated datasets are white-background,
    # cloud-generated black — exact no-op for black (bg = 0).  The training
    # loss never sees the background (masked rgb L1), but whole-image PSNR
    # would otherwise measure the background convention, not the object.
    outside = 1.0 - msk[..., None]
    bg = (img * outside).sum(axis=(0, 1, 2)) / np.maximum(
        outside.sum(axis=(0, 1, 2)), 1.0
    )
    pred_rgb = rgba[..., :3] * rgba[..., 3:4] + (1.0 - rgba[..., 3:4]) * bg
    report["psnr_%dviews" % len(args.views)] = float(
        psnr(jnp.asarray(pred_rgb), jnp.asarray(img))
    )
    report["iou_loss_%dviews" % len(args.views)] = float(
        iou_loss(jnp.asarray(pred_mask_img), jnp.asarray(msk))
    )
    with open(os.path.join(args.out, args.json_name), "w") as f:
        json.dump(report, f, indent=1)
    print(report)


if __name__ == "__main__":
    main()
