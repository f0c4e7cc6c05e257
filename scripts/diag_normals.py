#!/usr/bin/env python
"""Controlled normal-learning diagnostic.

Freeze points at a GT subsample and optimize ONLY normals from the real
train step (shading gradient via tri-color lights, reference
DSS/core/texture.py:74-127).  Answers whether the rendering loss can
recover the normal field at all when geometry is perfect — separating
"normal gradient signal is broken/weak" from "the cloud is too noisy for
coherent normals" (flagship chamfer_normal plateau, BENCHMARKS.md).

Usage: python scripts/diag_normals.py [--iters 600] [--image-size 256]
       [--platform cpu] [--lr 0.01]
"""
import argparse
import os
import sys
import time

import numpy as np

# NOTE: do NOT run this with PYTHONPATH=/root/repo — overwriting PYTHONPATH
# drops the container's /root/.axon_site entry and the axon TPU backend never
# registers.  The scripts add the repo root themselves:
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/yoga6_data")
    ap.add_argument("--config", default="configs/dss.yml")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--init", choices=["random", "gt", "pca"], default="random")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)

    import jax
    import jax.numpy as jnp

    from dss_tpu import config as config_mod
    from dss_tpu.models.point_model import PointModelParams
    from dss_tpu.training.trainer import (
        create_train_state,
        make_train_step,
        make_optimizer,
    )

    cfg = config_mod.load_config(args.config)
    cfg["data"]["data_dir"] = args.data
    cfg["renderer"]["raster_params"]["image_size"] = args.image_size
    dataset = config_mod.create_dataset(cfg)
    settings = config_mod.create_raster_settings(cfg)
    tcfg = config_mod.create_train_config(cfg)
    schedule = config_mod.create_anneal_schedule(cfg)

    gt_points, gt_normals, _ = dataset.get_pointclouds()
    gt_points = np.asarray(gt_points)
    gt_normals = np.asarray(gt_normals)
    rng = np.random.default_rng(args.seed)
    sel = rng.choice(gt_points.shape[0], 5000, replace=False)
    pts = gt_points[sel]
    gt_n = gt_normals[sel]
    gt_n /= np.maximum(np.linalg.norm(gt_n, axis=-1, keepdims=True), 1e-9)

    if args.init == "random":
        normals0 = rng.standard_normal(pts.shape).astype(np.float32)
    elif args.init == "gt":
        normals0 = gt_n.copy()
    else:
        from dss_tpu.geometry.normals import estimate_normals

        normals0 = np.asarray(estimate_normals(jnp.asarray(pts), None, 16))

    params = PointModelParams.create(pts, normals0, np.ones_like(pts))
    optimizer = make_optimizer(
        lr_points=0.0, lr_normals=args.lr, lr_colors=0.0, betas=(0.5, 0.9)
    )
    state = create_train_state(params, optimizer)
    train_step = make_train_step(optimizer, settings, tcfg, schedule)

    # Downscale the dataset images/masks to the diagnostic resolution.
    S = args.image_size
    imgs = np.asarray(dataset.images, np.float32)
    masks = np.asarray(dataset.masks, np.float32)
    f = imgs.shape[1] // S
    if f > 1:
        v, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
        imgs = imgs.reshape(v, S, f, S, f, -1).mean((2, 4))
        masks = masks.reshape(v, S, f, S, f).mean((2, 4))
    all_img = jnp.asarray(imgs)
    all_mask = jnp.asarray(masks)
    all_cams = dataset.get_cameras(None)
    all_lights = dataset.get_lights(None)

    @jax.jit
    def step_fn(state, a_img, a_mask, a_cams, a_lights, idx):
        # images/masks must be ARGUMENTS, not closed-over constants — baked
        # constants blow up the remote-compile request (HTTP 413 at 400 MB).
        take = lambda x: jnp.take(x, idx, axis=0)
        cams = jax.tree_util.tree_map(take, a_cams)
        lights = (
            None
            if a_lights is None
            else jax.tree_util.tree_map(take, a_lights)
        )
        return train_step(
            state, cams, lights, take(a_img), take(a_mask)
        )

    def cos_to_gt(n):
        u = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        return np.abs(np.sum(u * gt_n, axis=-1))

    c0 = cos_to_gt(np.asarray(state.params.normals))
    print(f"it 0: |cos| mean {c0.mean():.3f} med {np.median(c0):.3f}")
    t0 = time.time()
    for it in range(1, args.iters + 1):
        idx = rng.choice(len(dataset), args.batch, replace=False)
        state, metrics = step_fn(
            state, all_img, all_mask, all_cams, all_lights,
            jnp.asarray(idx, jnp.int32),
        )
        if it % 50 == 0 or it == args.iters:
            c = cos_to_gt(np.asarray(state.params.normals))
            print(
                f"it {it}: |cos| mean {c.mean():.3f} med {np.median(c):.3f} "
                f"frac>0.9 {(c > 0.9).mean():.2f} "
                f"loss {float(metrics['loss']):.4f} "
                f"rgb {float(metrics.get('loss_dr_rgb', np.nan)):.4f} "
                f"({(time.time() - t0) / it:.2f} s/it)"
            )


if __name__ == "__main__":
    main()
