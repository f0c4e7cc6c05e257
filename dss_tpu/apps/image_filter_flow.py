"""Image-filter-driven splat optimization ("geometry processing via image
filters", the paper's 2D teapot demo).

Reference capability: learn_image_filter.py (v1 entry point, bit-rotted in
the reference tree — SURVEY.md §2.28/§2.30): render the cloud from fixed
views, apply an image filter (L0-smooth / guided / superpixel) to the renders
to produce targets, then optimize point positions (+normals, colors) so the
re-rendered images match the filtered targets.

Usage:
  python -m dss_tpu.apps.image_filter_flow --points teapot.ply \
      --filter l0 --out /tmp/filter_flow --iters 200 [--platform cpu]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Optimize a point cloud toward filtered renders")
    parser.add_argument("--points", required=True, help="input .ply point cloud")
    parser.add_argument("--out", required=True)
    parser.add_argument("--filter", choices=["l0", "guided", "superpixel", "pix2pix", "none"], default="l0")
    parser.add_argument("--l0-lambda", type=float, default=0.05)
    parser.add_argument("--pix2pix-weights", type=str, default=None,
                        help="torch .pth state_dict of the reference "
                             "resnet_9blocks generator (norm='pixel'); used "
                             "with --filter pix2pix (reference "
                             "Pix2PixDenoising, imageFilters.py:184-229)")
    parser.add_argument("--num-views", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=128)
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--lr", type=float, default=0.002)
    parser.add_argument("--lambda-proj", type=float, default=0.02)
    parser.add_argument("--lambda-repel", type=float, default=0.02)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args(argv)

    import jax

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax.numpy as jnp
    import optax

    from dss_tpu.data.io import read_ply, save_ply
    from dss_tpu.geometry.cameras import sample_random_cameras
    from dss_tpu.geometry.normals import estimate_normals
    from dss_tpu.models.point_model import PointModelParams
    from dss_tpu.render.ewa import RasterSettings
    from dss_tpu.render.renderer import render_views
    from dss_tpu.render.lighting import DirectionalLights
    from dss_tpu.training.losses import projection_loss, repulsion_loss
    from dss_tpu.utils.image_filters import guided_filter, l0_smooth, superpixel
    from dss_tpu.utils.visualize import save_image_grid

    os.makedirs(args.out, exist_ok=True)
    ply = read_ply(args.points)
    pts = jnp.asarray(ply.points)
    p = pts.shape[0]
    mask = jnp.ones((p,), bool)
    if ply.normals is not None:
        normals = jnp.asarray(ply.normals)
    else:
        normals = estimate_normals(pts, mask, neighborhood_size=8)
    colors = jnp.asarray(ply.colors) if ply.colors is not None else jnp.full_like(pts, 0.8)

    # normalize to unit sphere for stable camera sampling
    center = (pts.max(0) + pts.min(0)) / 2.0
    pts = pts - center
    pts = pts / jnp.linalg.norm(pts, axis=-1).max()

    cams = sample_random_cameras(
        jax.random.PRNGKey(args.seed), args.num_views, 1.8, 2.2
    )
    lights = None
    shaded_lights = DirectionalLights.create(
        ambient_color=(0.4, 0.4, 0.4), diffuse_color=(0.6, 0.6, 0.6),
        specular_color=(0.0, 0.0, 0.0), direction=(0.3, 1.0, -0.5),
    )
    # per-view identical lights for vmap
    lights = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (args.num_views,) + x.shape), shaded_lights
    )

    settings = RasterSettings(
        image_size=args.image_size, points_per_pixel=5,
        cutoff_threshold=1.0, Vrk_isotropic=True, backface_culling=True,
    )

    def render(params: PointModelParams):
        rgba, _, vis = render_views(
            params.points,
            params.normals / jnp.maximum(jnp.linalg.norm(params.normals, axis=-1, keepdims=True), 1e-9),
            params.colors, mask, cams, lights, settings,
        )
        return rgba, vis

    params = PointModelParams.create(pts, normals, colors)
    rgba0, _ = jax.jit(render)(params)
    renders = np.asarray(rgba0[..., :3])
    save_image_grid(renders, os.path.join(args.out, "initial.png"))

    # Filter the renders → optimization targets (host side).
    print("filtering %d renders with %s" % (len(renders), args.filter))
    if args.filter == "pix2pix":
        from dss_tpu.models.pix2pix import (
            ResnetGenerator,
            denoise_images,
            load_torch_generator_weights,
        )

        if not args.pix2pix_weights:
            parser.error("--filter pix2pix requires --pix2pix-weights")
        gen = ResnetGenerator(norm="pixel")
        gparams = gen.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.image_size, args.image_size, 3)),
        )
        gparams = load_torch_generator_weights(args.pix2pix_weights, gparams)
        targets = [
            np.asarray(t)
            for t in denoise_images(
                jax.jit(gen.apply), gparams, jnp.asarray(renders)
            )
        ]
    else:
        targets = []
        for im in renders:
            if args.filter == "l0":
                targets.append(np.asarray(l0_smooth(jnp.asarray(im), lmd=args.l0_lambda)))
            elif args.filter == "guided":
                targets.append(np.asarray(guided_filter(jnp.asarray(im), jnp.asarray(im).mean(-1), r=4, eps=1e-3))[..., None].repeat(3, -1))
            elif args.filter == "superpixel":
                targets.append(superpixel(im))
            else:
                targets.append(im)
    targets = jnp.asarray(np.stack(targets))
    save_image_grid(np.asarray(targets), os.path.join(args.out, "target.png"))

    optimizer = optax.adam(args.lr, b1=0.5, b2=0.9)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(prm):
            rgba, vis = render(prm)
            l_img = jnp.mean(jnp.abs(rgba[..., :3] - targets))
            n = prm.normals / jnp.maximum(
                jnp.linalg.norm(prm.normals, axis=-1, keepdims=True), 1e-9
            )
            reliable = jnp.any(vis, axis=0)
            l = l_img
            if args.lambda_proj > 0:
                l += args.lambda_proj * projection_loss(prm.points, n, mask, reliable=reliable)
            if args.lambda_repel > 0:
                l += args.lambda_repel * repulsion_loss(prm.points, n, mask, reliable=reliable)
            return l
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for it in range(args.iters):
        params, opt_state, loss = step(params, opt_state)
        if (it + 1) % 20 == 0:
            print("it %d loss %.5f (%.2fs)" % (it + 1, float(loss), time.time() - t0))

    rgba1, _ = jax.jit(render)(params)
    save_image_grid(np.asarray(rgba1[..., :3]), os.path.join(args.out, "final.png"))
    save_ply(
        os.path.join(args.out, "filtered_points.ply"),
        np.asarray(params.points),
        normals=np.asarray(params.normals),
    )
    print("wrote", args.out)
    return params


if __name__ == "__main__":
    main()
