"""Batched multi-scene inverse rendering: train S independent clouds in ONE
jit program (BASELINE.md config 5: "batched multi-scene inverse rendering,
100k+ points").

Two dispatch modes over the same per-scene semantics (reference
DSS/training/trainer.py:275-376); each scene has its own GT cloud, its own
camera ring, and its own slice of the stacked Adam state (elementwise Adam
over stacked params ≡ independent per-scene optimizers):

- `--dispatch folded` (default): ALL S·V views render in ONE lean kernel
  launch (`make_stacked_loss_fn` → `render_views_stacked`, grid (S·V,
  tiles)) — the single-chip fast path; vmapping the Pallas entry instead
  lowers to a sequential XLA while loop over scenes.
- `--dispatch vmap`: the scene axis is vmapped over the flagship
  `make_loss_fn`; on a multi-chip mesh the SAME stacked arrays shard over
  devices along the scene axis with GSPMD
  (tests/test_parallel.py::test_vmap_over_scenes pins placement + math).

Scenes are anisotropically-scaled spheres (distinct aspect + color per
scene) whose GT multi-view images are rendered with the framework itself.

Run (one chip, the BASELINE workload):
  python -m dss_tpu.apps.train_multiscene --scenes 4 --points 25000 \
      --views 8 --image-size 512 --iters 60
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_scenes(n_scenes, n_points, rng):
    """Per-scene GT clouds: ellipsoids with distinct aspect ratios."""
    from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh

    verts, faces = ico_sphere(level=4, radius=0.5)
    pts_list, normals_list, colors_list = [], [], []
    for s in range(n_scenes):
        scale = 0.6 + 0.8 * rng.random(3)  # per-axis in [0.6, 1.4)
        v = verts * scale
        p, _ = sample_points_from_mesh(v, faces, n_points, rng=rng)
        # exact ellipsoid normals: n ∝ p / scale², for x²/a²+… = r²
        n = p / np.maximum(scale**2, 1e-6)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        c = np.broadcast_to(0.25 + 0.7 * rng.random(3), p.shape)
        pts_list.append(p)
        normals_list.append(n)
        colors_list.append(c.copy())
    return (
        np.stack(pts_list).astype(np.float32),
        np.stack(normals_list).astype(np.float32),
        np.stack(colors_list).astype(np.float32),
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--points", type=int, default=25000)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--lr-points", type=float, default=0.002)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--profile-dir", type=str, default=None,
                    help="capture a jax.profiler trace of iterations 10-12 "
                         "into this directory (parse with scripts/xplane_top.py)")
    ap.add_argument(
        "--dispatch", choices=["folded", "vmap"], default="folded",
        help="folded: all S·V views in ONE kernel launch "
             "(make_stacked_loss_fn — the single-chip fast path); vmap: "
             "per-scene vmap of the flagship loss (the multi-chip sharding "
             "layout; on one chip the Pallas entry serializes per scene)",
    )
    args = ap.parse_args(argv)

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax
    import jax.numpy as jnp

    from dss_tpu.geometry.cameras import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )
    from dss_tpu.geometry.pointclouds import PointFilters
    from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
    from dss_tpu.models.point_model import PointModelParams, point_model_forward
    from dss_tpu.render.ewa import RasterSettings
    from dss_tpu.training.trainer import (
        AnnealSchedule,
        TrainConfig,
        chamfer_distance,
        make_loss_fn,
        make_optimizer,
    )
    import optax

    rng = np.random.default_rng(args.seed)
    S, P, V = args.scenes, args.points, args.views
    gt_pts, gt_normals, gt_colors = build_scenes(S, P, rng)

    # Per-scene camera rings (each scene rendered from its own batch)
    def ring(seed):
        r = np.random.default_rng(seed)
        elev = r.uniform(-45, 45, V)
        azim = r.uniform(0, 360, V)
        rr, tt = look_at_view_transform(
            dist=jnp.full((V,), 2.0),
            elev=jnp.asarray(elev),
            azim=jnp.asarray(azim),
        )
        return FoVPerspectiveCameras.create(rr, tt, fov=60.0)

    cams = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[ring(args.seed + s) for s in range(S)]
    )

    settings = RasterSettings(
        image_size=args.image_size,
        points_per_pixel=5,
        cutoff_threshold=1.0,
        Vrk_invariant=True,
        Vrk_isotropic=False,
        backface_culling=True,
        radii_backward_scaler=5.0,
    )

    # GT images: render the GT clouds (framework-generated supervision)
    gt_filters = PointFilters.ones(P)

    @jax.jit
    def render_gt(pts, normals, colors, cam):
        params = PointModelParams(points=pts, normals=normals, colors=colors)
        out, _ = point_model_forward(
            params, gt_filters, cam, None, settings
        )
        return out["img_pred"], out["mask_img_pred"]

    gt_img, gt_mask = jax.vmap(render_gt)(
        jnp.asarray(gt_pts), jnp.asarray(gt_normals), jnp.asarray(gt_colors),
        cams,
    )
    jax.block_until_ready(gt_img)
    print(f"GT rendered: {gt_img.shape}")

    # Init: unit spheres (the flagship init, config.create_model_params)
    verts, faces = ico_sphere(level=4, radius=0.5)
    init_list = []
    for s in range(S):
        p, n = sample_points_from_mesh(verts, faces, P, rng=rng)
        init_list.append((p, n))
    params = PointModelParams(
        points=jnp.asarray(np.stack([p for p, _ in init_list])),
        normals=jnp.asarray(np.stack([n for _, n in init_list])),
        colors=jnp.full((S, P, 3), 0.5, jnp.float32),
    )
    filters = PointFilters.ones(P)
    filters = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (S,) + x.shape), filters
    )

    cfg = TrainConfig(lambda_repel=0.05, lambda_proj=0.0)
    schedule = AnnealSchedule(
        init_backward_radii=5.0, steps_backward_radii=50,
        gamma_backward_radii=0.9, limit_backward_radii=1.0,
    )
    optimizer = make_optimizer(
        lr_points=args.lr_points, lr_normals=args.lr_points, lr_colors=0.1
    )
    opt_state = optimizer.init(params)

    if args.dispatch == "folded":
        from dss_tpu.training.trainer import make_stacked_loss_fn

        stacked_loss = make_stacked_loss_fn(settings, cfg, schedule)

        def batched_loss(params, filters, it):
            total, (_parts, new_f) = stacked_loss(
                params, filters, cams, None, gt_img, gt_mask, it
            )
            return total, new_f
    else:
        loss_fn = make_loss_fn(settings, cfg, schedule)

        def scene_loss(params_s, filters_s, cams_s, img_s, mask_s, it):
            total, (parts, new_f) = loss_fn(
                params_s, filters_s, cams_s, None, img_s, mask_s, it
            )
            return total, new_f

        def batched_loss(params, filters, it):
            totals, new_f = jax.vmap(
                scene_loss, in_axes=(0, 0, 0, 0, 0, None)
            )(params, filters, cams, gt_img, gt_mask, it)
            return jnp.mean(totals), new_f

    @jax.jit
    def train_step(params, filters, opt_state, it):
        (loss, new_filters), grads = jax.value_and_grad(
            lambda p: batched_loss(p, filters, it), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_filters, opt_state, loss

    # compile + warmup
    t0 = time.perf_counter()
    params, filters, opt_state, loss = train_step(
        params, filters, opt_state, jnp.zeros((), jnp.int32)
    )
    jax.block_until_ready(loss)
    print(f"compiled in {time.perf_counter() - t0:.1f}s, loss0={float(loss):.4f}")

    times = []
    tracing = False
    for i in range(1, args.iters):
        if args.profile_dir and i == 10:
            jax.profiler.start_trace(args.profile_dir)
            tracing = True
        t0 = time.perf_counter()
        params, filters, opt_state, loss = train_step(
            params, filters, opt_state, jnp.asarray(i, jnp.int32)
        )
        jax.block_until_ready(loss)
        if tracing and i == 12:
            jax.profiler.stop_trace()
            tracing = False
            print(f"profiler trace written to {args.profile_dir}", flush=True)
        times.append(time.perf_counter() - t0)
        if i % 10 == 0:
            print(f"it {i} loss {float(loss):.4f} ({times[-1]:.3f}s/it)",
                  flush=True)
    if tracing:
        # --iters too small to reach the stop step: close the trace so the
        # xplane is still written instead of dying with the process.
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile_dir}", flush=True)

    steady = float(np.median(times[5:])) if len(times) > 10 else float(
        np.median(times)
    )
    msplats = S * P * V / steady / 1e6

    # per-scene chamfer vs GT clouds
    cds = []
    for s in range(S):
        cd, _ = chamfer_distance(
            jnp.asarray(gt_pts[s]), params.points[s]
        )
        cds.append(float(cd))
    result = {
        "scenes": S, "points_per_scene": P, "views": V,
        "dispatch": args.dispatch,
        "image_size": args.image_size, "iters": args.iters,
        "sec_per_iter": round(steady, 4),
        "msplats_per_s": round(msplats, 3),
        "final_loss": round(float(loss), 5),
        "chamfer_per_scene": [round(c, 5) for c in cds],
    }
    print(json.dumps(result))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
