"""Generate a tiny self-rendered MVR dataset + config for smoke/verify runs.

Renders a colored GT sphere with the framework's own renderer (the same shape
tests/test_data_config.py uses) and writes image/, mask/, data_dict.npz and a
train config.  Usage:

  python scripts/make_tiny_dataset.py --out /tmp/verify_ds \
      [--views 8] [--image-size 64] [--points 1500] [--platform cpu]

then:  python train_mvr.py --config /tmp/verify_ds/config.yml --max-iters 30 \
           --platform cpu
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--points", type=int, default=1500)
    ap.add_argument("--n-train-points", type=int, default=1500)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--format", choices=["mvr", "dtu"], default="mvr",
                    help="dtu: also write IDR-style cameras.npz "
                         "(world_mat_i/scale_mat_i) and a type: DTU config")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)
    import imageio.v2 as imageio
    import jax.numpy as jnp
    import yaml

    from dss_tpu.geometry.cameras import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )
    from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
    from dss_tpu.render.ewa import RasterSettings
    from dss_tpu.render.renderer import render_views

    v, s = args.views, args.image_size
    verts, faces = ico_sphere(level=4, radius=0.5)
    pts_np, normals_np = sample_points_from_mesh(verts, faces, args.points)
    pts = jnp.asarray(pts_np)
    normals = jnp.asarray(normals_np)
    # view-dependent-free colored bands so RGB loss has signal
    colors = jnp.stack(
        [
            0.5 + 0.5 * jnp.sin(6.0 * pts[:, 0]),
            0.5 + 0.5 * jnp.cos(6.0 * pts[:, 1]),
            jnp.full((args.points,), 0.6),
        ],
        axis=1,
    )
    mask = jnp.ones((args.points,), bool)
    r, t = look_at_view_transform(
        dist=jnp.full((v,), 2.0),
        elev=jnp.asarray(np.linspace(-20, 40, v)),
        azim=jnp.asarray(np.linspace(0, 315, v)),
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    st = RasterSettings(
        image_size=s, points_per_pixel=5, Vrk_invariant=True,
        Vrk_isotropic=False, backface_culling=True, cutoff_threshold=1.0,
        depth_channel=True,
    )
    rgba, frags, _ = render_views(pts, normals, colors, mask, cams, None, st)
    rgba = np.asarray(rgba)
    # dense per-view depth via the weighted-depth channel (background = zfar,
    # the create_mvr_data convention) so lambda_dr_depth smoke runs work
    depth = np.asarray(frags.wdepth)
    depth = np.where(depth > 0.0, depth, np.float32(100.0))

    root = args.out
    os.makedirs(os.path.join(root, "image"), exist_ok=True)
    os.makedirs(os.path.join(root, "mask"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    for i in range(v):
        imageio.imwrite(
            os.path.join(root, "image", f"{i:03d}.png"),
            (np.clip(rgba[i, ..., :3], 0, 1) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(root, "mask", f"{i:03d}.png"),
            (rgba[i, ..., 3] * 255).astype(np.uint8),
        )
        np.save(
            os.path.join(root, "depth", f"{i:03d}.npy"),
            depth[i].astype(np.float32),
        )
    m44 = np.zeros((v, 4, 4), np.float32)
    m44[:, :3, :3] = np.asarray(r)
    m44[:, 3, :3] = np.asarray(t)
    m44[:, 3, 3] = 1
    np.savez(
        os.path.join(root, "data_dict.npz"),
        camera_mat=m44,
        points=np.asarray(pts),
        normals=np.asarray(normals_np),
        colors=np.asarray(colors),
        cameras_type="FoVPerspectiveCameras",
        cameras_params={"fov": 60.0, "znear": 0.1, "zfar": 100.0},
    )
    if args.format == "dtu":
        # IDR/DTU cameras.npz convention: per-view world_mat/scale_mat with
        # camera_mat = (scale.T @ world.T) (reference dataset.py:359).
        np.savez(
            os.path.join(root, "cameras.npz"),
            **{f"world_mat_{i}": m44[i].T for i in range(v)},
            **{f"scale_mat_{i}": np.eye(4, dtype=np.float32) for i in range(v)},
        )
    cfg = {
        "name": "tiny_verify",
        "data": {"type": "MVR" if args.format == "mvr" else "DTU",
                 "data_dir": root},
        "renderer": {
            "raster_params": {
                "image_size": s,
                "points_per_pixel": 5,
                "cutoff_threshold": 1.0,
                "Vrk_invariant": True,
                "Vrk_isotropic": False,
                "backface_culling": True,
                "radii_backward_scaler": 10.0,
                "clip_pts_grad": 0.05,
            },
        },
        "model": {
            "type": "point",
            "model_kwargs": {
                "learn_points": True,
                "learn_normals": True,
                "learn_colors": True,
                "n_points_per_cloud": args.n_train_points,
            },
        },
        "training": {
            "out_dir": os.path.join(root, "exp"),
            "lambda_dr_rgb": 1.0,
            "lambda_dr_silhouette": 1.0,
            "lambda_dr_proj": 0.01,
            "lambda_dr_repel": 0.01,
            "batch_size": 4,
            "print_every": 10,
            "checkpoint_every": 50,
            "validate_every": 25,
            "visualize_every": -1,
            "steps_dss_backward_radii": 20,
        },
    }
    with open(os.path.join(root, "config.yml"), "w") as f:
        yaml.safe_dump(cfg, f)
    print(f"wrote {root}: {v} views @ {s}², config.yml")


if __name__ == "__main__":
    main()
