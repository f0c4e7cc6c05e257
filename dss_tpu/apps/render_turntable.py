"""Turntable rendering CLI: 360° orbit renders of a point cloud.

Reference capability: sequences.py (v1 entry point, bit-rotted — SURVEY.md
§2.30) rendered a camera orbit of a splat cloud to images/video.

Usage:
  python -m dss_tpu.apps.render_turntable --points shape.ply --out /tmp/turn \
      --num-frames 36 [--image-size 256] [--platform cpu]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Render a 360 turntable of a point cloud")
    parser.add_argument("--points", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--num-frames", type=int, default=36)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--elev", type=float, default=15.0)
    parser.add_argument("--dist", type=float, default=2.0)
    parser.add_argument("--gif", action="store_true", help="also write orbit.gif")
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args(argv)

    import jax

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from dss_tpu.data.io import read_ply
    from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
    from dss_tpu.geometry.normals import estimate_normals
    from dss_tpu.render.ewa import RasterSettings
    from dss_tpu.render.lighting import DirectionalLights
    from dss_tpu.render.renderer import render_single_view

    ply = read_ply(args.points)
    pts = jnp.asarray(ply.points)
    center = (pts.max(0) + pts.min(0)) / 2.0
    pts = pts - center
    pts = pts / jnp.linalg.norm(pts, axis=-1).max()
    p = pts.shape[0]
    mask = jnp.ones((p,), bool)
    normals = (
        jnp.asarray(ply.normals)
        if ply.normals is not None
        else estimate_normals(pts, mask, neighborhood_size=8)
    )
    colors = jnp.asarray(ply.colors) if ply.colors is not None else jnp.full_like(pts, 0.75)

    settings = RasterSettings(
        image_size=args.image_size, points_per_pixel=5,
        Vrk_isotropic=True, backface_culling=True,
    )
    lights = DirectionalLights.create(direction=(0.3, 1.0, -0.5))

    os.makedirs(args.out, exist_ok=True)
    render = jax.jit(
        lambda cam: render_single_view(pts, normals, colors, mask, cam, lights, settings)[0]
    )
    frames = []
    for i in range(args.num_frames):
        azim = 360.0 * i / args.num_frames
        r, t = look_at_view_transform(dist=args.dist, elev=args.elev, azim=azim)
        cam = FoVPerspectiveCameras.create(r, t, fov=60.0)
        rgba = np.asarray(render(cam))
        rgb = np.clip(rgba[..., :3], 0, 1)
        alpha = rgba[..., 3:4]
        frame = (255 * (rgb * alpha + (1 - alpha))).astype(np.uint8)  # white bg
        imageio.imwrite(os.path.join(args.out, "frame_%03d.png" % i), frame)
        frames.append(frame)
        print("frame %d/%d" % (i + 1, args.num_frames))
    if args.gif:
        imageio.mimwrite(os.path.join(args.out, "orbit.gif"), frames, duration=0.08, loop=0)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
