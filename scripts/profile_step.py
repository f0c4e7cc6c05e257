"""Capture a jax.profiler trace of the flagship fwd+bwd step (bench.py shape)
and print the top XLA ops by self-time from the xplane proto.

Usage: python scripts/profile_step.py [--views 8] [--points 5000] [--out DIR]
"""
import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def top_ops_from_xplane(logdir, n=40):
    """Aggregate self-times per op from the device plane of the xplane proto."""
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    rows = {}
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = {e.id: e.name for e in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                rows[name] = rows.get(name, 0) + ev.duration_ps / 1e9  # ms
    return sorted(rows.items(), key=lambda kv: -kv[1])[:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--points", type=int, default=5000)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--out", default="/tmp/dss_profile")
    args = ap.parse_args()

    from dss_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
    from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
    from dss_tpu.render.ewa import RasterSettings, compute_vrk_h_global
    from dss_tpu.render.renderer import render_views

    s, v, n = args.image_size, args.views, args.points
    verts, faces = ico_sphere(level=4, radius=0.5)
    pts_np, normals_np = sample_points_from_mesh(verts, faces, n)
    pts, normals = jnp.asarray(pts_np), jnp.asarray(normals_np)
    colors = jnp.full_like(pts, 0.7)
    mask = jnp.ones((n,), bool)
    r, t = look_at_view_transform(
        dist=jnp.full((v,), 2.0),
        elev=jnp.asarray(np.linspace(-30, 30, v)),
        azim=jnp.asarray(np.linspace(0, 315, v)),
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    tiled = os.environ.get("DSS_BENCH_TILED", "1") == "1"
    settings = RasterSettings(
        image_size=s, points_per_pixel=5, cutoff_threshold=1.0,
        Vrk_invariant=True, Vrk_isotropic=False, backface_culling=True,
        tiled_io=tiled,
        mxu_quadric=os.environ.get("DSS_BENCH_QUADRIC", "0") == "1",
        matmul_scatter=os.environ.get("DSS_BENCH_MMS", "1") == "1",
    )
    tgt_rgb = jnp.zeros((v, s, s, 3))
    tgt_m = jnp.zeros((v, s, s))
    if tiled:
        from dss_tpu.ops.splat_pallas import tile_images

        tgt_rgb = tile_images(tgt_rgb, settings.tile_size)
        tgt_m = tile_images(tgt_m, settings.tile_size)

    def loss_fn(points, normals, colors):
        vh = compute_vrk_h_global(points, mask)
        rgba, _, _ = render_views(points, normals, colors, mask, cams, None,
                                  settings, vrk_h=vh)
        if tiled:
            rgb, alpha = rgba[:, :, :3, :], rgba[:, :, 3, :]
        else:
            rgb, alpha = rgba[..., :3], rgba[..., 3]
        return jnp.mean(jnp.abs(rgb - tgt_rgb)) + jnp.mean(
            jnp.abs(alpha - tgt_m)
        )

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
    g = step(pts, normals, colors)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(3):
        g = step(pts, normals, colors)
    jax.block_until_ready(g)
    print(f"step: {(time.perf_counter()-t0)/3*1e3:.1f} ms")

    os.system(f"rm -rf {args.out}")
    with jax.profiler.trace(args.out):
        for _ in range(2):
            g = step(pts, normals, colors)
        jax.block_until_ready(g)

    top = top_ops_from_xplane(args.out)
    if top is None:
        print("no xplane found", file=sys.stderr)
        return
    print(f"{'ms (2 steps)':>12}  op")
    for name, ms in top:
        print(f"{ms:12.3f}  {name[:140]}")


if __name__ == "__main__":
    main()
