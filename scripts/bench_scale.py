"""Kernel-level + scale micro-benchmarks (BENCHMARKS.md source).

Measures, on the current backend (TPU by default):
  - bin_splats alone
  - full forward rasterize (pallas)
  - occupancy backward (pallas)
  - full fwd+bwd render step at the flagship shape (5k pts, 512^2, 8 views)
  - the 100k-point scale shape (100k pts, 512^2, 8 views)

Usage: python scripts/bench_scale.py [--skip-100k] [--views N]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-100k", action="store_true")
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=512)
    args = ap.parse_args()

    from dss_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
    from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
    from dss_tpu.ops.splat_pallas import bin_splats, occ_backward_pallas, rasterize_forward_pallas
    from dss_tpu.render.ewa import RasterSettings, compute_vrk_h_global, prepare_splats
    from dss_tpu.render.renderer import render_views

    s = args.image_size
    print(f"backend: {jax.default_backend()}  image={s}  views={args.views}")

    def scene(n_points):
        verts, faces = ico_sphere(level=5, radius=0.5)
        pts_np, normals_np = sample_points_from_mesh(verts, faces, n_points)
        pts = jnp.asarray(pts_np)
        normals = jnp.asarray(normals_np)
        colors = jnp.full_like(pts, 0.7)
        mask = jnp.ones((n_points,), bool)
        elev = np.linspace(-30.0, 30.0, args.views)
        azim = np.linspace(0.0, 315.0, args.views)
        r, t = look_at_view_transform(
            dist=jnp.full((args.views,), 2.0),
            elev=jnp.asarray(elev),
            azim=jnp.asarray(azim),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        return pts, normals, colors, mask, cams

    settings = RasterSettings(
        image_size=s, points_per_pixel=5, cutoff_threshold=1.0,
        Vrk_invariant=True, Vrk_isotropic=False, backface_culling=True,
    )

    for n_points in ([5_000] if args.skip_100k else [5_000, 100_000]):
        pts, normals, colors, mask, cams = scene(n_points)
        print(f"\n=== {n_points} points ===")

        # single-view splat prep for the kernel-level numbers
        vrk_h = compute_vrk_h_global(pts, mask)
        cam0 = jax.tree_util.tree_map(lambda x: x[0:1], cams)
        prep = jax.jit(
            lambda p, n: prepare_splats(p, n, mask, cam0, settings, vrk_h=vrk_h)
        )
        sp = prep(pts, normals)
        print(f"prepare_splats (1 view): {timeit(prep, pts, normals)*1e3:8.2f} ms")

        ts = min(settings.tile_size, s)
        n_tiles = (s // ts) ** 2
        cap = min(n_points, max(settings.bin_capacity, 4 * n_points // n_tiles))
        bin_fn = jax.jit(
            lambda sp: bin_splats(
                sp.pts_screen, sp.ellipse_params, sp.cutoff, sp.radii,
                s, ts, cap, scaler=sp.scaler, features=colors,
            )
        )
        print(f"bin_splats (1 view):     {timeit(bin_fn, sp)*1e3:8.2f} ms  (tile {ts}, cap {cap})")

        fwd_fn = jax.jit(
            lambda sp: rasterize_forward_pallas(
                sp.pts_screen, sp.ellipse_params, sp.cutoff, sp.radii,
                settings.depth_merging_threshold, s, 5, tile_size=ts,
                bin_capacity=cap, scaler=sp.scaler, with_extras=True,
                features=colors,
            )
        )
        out = fwd_fn(sp)
        visible = out[5]
        print(f"forward raster (1 view): {timeit(fwd_fn, sp)*1e3:8.2f} ms   "
              f"overflow-safe frags, occ sum {float(out[3].sum()):.0f}")

        g_occ = jnp.ones((s, s), jnp.float32) * 0.1
        bwd_fn = jax.jit(
            lambda sp, vis: occ_backward_pallas(
                sp.pts_screen, sp.radii, vis, g_occ, 4.0, s,
                tile_size=ts, bin_capacity=max(cap, 512), max_tiles_xy=6,
            )
        )
        print(f"occ backward (1 view):   {timeit(bwd_fn, sp, visible)*1e3:8.2f} ms")

        # full fwd+bwd step over the view batch
        target_rgb = jnp.zeros((args.views, s, s, 3))
        target_m = jnp.zeros((args.views, s, s))

        def loss_fn(points, normals, colors):
            vh = compute_vrk_h_global(points, mask)
            rgba, _, _ = render_views(
                points, normals, colors, mask, cams, None, settings, vrk_h=vh
            )
            return jnp.mean(jnp.abs(rgba[..., :3] - target_rgb)) + jnp.mean(
                jnp.abs(rgba[..., 3] - target_m)
            )

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
        dt = timeit(step, pts, normals, colors, iters=3, warmup=1)
        print(f"fwd+bwd step ({args.views} views): {dt*1e3:8.1f} ms  "
              f"({n_points*args.views/dt/1e6:.4f} Msplats/s)")


if __name__ == "__main__":
    main()
