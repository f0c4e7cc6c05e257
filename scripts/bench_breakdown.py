#!/usr/bin/env python
"""Step-cost breakdown at the bench shape (5k pts, 512², 8 views).

Times each stage of the differentiable render step separately so
optimization effort goes where the milliseconds are:
  - compute_vrk_h_global alone (the per-step kNN)
  - prepare_splats (EWA setup, 1 view)
  - bin_splats (1 view)
  - forward render_views (8 views, no grad)
  - full grad step (bench.py's measurement)

Usage: python scripts/bench_breakdown.py [--points 5000] [--views 8]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    out = None
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
    ap.add_argument("--points", type=int, default=5000)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=512)
    args = ap.parse_args()

    from dss_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from dss_tpu.geometry.cameras import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )
    from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
    from dss_tpu.ops.splat_pallas import bin_splats
    from dss_tpu.render.ewa import (
        RasterSettings,
        compute_vrk_h_global,
        prepare_splats,
    )
    from dss_tpu.render.renderer import render_views

    P, V, S = args.points, args.views, args.image_size
    print(f"backend={jax.default_backend()} P={P} V={V} S={S}")

    verts, faces = ico_sphere(level=4, radius=0.5)
    pts_np, normals_np = sample_points_from_mesh(verts, faces, P)
    pts = jnp.asarray(pts_np)
    normals = jnp.asarray(normals_np)
    colors = jnp.full_like(pts, 0.7)
    mask = jnp.ones((P,), bool)
    elev = np.linspace(-30.0, 30.0, V)
    azim = np.linspace(0.0, 315.0, V)
    r, t = look_at_view_transform(
        dist=jnp.full((V,), 2.0), elev=jnp.asarray(elev), azim=jnp.asarray(azim)
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    settings = RasterSettings(
        image_size=S, points_per_pixel=5, cutoff_threshold=1.0,
        Vrk_invariant=True, Vrk_isotropic=False, backface_culling=True,
    )

    # 1. vrk_h kNN alone
    f_vrk = jax.jit(lambda p: compute_vrk_h_global(p, mask))
    print(f"vrk_h (5k self-kNN):      {timeit(f_vrk, pts) * 1e3:7.2f} ms")

    # 2. EWA setup, 1 view
    cam0 = jax.tree_util.tree_map(lambda x: x[:1], cams)
    vrk_h = f_vrk(pts)

    @jax.jit
    def f_ewa(p, n):
        return prepare_splats(p, n, mask, cam0, settings, vrk_h)

    sp = f_ewa(pts, normals)
    print(f"prepare_splats (1 view):  {timeit(f_ewa, pts, normals) * 1e3:7.2f} ms")

    # 3. binning, 1 view
    @jax.jit
    def f_bin(sp_in):
        return bin_splats(
            sp_in.pts_screen, sp_in.ellipse_params, sp_in.cutoff,
            sp_in.radii, S, settings.tile_size, 2048,
            scaler=sp_in.scaler, features=colors,
        )

    print(f"bin_splats cap2048 (1v):  {timeit(f_bin, sp) * 1e3:7.2f} ms")

    @jax.jit
    def f_bin512(sp_in):
        return bin_splats(
            sp_in.pts_screen, sp_in.ellipse_params, sp_in.cutoff,
            sp_in.radii, S, settings.tile_size, 512,
            scaler=sp_in.scaler, features=colors,
        )

    print(f"bin_splats cap512 (1v):   {timeit(f_bin512, sp) * 1e3:7.2f} ms")

    # 4. forward only, V views
    @jax.jit
    def f_fwd(p, n, c):
        rgba, _, _ = render_views(
            p, n, c, mask, cams, None, settings, vrk_h=compute_vrk_h_global(p, mask)
        )
        return rgba

    print(f"forward ({V} views):       {timeit(f_fwd, pts, normals, colors) * 1e3:7.2f} ms")

    # 5. full grad step (bench.py definition)
    tr = jnp.zeros((V, S, S, 3))
    tm = jnp.zeros((V, S, S))

    def loss_fn(p, n, c):
        vh = compute_vrk_h_global(p, mask)
        rgba, _, _ = render_views(p, n, c, mask, cams, None, settings, vrk_h=vh)
        return jnp.mean(jnp.abs(rgba[..., :3] - tr)) + jnp.mean(
            jnp.abs(rgba[..., 3] - tm)
        )

    f_step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))
    dt = timeit(f_step, pts, normals, colors)
    print(f"grad step ({V} views):     {dt * 1e3:7.2f} ms "
          f"= {P * V / dt / 1e6:.3f} Msplats/s")


if __name__ == "__main__":
    main()
