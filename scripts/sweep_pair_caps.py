"""100k-tail pair-cap sweep (VERDICT r2 weak #4 / BENCHMARKS target #2).

The 100k step's segment-sum + channel-gather machinery is sized by the
static pair caps (fwd 2·P, bwd 5·P at P>20k) while the profile shows only
~1.5 live pairs/splat — this sweeps the caps downward under PRODUCTION
settings (tiled_io + matmul_scatter) and reports step time AND the summed
bin_overflow so a smaller cap is only adopted if it truncates nothing.

Run on the TPU: python scripts/sweep_pair_caps.py [--points 100000]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    from dss_tpu.utils.platform import setup_jax

    setup_jax(args.platform)
    import jax
    import jax.numpy as jnp

    from dss_tpu.geometry.cameras import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )
    from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
    from dss_tpu.ops.splat_pallas import tile_images
    from dss_tpu.render.ewa import RasterSettings, compute_vrk_h_global
    from dss_tpu.render.renderer import render_views

    s = args.image_size
    n = args.points
    verts, faces = ico_sphere(level=5, radius=0.5)
    pts_np, normals_np = sample_points_from_mesh(verts, faces, n)
    pts = jnp.asarray(pts_np)
    normals = jnp.asarray(normals_np)
    colors = jnp.full_like(pts, 0.7)
    mask = jnp.ones((n,), bool)
    elev = np.linspace(-30.0, 30.0, args.views)
    azim = np.linspace(0.0, 315.0, args.views)
    r, t = look_at_view_transform(
        dist=jnp.full((args.views,), 2.0),
        elev=jnp.asarray(elev),
        azim=jnp.asarray(azim),
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)

    def run(fwd_scale, bwd_scale):
        settings = RasterSettings(
            image_size=s,
            points_per_pixel=5,
            cutoff_threshold=1.0,
            Vrk_invariant=True,
            Vrk_isotropic=False,
            backface_culling=True,
            tiled_io=True,
            pair_cap_scale_fwd=fwd_scale,
            pair_cap_scale_bwd=bwd_scale,
        )
        target_rgb = tile_images(
            jnp.zeros((args.views, s, s, 3)), settings.tile_size
        )
        target_m = tile_images(
            jnp.zeros((args.views, s, s)), settings.tile_size
        )

        def loss_fn(points, normals, colors):
            vh = compute_vrk_h_global(points, mask)
            rgba, frags, _ = render_views(
                points, normals, colors, mask, cams, None, settings,
                vrk_h=vh,
            )
            rgb, alpha = rgba[:, :, :3, :], rgba[:, :, 3, :]
            loss = jnp.mean(jnp.abs(rgb - target_rgb)) + jnp.mean(
                jnp.abs(alpha - target_m)
            )
            return loss, jax.lax.stop_gradient(jnp.sum(frags.overflow))

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True))
        g, aux = step(pts, normals, colors)
        jax.block_until_ready(g)
        overflow = int(np.asarray(aux))
        t0 = time.perf_counter()
        for _ in range(3):
            g, aux = step(pts, normals, colors)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / 3
        print(
            f"fwd×{fwd_scale:>4} bwd×{bwd_scale:>4}: {dt*1e3:7.1f} ms"
            f"  ({n*args.views/dt/1e6:.3f} Msplats/s)  overflow={overflow}"
        )

    for fwd, bwd in [
        (-1.0, -1.0),  # production defaults (2·P / 5·P at this P)
        (2.0, 4.0),
        (2.0, 3.0),
        (1.5, 3.0),
        (1.5, 2.5),
        (1.25, 2.0),
    ]:
        run(fwd, bwd)


if __name__ == "__main__":
    main()
