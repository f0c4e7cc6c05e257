#!/usr/bin/env python
"""Sweep occ-backward kernel tile/budget configs at the bench shape.

The occ backward is the largest kernel cost (profile: 9.4 ms of a 54 ms
step).  Its work ~ Σ_tiles counts·tile_area: with a big tile, most tested
pixels fall outside the support disc; with a small tile, pair replication
and grid steps grow.  This sweeps (tile, max_tiles, tiles_per_step) across
annealing stages (radii_backward_scaler 10 → 1).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dss_tpu.utils.platform import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from dss_tpu.geometry.cameras import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )
    from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
    from dss_tpu.ops.splat_pallas import (
        bin_for_occ_backward,
        occ_backward_views_from_binned,
    )
    from dss_tpu.render.ewa import RasterSettings, prepare_splats

    P, V, S = 5000, 8, 512
    verts, faces = ico_sphere(level=4, radius=0.5)
    pts_np, normals_np = sample_points_from_mesh(verts, faces, P)
    pts = jnp.asarray(pts_np)
    normals = jnp.asarray(normals_np)
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

    def prep_one(cam_tree):
        cam = jax.tree_util.tree_map(lambda x: x[None], cam_tree)
        sp = prepare_splats(pts, normals, mask, cam, settings)
        return sp.pts_screen, sp.radii

    pts_s, radii = jax.jit(jax.vmap(prep_one))(cams)
    visible = jnp.ones((V, P), bool)
    rng = np.random.default_rng(0)
    grad_occ = jnp.asarray(
        rng.standard_normal((V, S, S)).astype(np.float32)
    )

    for scaler in [10.0, 5.0, 2.0, 1.0]:
        print(f"--- radii_backward_scaler = {scaler}")
        for tile, mt, cap, tps in [
            (64, 4, 2048, 1),
            (64, 4, 2048, 2),
            (32, 6, 1024, 4),
            (32, 8, 1024, 4),
            (32, 6, 1024, 8),
            (128, 3, 4096, 1),
        ]:
            @jax.jit
            def f(ps, ra, go, _tile=tile, _mt=mt, _cap=cap, _tps=tps,
                  _sc=scaler):
                binned, cur_r2 = jax.vmap(
                    lambda p1, r1, v1: bin_for_occ_backward(
                        p1, r1, v1, _sc, S, _tile, _cap, _mt
                    )
                )(ps, ra, visible)
                g = occ_backward_views_from_binned(
                    binned, cur_r2, go, P, S, _tile, _cap,
                    tiles_per_step=_tps,
                )
                return g, binned.overflow

            try:
                (g, of) = f(pts_s, radii, grad_occ)
                jax.block_until_ready(g)
                t0 = time.perf_counter()
                for _ in range(5):
                    g, of = f(pts_s, radii, grad_occ)
                jax.block_until_ready(g)
                dt = (time.perf_counter() - t0) / 5
                print(
                    f"  tile {tile:3d} mt {mt} cap {cap:4d} tps {tps}: "
                    f"{dt * 1e3:7.2f} ms  overflow {int(np.sum(np.asarray(of)))}"
                )
            except Exception as e:
                print(f"  tile {tile:3d} mt {mt} tps {tps}: FAILED {str(e)[:90]}")


if __name__ == "__main__":
    main()
