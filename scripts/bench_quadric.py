"""Micro-bench: lean forward kernel + feature-backward kernel, elementwise q
vs MXU-quadric q (scripts-only iteration harness for BENCHMARKS.md target #1).

Usage: python scripts/bench_quadric.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from dss_tpu.utils.platform import setup_jax

setup_jax()
import jax
import jax.numpy as jnp

from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
from dss_tpu.render.ewa import RasterSettings, compute_vrk_h_global, prepare_splats
from dss_tpu.ops.splat_pallas import (
    bin_splats,
    feat_backward_views,
    rasterize_forward_views_lean,
)

P = 5000
V = 8
S = 512
K = 5
TILE = 64
CAP = 2048
CHUNK = 128


def make_inputs():
    verts, faces = ico_sphere(level=4, radius=0.5)
    pts_np, normals_np = sample_points_from_mesh(verts, faces, P)
    pts, normals = jnp.asarray(pts_np), jnp.asarray(normals_np)
    mask = jnp.ones((P,), bool)
    elev = np.linspace(-30.0, 30.0, V)
    azim = np.linspace(0.0, 315.0, V)
    r, t = look_at_view_transform(
        dist=jnp.full((V,), 2.0), elev=jnp.asarray(elev), azim=jnp.asarray(azim)
    )
    settings = RasterSettings(
        image_size=S, points_per_pixel=K, cutoff_threshold=1.0,
        Vrk_invariant=True, Vrk_isotropic=False, backface_culling=True,
    )
    vrk_h = compute_vrk_h_global(pts, mask)

    def prep(ct):
        cam = jax.tree_util.tree_map(lambda x: x[None], ct)
        sp = prepare_splats(pts, normals, mask, cam, settings, vrk_h=vrk_h)
        return sp.pts_screen, sp.ellipse_params, sp.cutoff, sp.radii, sp.scaler

    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    ps, el, cu, ra, sc = jax.jit(jax.vmap(prep))(cams)
    feats = jnp.broadcast_to(jnp.full((P, 3), 0.7), (V, P, 3))
    return ps, el, cu, ra, sc, feats


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ps, el, cu, ra, sc, feats = make_inputs()

    for mxq in (False, True):
        fwd = jax.jit(
            lambda ps, el, cu, ra, sc, feats, m=mxq: rasterize_forward_views_lean(
                ps, el, cu, ra, 0.05, S, K,
                tile_size=TILE, bin_capacity=CAP, chunk=CHUNK, max_tiles_xy=4,
                scaler=sc, features=feats, mxu_quadric=m,
            )[:4]
        )
        dt = timeit(fwd, ps, el, cu, ra, sc, feats)
        print(f"fwd lean   mxq={mxq}: {dt*1e3:7.2f} ms")

    binned = jax.jit(
        lambda ps, el, cu, ra, sc, feats: jax.vmap(
            lambda a, b, c, d, e, f: bin_splats(
                a, b, c, d, S, TILE, CAP, max_tiles_x=4, max_tiles_y=4,
                scaler=e, features=f,
            )
        )(ps, el, cu, ra, sc, feats)
    )(ps, el, cu, ra, sc, feats)
    grad_rgbw = jnp.ones((V, S, S, 4))
    for mxq in (False, True):
        bwd = jax.jit(
            lambda binned, g, m=mxq: feat_backward_views(
                binned, g, 0.05, P, S, K,
                tile_size=TILE, bin_capacity=CAP, chunk=CHUNK, mxu_quadric=m,
            )
        )
        dt = timeit(bwd, binned, grad_rgbw)
        print(f"feat bwd   mxq={mxq}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
