"""Measure the REFERENCE's own rasterizer on CPU at the bench shape.

The speed gate (BASELINE.md) was anchored to a *nominal* 1.0 Msplats/s GPU
assumption because the reference publishes no numbers.  This script replaces
the assumption with a measurement someone actually ran: it compiles the
reference's CPU rasterizer verbatim (/root/reference/DSS/csrc/
rasterize_points_cpu.cpp, the reference's own executable spec for its CUDA
kernels — rasterize_points.h:88-124 dispatches on is_cuda) and times

  (a) naive forward      RasterizePointsNaiveCpu        (cpp:27-144)
  (b) occupancy backward RasterizePointsOccBackwardCpu  (cpp:380-477)
  (c) zbuf backward      RasterizeZbufBackwardCpu       (cpp:479-514)
  (d) EWA setup          SurfaceSplatting._get_per_point_info under torch-cpu
                         (via the stub harness of gen_ewa_goldens)

at the headline bench shape (5000 points, 512², K=5, 8 views — BASELINE.md
demo workload), with EWA inputs produced by dss_tpu's setup path so both
frameworks rasterize the identical splat set.

Run: python scripts/bench_reference_cpu.py
Prints a JSON summary; results recorded in BENCHMARKS.md ("reference
measured" section) with the CPU→GPU scaling assumption documented there.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

N_POINTS = 5000
N_VIEWS = 8
IMAGE_SIZE = 512
K = 5
RADII_BACKWARD_SCALER = 10.0  # production initial value (configs/dss.yml)


def bench_scene():
    """Same scene as bench.py, EWA inputs via dss_tpu's setup (CPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dss_tpu.geometry.cameras import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )
    from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
    from dss_tpu.render.ewa import (
        RasterSettings,
        compute_vrk_h_global,
        prepare_splats,
    )

    verts, faces = ico_sphere(level=4, radius=0.5)
    pts_np, normals_np = sample_points_from_mesh(verts, faces, N_POINTS)
    pts = jnp.asarray(pts_np)
    normals = jnp.asarray(normals_np)
    mask = jnp.ones((N_POINTS,), bool)

    elev = np.linspace(-30.0, 30.0, N_VIEWS)
    azim = np.linspace(0.0, 315.0, N_VIEWS)
    r, t = look_at_view_transform(
        dist=jnp.full((N_VIEWS,), 2.0), elev=jnp.asarray(elev),
        azim=jnp.asarray(azim),
    )
    settings = RasterSettings(
        image_size=IMAGE_SIZE, points_per_pixel=K, cutoff_threshold=1.0,
        Vrk_invariant=True, Vrk_isotropic=False, backface_culling=True,
    )
    vrk_h = compute_vrk_h_global(pts, mask)
    views = []
    for v in range(N_VIEWS):
        cam = FoVPerspectiveCameras.create(r[v : v + 1], t[v : v + 1], fov=60.0)
        sp = prepare_splats(pts, normals, mask, cam, settings, vrk_h=vrk_h)
        views.append(
            {
                "pts_screen": np.asarray(sp.pts_screen, np.float32),
                "ellipse_params": np.asarray(sp.ellipse_params, np.float32),
                "cutoff": np.asarray(sp.cutoff, np.float32),
                "radii": np.asarray(sp.radii, np.float32),
            }
        )
    return views, settings, np.asarray(pts, np.float32), np.asarray(
        normals, np.float32
    )


def main():
    from gen_reference_goldens import build_reference_ext

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    views, settings, pts_world, normals_world = bench_scene()
    ext = build_reference_ext()

    first_idx = torch.zeros(1, dtype=torch.int64)
    num_pts = torch.full((1,), N_POINTS, dtype=torch.int64)

    tviews = []
    for v in views:
        # The CPU naive kernel has no cutoff=-inf convention for culled
        # points; the reference deletes culled points instead
        # (rasterizer.py:148-217).  Emulate by pushing culled points behind
        # the camera (pz<0 reject, cpp:64-66) — identical live set.
        culled = ~np.isfinite(v["cutoff"])
        p = v["pts_screen"].copy()
        p[culled, 2] = -1.0
        cut = v["cutoff"].copy()
        cut[culled] = 0.0
        tviews.append(
            (
                torch.from_numpy(p),
                torch.from_numpy(v["ellipse_params"]),
                torch.from_numpy(cut),
                torch.from_numpy(v["radii"]),
            )
        )

    # ---- (a) forward ----
    def fwd_all():
        outs = []
        for p, e, c, rr in tviews:
            outs.append(
                ext.naive_fwd(
                    p, e, c, rr, first_idx, num_pts,
                    float(settings.depth_merging_threshold), IMAGE_SIZE, K,
                )
            )
        return outs

    outs = fwd_all()  # warm
    t0 = time.perf_counter()
    outs = fwd_all()
    t_fwd = time.perf_counter() - t0

    # ---- (a') coarse+fine forward — the reference's production algorithm
    # (its CUDA path, rasterize_points.cu:293-597; Python heuristic picks
    # bin_size 32 at 512², max_points_per_bin = max(10000, P),
    # rasterizer.py:713-733) ----
    bin_size = 32
    max_points_per_bin = max(10000, N_POINTS)

    def fwd_binned_all():
        outs_b = []
        for p, e, c, rr in tviews:
            bins = ext.coarse_fwd(
                p, rr, first_idx, num_pts, IMAGE_SIZE, bin_size,
                max_points_per_bin,
            )
            outs_b.append(
                ext.fine_fwd(
                    p, e, c, rr, bins,
                    float(settings.depth_merging_threshold), IMAGE_SIZE,
                    bin_size, K,
                )
            )
        return outs_b

    fwd_binned_all()  # warm
    t0 = time.perf_counter()
    fwd_binned_all()
    t_fwd_binned = time.perf_counter() - t0

    # ---- (b) occ backward (grad_occ = dense silhouette-style cotangent) ----
    rng = np.random.default_rng(0)
    grad_occ = torch.from_numpy(
        rng.choice([-1.0, 0.0, 1.0], size=(1, IMAGE_SIZE, IMAGE_SIZE), p=[0.1, 0.8, 0.1]).astype(np.float32)
    )

    def occ_bwd_all():
        outs_b = []
        for p, _e, _c, rr in tviews:
            outs_b.append(
                ext.occ_backward(
                    p, rr, grad_occ, first_idx, num_pts,
                    RADII_BACKWARD_SCALER,
                    float(settings.depth_merging_threshold),
                )
            )
        return outs_b

    occ_bwd_all()  # warm
    t0 = time.perf_counter()
    occ_bwd_all()
    t_bwd = time.perf_counter() - t0

    # ---- (c) zbuf backward ----
    def zbuf_bwd_all():
        for (idx, zbuf, _q, _o) in outs:
            gz = torch.ones_like(zbuf)
            out_grad = torch.zeros((N_POINTS, 1), dtype=torch.float32)
            ext.zbuf_backward(idx, gz, out_grad)

    zbuf_bwd_all()
    t0 = time.perf_counter()
    zbuf_bwd_all()
    t_zbuf = time.perf_counter() - t0

    # ---- (d) reference EWA setup, torch-cpu ----
    from gen_ewa_goldens import (
        _Camera,
        _Cloud,
        _Self,
        _load_reference_rasterizer,
    )
    import types

    ref_rast = _load_reference_rasterizer()
    import jax  # noqa: F401  (camera matrix from dss_tpu)
    from dss_tpu.geometry.cameras import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )

    r, t = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
    cam = FoVPerspectiveCameras.create(r, t, fov=60.0)
    m44 = np.asarray(cam.full_projection_matrix(), np.float32)
    rs = types.SimpleNamespace(
        cutoff_threshold=1.0, Vrk_invariant=True, Vrk_isotropic=False,
        image_size=IMAGE_SIZE, antialiasing_sigma=1.0,
    )
    cloud = _Cloud(pts_world, normals_world)

    def ewa_all():
        for _ in range(N_VIEWS):
            this = ref_rast.SurfaceSplatting.__new__(
                ref_rast.SurfaceSplatting
            )
            this.__dict__.update(_Self(rs, _Camera(m44)).__dict__)
            with torch.no_grad():
                ref_rast.SurfaceSplatting._get_per_point_info(this, cloud)

    ewa_all()
    t0 = time.perf_counter()
    ewa_all()
    t_ewa = time.perf_counter() - t0

    splats = N_POINTS * N_VIEWS
    t_step = t_fwd + t_bwd + t_zbuf + t_ewa
    result = {
        "shape": f"{N_POINTS} pts, {N_VIEWS} views, {IMAGE_SIZE}^2, K={K}",
        "torch_threads": torch.get_num_threads(),
        "fwd_ms": round(t_fwd * 1e3, 1),
        "fwd_binned_ms": round(t_fwd_binned * 1e3, 1),
        "occ_bwd_ms": round(t_bwd * 1e3, 1),
        "zbuf_bwd_ms": round(t_zbuf * 1e3, 1),
        "ewa_ms": round(t_ewa * 1e3, 1),
        "step_ms": round(t_step * 1e3, 1),
        "msplats_per_s_fwd_bwd": round(splats / t_step / 1e6, 4),
        "msplats_per_s_raster_only": round(
            splats / (t_fwd + t_bwd + t_zbuf) / 1e6, 4
        ),
        "msplats_per_s_binned_step": round(
            splats / (t_fwd_binned + t_bwd + t_zbuf + t_ewa) / 1e6, 4
        ),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
