"""Generate reference-anchored goldens by RUNNING the reference's own CPU
rasterizer (yifita/DSS, /root/reference/DSS/csrc/rasterize_points_cpu.cpp).

This is the BASELINE.md quality gate made executable: the reference CPU code
is compiled verbatim via torch.utils.cpp_extension (torch-cpu is available in
this image), fed EWA inputs produced by dss_tpu's own setup path, and its
outputs (idx / zbuf / qvalue / occupancy fragments, occ-backward gradients,
zbuf-backward gradients) are committed as tests/golden/reference_cpu_*.npz.
tests/test_reference_golden.py then pins dss_tpu's rasterizer — the pure-JAX
spec AND the Pallas backend — against THOSE numbers, so the NDC flip, the
depth-merge rule, and the occ-backward rule are checked against yifita/DSS
itself, not against this framework's own render.

Reference entry points exercised (file:line in /root/reference):
  - RasterizePointsNaiveCpu      DSS/csrc/rasterize_points_cpu.cpp:27-144
  - RasterizePointsOccBackwardCpu DSS/csrc/rasterize_points_cpu.cpp:380-477
  - RasterizeZbufBackwardCpu      DSS/csrc/rasterize_points_cpu.cpp:479-514

Known reference-internal divergence (documented, handled in the test): the
CPU occ-backward restricts support by a per-point axis-aligned box test
(|dx|>rx·s && |dy|>ry·s → skip, cpp:464), while the production CUDA kernel
uses a global disc ‖d‖² ≤ (median(radii)·s)² (rasterize_points_backward.cu:
150-158) — dss_tpu implements the CUDA rule. TWO occ-backward goldens are
generated: (a) a support radius large enough to cover the whole image, where
both rules coincide and what remains is exactly the shared semantics — the
NDC flip, the pz/|px|/|py| validity tests, the asymmetric (grad>0 ∧
outside-splat → skip) rule, and the d/max(‖d‖²,ε) field — and (b) a FINITE
mid-anneal scaler (disc ≈ 0.2 NDC), where the test corrects the
box-vs-disc support delta analytically and pins the shared field over the
(dominant) region where both rules agree (test_reference_golden.py::
TestOccBackward::test_finite_radius_matches_reference).

Run: python scripts/gen_reference_goldens.py   (CPU only, ~1 min + one-time
~40 s extension build in /tmp/dss_ref_ext).
"""
from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CPP = "/root/reference/DSS/csrc/rasterize_points_cpu.cpp"
OUT_DIR = os.path.join(REPO, "tests", "golden")

WRAPPER = r"""
#include <torch/extension.h>
#include "%s"

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("naive_fwd", &RasterizePointsNaiveCpu);
  m.def("coarse_fwd", &RasterizePointsCoarseCpu);
  m.def("fine_fwd", &RasterizePointsFineCpu);
  m.def("occ_backward", &RasterizePointsOccBackwardCpu);
  m.def("zbuf_backward", &RasterizeZbufBackwardCpu);
}
""" % REF_CPP


def build_reference_ext():
    import torch  # noqa: F401
    from torch.utils import cpp_extension

    build_dir = "/tmp/dss_ref_ext"
    os.makedirs(build_dir, exist_ok=True)
    src = os.path.join(build_dir, "ref_binding.cpp")
    with open(src, "w") as f:
        f.write(WRAPPER)
    return cpp_extension.load(
        name="dss_reference_cpu",
        sources=[src],
        build_directory=build_dir,
        extra_cflags=["-O2"],
        verbose=True,
    )


def teapot_scene(image_size=256, points_per_pixel=5):
    """EWA inputs for one teapot view, produced by dss_tpu's setup path."""
    import jax
    import jax.numpy as jnp

    from dss_tpu.data.io import read_ply
    from dss_tpu.geometry.cameras import (
        FoVPerspectiveCameras,
        look_at_view_transform,
    )
    from dss_tpu.render.ewa import RasterSettings, prepare_splats

    ply = read_ply(
        "/root/reference/example_data/pointclouds/teapot_normal_dense.ply"
    )
    pts = jnp.asarray(ply.points)
    center = pts.mean(0)
    scale = jnp.max(jnp.linalg.norm(pts - center, axis=-1))
    pts = (pts - center) / scale * 0.7
    normals = jnp.asarray(ply.normals)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    mask = jnp.ones((pts.shape[0],), bool)

    r, t = look_at_view_transform(dist=2.2, elev=18.0, azim=35.0)
    cam = FoVPerspectiveCameras.create(r, t, fov=60.0, znear=0.1, zfar=100.0)
    # backface culling OFF so every point survives culling and the reference
    # (which has no mask input) sees the identical point set.
    settings = RasterSettings(
        image_size=image_size,
        points_per_pixel=points_per_pixel,
        backface_culling=False,
    )
    splats = prepare_splats(pts, normals, mask, cam, settings)
    assert bool(jnp.all(splats.mask)), "teapot scene must have full mask"
    return {
        "pts_screen": np.asarray(splats.pts_screen, np.float32),
        "ellipse_params": np.asarray(splats.ellipse_params, np.float32),
        "cutoff": np.asarray(splats.cutoff, np.float32),
        "radii": np.asarray(splats.radii, np.float32),
        "depth_merging_threshold": np.float32(
            settings.depth_merging_threshold
        ),
        "image_size": np.int32(image_size),
        "points_per_pixel": np.int32(points_per_pixel),
    }


def synthetic_scene(seed=0, n_points=400, image_size=128, points_per_pixel=5):
    """Random conics incl. behind-camera and off-screen points — exercises the
    pz<0 reject, box reject, and cutoff reject branches."""
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-1.2, 1.2, n_points),
            rng.uniform(-1.2, 1.2, n_points),
            rng.uniform(0.4, 3.0, n_points),
        ],
        axis=-1,
    ).astype(np.float32)
    pts[: n_points // 10, 2] = -rng.uniform(0.1, 1.0, n_points // 10)  # pz<0
    # random SPD conics: a>0, c>0, b² < 4ac
    a = rng.uniform(200.0, 4000.0, n_points)
    c = rng.uniform(200.0, 4000.0, n_points)
    b = rng.uniform(-1.0, 1.0, n_points) * 2.0 * np.sqrt(a * c) * 0.8
    ellipse = np.stack([a, b, c], axis=-1).astype(np.float32)
    cutoff = rng.uniform(0.5, 1.5, n_points).astype(np.float32)
    # axis-aligned half extents of {Q <= cutoff}: dx_max = 2 sqrt(c C / (4ac-b²))
    det = 4 * a * c - b * b
    radii = np.stack(
        [2 * np.sqrt(c * cutoff / det), 2 * np.sqrt(a * cutoff / det)],
        axis=-1,
    ).astype(np.float32)
    return {
        "pts_screen": pts,
        "ellipse_params": ellipse,
        "cutoff": cutoff,
        "radii": radii,
        "depth_merging_threshold": np.float32(0.3),
        "image_size": np.int32(image_size),
        "points_per_pixel": np.int32(points_per_pixel),
    }


def run_reference(ext, scene, rng):
    import torch

    pts = torch.from_numpy(scene["pts_screen"])
    n = pts.shape[0]
    first_idx = torch.zeros(1, dtype=torch.int64)
    num_pts = torch.full((1,), n, dtype=torch.int64)
    idx, zbuf, qvalue, occ = ext.naive_fwd(
        pts,
        torch.from_numpy(scene["ellipse_params"]),
        torch.from_numpy(scene["cutoff"]),
        torch.from_numpy(scene["radii"]),
        first_idx,
        num_pts,
        float(scene["depth_merging_threshold"]),
        int(scene["image_size"]),
        int(scene["points_per_pixel"]),
    )

    s = int(scene["image_size"])
    # Occupancy cotangent: sparse ±1 field like a silhouette-loss gradient.
    grad_occ = np.zeros((1, s, s), np.float32)
    sel = rng.random((1, s, s)) < 0.15
    grad_occ[sel] = rng.choice([-1.0, 1.0], size=int(sel.sum())).astype(
        np.float32
    ) * rng.uniform(0.2, 2.0, int(sel.sum())).astype(np.float32)
    # Support radius covering the whole image: both the CPU box rule and the
    # CUDA disc rule accept every (pixel, valid point) pair, isolating the
    # shared semantics (see module docstring).
    radii_s_wide = float(
        4.0 / max(np.abs(scene["radii"]).min(), 1e-6)
    )
    grad_pts_wide = ext.occ_backward(
        pts,
        torch.from_numpy(scene["radii"]),
        torch.from_numpy(grad_occ),
        first_idx,
        num_pts,
        radii_s_wide,
        float(scene["depth_merging_threshold"]),
    )

    # zbuf cotangent: random on occupied fragments.
    grad_zbuf = rng.standard_normal(zbuf.shape).astype(np.float32)
    grad_zbuf[np.asarray(idx) < 0] = 0.0
    pt_z_grad = torch.zeros((n, 1), dtype=torch.float32)
    ext.zbuf_backward(
        idx, torch.from_numpy(grad_zbuf), pt_z_grad
    )

    # FINITE support radius (the path training actually anneals through).
    # Here the CPU box/cross rule (|dx|>rx·s && |dy|>ry·s → skip, cpp:464)
    # and the CUDA/dss_tpu global disc rule genuinely diverge; the test pins
    # the shared field on the region where both rules agree and corrects the
    # rule delta analytically (tests/test_reference_golden.py).  Scaler is
    # chosen so the disc radius ≈ 0.2 NDC — mid-anneal territory.  A sparser
    # cotangent (3%) keeps a healthy fraction of points delta-free so the
    # exact-agreement sub-assertion stays non-vacuous.
    radii_s_finite = float(0.2 / max(np.median(scene["radii"]), 1e-6))
    grad_occ_finite = np.zeros((1, s, s), np.float32)
    sel_f = rng.random((1, s, s)) < 0.03
    grad_occ_finite[sel_f] = rng.choice(
        [-1.0, 1.0], size=int(sel_f.sum())
    ).astype(np.float32) * rng.uniform(0.2, 2.0, int(sel_f.sum())).astype(
        np.float32
    )
    grad_pts_finite = ext.occ_backward(
        pts,
        torch.from_numpy(scene["radii"]),
        torch.from_numpy(grad_occ_finite),
        first_idx,
        num_pts,
        radii_s_finite,
        float(scene["depth_merging_threshold"]),
    )

    return {
        "grad_occ_finite": grad_occ_finite[0],
        "radii_backward_scaler_finite": np.float32(radii_s_finite),
        "grad_pts_xy_finite": np.asarray(grad_pts_finite, np.float32),
        "idx": np.asarray(idx, np.int32)[0],
        "zbuf": np.asarray(zbuf, np.float32)[0],
        "qvalue": np.asarray(qvalue, np.float32)[0],
        "occupancy": np.asarray(occ, np.float32)[0],
        "grad_occ": grad_occ[0],
        "radii_backward_scaler_wide": np.float32(radii_s_wide),
        "grad_pts_xy_wide": np.asarray(grad_pts_wide, np.float32),
        "grad_zbuf": grad_zbuf[0],
        "grad_pts_z": np.asarray(pt_z_grad, np.float32)[:, 0],
    }


def main():
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")

    ext = build_reference_ext()
    os.makedirs(OUT_DIR, exist_ok=True)

    scenes = {
        "reference_cpu_teapot256": teapot_scene(),
        "reference_cpu_synthetic128": synthetic_scene(),
    }
    for name, scene in scenes.items():
        rng = np.random.default_rng(123)
        golden = run_reference(ext, scene, rng)
        out = os.path.join(OUT_DIR, name + ".npz")
        np.savez_compressed(out, **scene, **golden)
        occ_px = int(golden["occupancy"].sum())
        frags = int((golden["idx"] >= 0).sum())
        print(
            f"{out}: P={scene['pts_screen'].shape[0]} S={scene['image_size']}"
            f" occupied_px={occ_px} fragments={frags}"
        )


if __name__ == "__main__":
    main()
