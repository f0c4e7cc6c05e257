"""Pin dss_tpu's EWA setup against the reference's own `_get_per_point_info`.

The golden npz (tests/golden/reference_ewa_teapot.npz) was produced by
scripts/gen_ewa_goldens.py, which RUNS /root/reference/DSS/core/rasterizer.py
(_compute_WJk 443-496, _compute_global_Vrk 293-342, _compute_isotropic_Vrk
344-402, _compute_variance_and_detMk 404-441, _get_ellipse_axis_aligned_radius
498-523, _get_per_point_info 525-565) under torch-cpu with minimal pytorch3d
stubs, fed by the SAME teapot scene and the SAME world→NDC matrix dss_tpu's
camera produces.  With this test no stage of the pipeline is self-certified:
EWA is pinned here, rasterization/backward by test_reference_golden.py.

All compared quantities are invariant to the reference's random tangent frame
(Vrk = h·SkᵀSk = h·(I−nnᵀ); detMk enters as |det|), so the comparison is
exact up to f32 arithmetic-order differences (measured ≤ 1.3e-4 relative;
conic b-coefficients cross zero, so ellipse_params are compared relative to
the per-point conic scale max(|a|,|c|)).
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from dss_tpu.geometry.cameras import FoVPerspectiveCameras
from dss_tpu.render.ewa import RasterSettings, prepare_splats

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "reference_ewa_teapot.npz"
)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("reference EWA golden missing — run scripts/gen_ewa_goldens.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def scene(golden):
    cam = FoVPerspectiveCameras.create(
        jnp.asarray(golden["R"]),
        jnp.asarray(golden["T"]),
        fov=float(golden["fov"]),
        znear=float(golden["znear"]),
        zfar=float(golden["zfar"]),
    )
    pts = jnp.asarray(golden["points"])
    normals = jnp.asarray(golden["normals"])
    mask = jnp.ones((pts.shape[0],), bool)
    return cam, pts, normals, mask


def test_projection_matrix_matches_golden_inputs(golden, scene):
    """The golden was generated against THIS camera matrix — if the camera
    model drifts, the EWA comparison below loses its meaning."""
    cam = scene[0]
    np.testing.assert_array_equal(
        np.asarray(cam.full_projection_matrix(), np.float32), golden["m44"]
    )


@pytest.mark.parametrize("mode", ["invariant", "isotropic", "anisotropic"])
def test_ewa_matches_reference(golden, scene, mode):
    if f"{mode}_radii" not in golden:
        pytest.skip(f"golden lacks {mode} mode — rerun scripts/gen_ewa_goldens.py")
    cam, pts, normals, mask = scene
    settings = RasterSettings(
        image_size=int(golden["image_size"]),
        cutoff_threshold=float(golden["cutoff_threshold"]),
        antialiasing_sigma=float(golden["antialiasing_sigma"]),
        Vrk_invariant=(mode == "invariant"),
        Vrk_isotropic=(mode == "isotropic"),
        backface_culling=False,
    )
    splats = prepare_splats(pts, normals, mask, cam, settings)
    assert bool(jnp.all(splats.mask)), "no point may be culled in this scene"

    ref_ellipse = golden[f"{mode}_ellipse_params"]
    ref_radii = golden[f"{mode}_radii"]
    ref_scaler = golden[f"{mode}_scaler"]
    ref_cutoff = golden[f"{mode}_cutoff_threshold"]

    # Conic (a, b, c): b crosses zero, so tolerance is relative to the
    # per-point conic scale (measured deviation ≤ 6e-5 of scale).
    scale = np.maximum(
        np.abs(ref_ellipse[:, 0]), np.abs(ref_ellipse[:, 2])
    )[:, None]
    diff = np.abs(np.asarray(splats.ellipse_params) - ref_ellipse)
    tol = np.broadcast_to(5e-4 * scale + 1e-6, diff.shape)
    assert np.all(diff < tol), (
        f"{mode} ellipse_params deviate from the reference EWA: "
        f"max |Δ|/scale = {(diff / (scale + 1e-12)).max():.2e}"
    )
    np.testing.assert_allclose(
        np.asarray(splats.radii), ref_radii, rtol=5e-4, atol=1e-8,
        err_msg=f"{mode} radii deviate",
    )
    # anisotropic: torch.linalg.svd vs jnp.linalg.eigh disagree at fp level
    # on near-degenerate K=8 neighborhoods (measured 1/7991 points at 4.2e-3)
    scaler_rtol = 6e-3 if mode == "anisotropic" else 2e-3
    np.testing.assert_allclose(
        np.asarray(splats.scaler), ref_scaler, rtol=scaler_rtol, atol=1e-5,
        err_msg=f"{mode} scaler deviates",
    )
    np.testing.assert_allclose(
        np.asarray(splats.cutoff), ref_cutoff, rtol=0, atol=0,
        err_msg=f"{mode} cutoff deviates",
    )
