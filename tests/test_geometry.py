import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dss_tpu.geometry.cameras import (
    FoVPerspectiveCameras,
    look_at_view_transform,
    sample_random_cameras,
)
from dss_tpu.geometry.knn import grid_knn_points, knn_points, masked_gather
from dss_tpu.geometry.normals import estimate_local_coord_frames, estimate_normals
from dss_tpu.geometry.pointclouds import PointClouds, PointFilters
from dss_tpu.utils.mathutil import (
    eps_denom,
    inv2x2,
    det2x2,
    psd_regularized_det2x2,
    tangent_frame,
    to_homogen,
)


def test_eps_denom_sign_preserving():
    x = jnp.array([-1e-20, 0.0, 1e-20, -2.0, 3.0])
    out = eps_denom(x)
    np.testing.assert_allclose(out, [-1e-17, 1e-17, 1e-17, -2.0, 3.0], rtol=1e-6)


def test_psd_regularized_det2x2():
    """The EWA det floor (the 1024² NaN fix): entries of A + λI that were
    rounded non-PSD (TPU bf16 matmul passes do exactly this for edge-on
    splats) must still yield a positive det, while well-conditioned
    matrices are bitwise unchanged."""
    lam = 1e-6
    # b rounded up by one f32 ulp past a·d: naive det = −2.4e-7 < 0.
    bad = jnp.array([[1.0, 1.0000001], [1.0000001, 1.0]], jnp.float32)
    naive = float(det2x2(bad))
    assert naive < 0.0
    floored = float(psd_regularized_det2x2(bad, lam))
    assert floored > 0.0
    np.testing.assert_allclose(floored, lam * 2.0 - lam * lam, rtol=1e-6)
    # Benign matrix: floor must not bind.
    good = jnp.array([[2.0, 0.5], [0.5, 1.0]], jnp.float32)
    assert float(psd_regularized_det2x2(good, lam)) == float(det2x2(good))


def test_inv2x2_matches_linalg():
    key = jax.random.PRNGKey(0)
    m = jax.random.normal(key, (32, 2, 2)) + 3.0 * jnp.eye(2)
    np.testing.assert_allclose(inv2x2(m), np.linalg.inv(np.asarray(m)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(det2x2(m), np.linalg.det(np.asarray(m)), rtol=1e-5)


def test_tangent_frame_orthonormal():
    key = jax.random.PRNGKey(1)
    n = jax.random.normal(key, (100, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    sk = tangent_frame(n)  # (100, 2, 3)
    # rows orthonormal and orthogonal to n
    np.testing.assert_allclose(jnp.einsum("pij,pkj->pik", sk, sk), np.tile(np.eye(2), (100, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(jnp.einsum("pij,pj->pi", sk, n), np.zeros((100, 2)), atol=1e-5)
    # Sk^T Sk == I - n n^T
    proj = jnp.einsum("pij,pik->pjk", sk, sk)
    expect = np.tile(np.eye(3), (100, 1, 1)) - np.einsum("pi,pj->pij", n, n)
    np.testing.assert_allclose(proj, expect, atol=1e-5)


class TestCameras:
    def test_look_at_simple(self):
        # Camera at (0,0,-2) looking at origin: view dir +z, point at origin -> depth 2.
        r, t = look_at_view_transform(dist=2.0, elev=0.0, azim=180.0)
        cam = FoVPerspectiveCameras.create(r, t, fov=60.0)
        np.testing.assert_allclose(cam.camera_position(), [[0, 0, -2]], atol=1e-5)
        out = cam.transform_points_screen(jnp.array([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(out, [[[0.0, 0.0, 2.0]]], atol=1e-5)

    def test_ndc_x_left_y_up(self):
        # Camera at -Z looking at origin (azim=180): world +y should have
        # positive NDC y (up).  A point to the camera's right (world -x when
        # looking from -z toward +z... check via x_axis) maps to negative ndc x.
        r, t = look_at_view_transform(dist=2.0, elev=0.0, azim=180.0)
        cam = FoVPerspectiveCameras.create(r, t, fov=90.0)
        up = cam.transform_points_screen(jnp.array([[0.0, 0.5, 0.0]]))
        assert up[0, 0, 1] > 0
        # view x axis is the first column of R
        x_axis_world = cam.R[0, :, 0]
        p = cam.transform_points_screen(x_axis_world[None] * 0.5)
        assert p[0, 0, 0] > 0  # +X in view space -> +ndc_x (left on screen)

    def test_projection_depth_mapping(self):
        r, t = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
        cam = FoVPerspectiveCameras.create(r, t, fov=60.0, znear=0.5, zfar=10.0)
        m = cam.projection_matrix()[0]
        # [0,0,znear,1] @ K -> ndc z = f1 + f2/znear = znear mapped to 0
        hom = jnp.array([0.0, 0.0, 0.5, 1.0]) @ m
        np.testing.assert_allclose(hom[2] / hom[3], 0.0, atol=1e-5)
        hom = jnp.array([0.0, 0.0, 10.0, 1.0]) @ m
        np.testing.assert_allclose(hom[2] / hom[3], 1.0, atol=1e-5)

    def test_full_matrix_consistent_with_transform(self):
        key = jax.random.PRNGKey(2)
        r, t = look_at_view_transform(dist=2.5, elev=30.0, azim=45.0)
        cam = FoVPerspectiveCameras.create(r, t, fov=55.0)
        pts = jax.random.normal(key, (17, 3)) * 0.3
        out = cam.transform_points_screen(pts)
        hom = to_homogen(pts) @ cam.full_projection_matrix()[0]
        np.testing.assert_allclose(out[0, :, :2], hom[:, :2] / hom[:, 3:4], rtol=2e-4, atol=1e-5)

    def test_sampler_shapes(self):
        cams = sample_random_cameras(jax.random.PRNGKey(0), 12, 1.2, 2.2)
        assert len(cams) == 12
        d = jnp.linalg.norm(cams.camera_position(), axis=-1)
        assert jnp.all(d >= 1.1) and jnp.all(d <= 2.3)


class TestKnn:
    def test_knn_bruteforce_correct(self):
        key = jax.random.PRNGKey(3)
        pts = jax.random.normal(key, (200, 3))
        d, idx = knn_points(pts, pts, k=5)
        # self always first with dist 0
        np.testing.assert_array_equal(idx[:, 0], np.arange(200))
        # matmul-expansion self-distance leaves float32 cancellation residue
        np.testing.assert_allclose(d[:, 0], 0.0, atol=5e-6)
        # check against numpy
        dn = np.sum((np.asarray(pts)[:, None] - np.asarray(pts)[None]) ** 2, -1)
        ref = np.sort(dn, axis=1)[:, :5]
        np.testing.assert_allclose(np.sort(np.asarray(d), axis=1), ref, rtol=1e-3, atol=1e-5)

    def test_knn_exclude_self_and_mask(self):
        key = jax.random.PRNGKey(4)
        pts = jax.random.normal(key, (64, 3))
        mask = jnp.arange(64) < 50
        d, idx = knn_points(pts, pts, mask, mask, k=4, exclude_self=True)
        assert not jnp.any(idx[:50] == jnp.arange(50)[:, None])
        assert jnp.all(idx[:50] < 50)  # masked refs never matched
        assert jnp.all(idx[50:] == -1)

    def test_knn_chunked_matches(self):
        key = jax.random.PRNGKey(5)
        pts = jax.random.normal(key, (300, 3))
        d1, i1 = knn_points(pts, pts, k=3, query_chunk=64)
        d2, i2 = knn_points(pts, pts, k=3, query_chunk=4096)
        np.testing.assert_allclose(d1, d2, atol=1e-6)

    def test_knn_approx_matches_exact(self):
        # approx=True routes selection through lax.approx_min_k (the TPU
        # PartialReduce that replaces the sort-lowered top_k, the 3.5 s/step
        # multi-scene cost); on CPU XLA's fallback is exact, so the outputs
        # must match top_k bitwise — masks, self-exclusion and chunking
        # included.
        key = jax.random.PRNGKey(11)
        pts = jax.random.normal(key, (300, 3))
        mask = jnp.ones((300,), bool).at[13].set(False)
        de, ie = knn_points(pts, pts, mask, mask, k=5, exclude_self=True)
        da, ia = knn_points(pts, pts, mask, mask, k=5, exclude_self=True,
                            approx=True)
        np.testing.assert_allclose(de, da, atol=0)
        np.testing.assert_array_equal(ie, ia)
        # chunked path too
        dc, ic = knn_points(pts, pts, mask, mask, k=5, exclude_self=True,
                            approx=True, query_chunk=64)
        np.testing.assert_allclose(de, dc, atol=1e-6)

    def test_grid_knn_matches_bruteforce(self):
        key = jax.random.PRNGKey(6)
        pts = jax.random.normal(key, (500, 3))
        d1, _ = knn_points(pts, pts, k=4, exclude_self=True)
        d2, _ = grid_knn_points(pts, k=4, exclude_self=True, grid_res=4, bucket_size=128)
        np.testing.assert_allclose(d1, d2, rtol=1e-3, atol=1e-5)

    def test_build_knn_grid_dispatch_matches_brute(self):
        # build_knn switches to the grid path above grid_threshold; at a
        # benign density (occupancy << bucket, radius << cell) the grid is
        # exact, so forcing the dispatch must reproduce brute force.
        from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
        from dss_tpu.training.losses import build_knn

        verts, faces = ico_sphere(level=3, radius=0.5)
        pts_np, _ = sample_points_from_mesh(verts, faces, 2048)
        pts = jnp.asarray(pts_np)
        mask = jnp.ones((2048,), bool).at[7].set(False)
        brute = build_knn(pts, mask, knn_k=8)  # 2048 < threshold -> brute
        grid = build_knn(pts, mask, knn_k=8, grid_threshold=0)
        np.testing.assert_allclose(brute.dists, grid.dists, rtol=1e-5, atol=1e-7)
        # same neighbor sets row-wise (ties may permute equal-dist columns)
        same = (np.sort(np.asarray(brute.idx), axis=1)
                == np.sort(np.asarray(grid.idx), axis=1))
        assert same.mean() > 0.999

    def test_masked_gather_neg_idx(self):
        vals = jnp.arange(12.0).reshape(4, 3)
        idx = jnp.array([[0, -1], [3, 2]])
        out = masked_gather(vals, idx, fill=-7.0)
        np.testing.assert_allclose(out[0, 1], [-7.0] * 3)
        np.testing.assert_allclose(out[1, 0], [9.0, 10.0, 11.0])


class TestNormals:
    def test_plane_normals(self):
        key = jax.random.PRNGKey(7)
        xy = jax.random.normal(key, (400, 2))
        pts = jnp.concatenate([xy, jnp.zeros((400, 1))], axis=-1)
        n = estimate_normals(pts, neighborhood_size=8)
        np.testing.assert_allclose(jnp.abs(n[:, 2]), 1.0, atol=1e-3)
        curv, frames = estimate_local_coord_frames(pts, neighborhood_size=8)
        assert jnp.all(curv[:, 0] <= curv[:, 1] + 1e-9)
        np.testing.assert_allclose(curv[:, 0], 0.0, atol=1e-6)

    def test_sphere_normals_outward(self):
        key = jax.random.PRNGKey(8)
        v = jax.random.normal(key, (1000, 3))
        pts = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        n = estimate_normals(pts, neighborhood_size=8, reference_normals=pts)
        cos = jnp.sum(n * pts, axis=-1)
        assert float(jnp.mean(cos)) > 0.98

    def test_refine_normals_beats_noisy_and_pca(self):
        """Jet+bilateral refinement on a noisy sphere cloud: the refined
        field must be closer to the analytic normals than both the noisy
        input field and plane-PCA estimation (the curvature-bias case the
        quadric term exists for)."""
        from dss_tpu.geometry.normals import refine_normals

        key = jax.random.PRNGKey(11)
        k1, k2, k3 = jax.random.split(key, 3)
        # curved height field z = sin(3x)cos(3y)/2 with analytic normals
        xy = jax.random.uniform(k1, (2000, 2), minval=-1.0, maxval=1.0)
        z = jnp.sin(3.0 * xy[:, 0]) * jnp.cos(3.0 * xy[:, 1]) * 0.5
        pts = jnp.concatenate([xy, z[:, None]], axis=-1)
        fx = 1.5 * jnp.cos(3 * xy[:, 0]) * jnp.cos(3 * xy[:, 1])
        fy = -1.5 * jnp.sin(3 * xy[:, 0]) * jnp.sin(3 * xy[:, 1])
        gt_n = jnp.stack([-fx, -fy, jnp.ones_like(fx)], axis=-1)
        gt_n = gt_n / jnp.linalg.norm(gt_n, axis=-1, keepdims=True)
        pts = pts + 0.002 * jax.random.normal(k2, pts.shape)
        # noisy-but-oriented input normals (~23° rms angular noise)
        noisy = gt_n + 0.4 * jax.random.normal(k3, (2000, 3))
        noisy = noisy / jnp.linalg.norm(noisy, axis=-1, keepdims=True)

        def err(n):
            return float(
                jnp.mean(1.0 - jnp.abs(jnp.sum(n * gt_n, axis=-1)))
            )

        refined = refine_normals(pts, noisy, neighborhood_size=48)
        pca = estimate_normals(pts, neighborhood_size=48,
                               reference_normals=noisy)
        assert err(refined) < 0.05 * err(noisy)
        # the quadric term absorbs curvature; plane-PCA is biased at this k
        assert err(refined) < err(pca)

    def test_refine_normals_respects_mask(self):
        from dss_tpu.geometry.normals import refine_normals

        key = jax.random.PRNGKey(12)
        v = jax.random.normal(key, (256, 3))
        gt_n = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        pts = gt_n * 1.0
        mask = jnp.arange(256) < 200
        fixed = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (256, 1))
        out = refine_normals(pts, fixed, mask, neighborhood_size=16)
        # masked-out entries keep their input normals exactly
        np.testing.assert_allclose(
            np.asarray(out)[~np.asarray(mask)],
            np.asarray(fixed)[~np.asarray(mask)],
        )
        # outputs stay unit-length
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5
        )


class TestPointClouds:
    def test_normalize_to_sphere(self):
        key = jax.random.PRNGKey(9)
        pts = jax.random.normal(key, (100, 3)) * 5.0 + 2.0
        pc = PointClouds.create(pts, capacity=128)
        out, center, scale = pc.normalize_to_sphere()
        r = jnp.linalg.norm(out.masked_points(), axis=-1)
        assert float(jnp.max(r)) <= 1.0 + 1e-5
        # invertible
        np.testing.assert_allclose(
            out.points[:100] * scale + center, pts, rtol=1e-4, atol=1e-4
        )

    def test_filters(self):
        f = PointFilters.ones(10)
        f = f.replace(visibility=jnp.arange(10) < 5)
        assert int(f.combined().sum()) == 5
