"""Tests: image filters, mesh rasterizer, visualization dumps."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
from dss_tpu.geometry.shapes import ico_sphere
from dss_tpu.render.lighting import DirectionalLights
from dss_tpu.render.mesh_raster import rasterize_mesh, render_mesh_flat
from dss_tpu.utils.image_filters import box_filter, guided_filter, l0_smooth
from dss_tpu.utils.visualize import plot_2d_quiver, save_image_grid


class TestImageFilters:
    def test_box_filter_constant(self):
        img = jnp.ones((16, 16))
        out = box_filter(img, 2)
        # interior: full (2r+1)² window sum
        np.testing.assert_allclose(out[4:12, 4:12], 25.0, atol=1e-5)

    def test_box_filter_matches_naive(self):
        key = jax.random.PRNGKey(0)
        img = jax.random.uniform(key, (20, 20))
        r = 3
        out = np.asarray(box_filter(img, r))
        ref = np.zeros_like(out)
        imgn = np.asarray(img)
        for i in range(20):
            for j in range(20):
                ref[i, j] = imgn[
                    max(0, i - r) : min(20, i + r + 1), max(0, j - r) : min(20, j + r + 1)
                ].sum()
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_guided_filter_smooths(self):
        key = jax.random.PRNGKey(1)
        base = jnp.zeros((32, 32)).at[:, 16:].set(1.0)  # step edge
        noise = jax.random.normal(key, (32, 32)) * 0.1
        src = base + noise
        guide = jnp.stack([base] * 3, axis=-1)
        out = guided_filter(guide, src, r=4, eps=1e-3)
        # noise suppressed away from the edge
        assert float(jnp.std(out[:, :8])) < float(jnp.std(src[:, :8]))
        # edge preserved
        assert float(out[:, 24:].mean() - out[:, :8].mean()) > 0.8

    def test_l0_smooth_flattens(self):
        key = jax.random.PRNGKey(2)
        base = jnp.zeros((32, 32, 3)).at[:, 16:, :].set(0.8)
        noisy = base + jax.random.normal(key, (32, 32, 3)) * 0.05
        out = l0_smooth(noisy, lmd=0.05, num_iter=20)
        assert out.shape == noisy.shape
        # piecewise-constant: gradients sparser than input
        gx = lambda im: jnp.abs(jnp.diff(im, axis=1)).mean()
        assert float(gx(out)) < float(gx(noisy)) * 0.7
        # edge survives
        assert float(out[:, 24:].mean() - out[:, :8].mean()) > 0.5


class TestMeshRaster:
    @pytest.fixture(scope="class")
    def sphere_mesh(self):
        verts, faces = ico_sphere(level=2, radius=0.5)
        r, t = look_at_view_transform(dist=2.0, elev=10.0, azim=20.0)
        cam = FoVPerspectiveCameras.create(r, t, fov=60.0)
        return jnp.asarray(verts), jnp.asarray(faces), cam

    def test_rasterize_sphere_coverage_and_depth(self, sphere_mesh):
        verts, faces, cam = sphere_mesh
        fid, zbuf, bary = rasterize_mesh(verts, faces, cam, 64)
        hit = fid >= 0
        cover = float(hit.mean())
        assert 0.1 < cover < 0.5
        z = zbuf[hit]
        # depths within [dist - r, dist + r] — and front faces win (z < 2.0)
        assert float(z.min()) > 1.4 and float(z.max()) < 2.1
        assert float(jnp.median(z)) < 2.0
        # barycentric sums to 1 on hits
        np.testing.assert_allclose(np.asarray(jnp.sum(bary, -1)[hit]), 1.0, atol=1e-4)

    def test_render_flat_shading(self, sphere_mesh):
        verts, faces, cam = sphere_mesh
        lights = DirectionalLights.create(direction=(0.0, 1.0, -1.0))
        rgba = render_mesh_flat(verts, faces, cam, lights, 64)
        assert rgba.shape == (64, 64, 4)
        inside = rgba[..., 3] > 0
        vals = rgba[..., 0][inside]
        # shading variation across the sphere
        assert float(vals.max() - vals.min()) > 0.1

    def test_mesh_and_splat_silhouettes_agree(self, sphere_mesh):
        """Cross-check the two rasterizers: mesh silhouette vs splat
        silhouette of densely sampled surface points."""
        from dss_tpu.geometry.shapes import sample_points_from_mesh
        from dss_tpu.render.ewa import RasterSettings, prepare_splats
        from dss_tpu.render.rasterizer import rasterize_points

        verts, faces, cam = sphere_mesh
        rgba = render_mesh_flat(verts, faces, cam, None, 64)
        mesh_sil = np.asarray(rgba[..., 3])

        pts, normals = sample_points_from_mesh(
            np.asarray(verts), np.asarray(faces), 4000
        )
        st = RasterSettings(image_size=64, points_per_pixel=5, backface_culling=True)
        sp = prepare_splats(
            jnp.asarray(pts), jnp.asarray(normals), jnp.ones((4000,), bool), cam, st
        )
        _, _, _, occ = rasterize_points(
            64, 5, 8, sp.pts_screen, sp.ellipse_params, sp.cutoff, sp.radii,
            jnp.float32(0.05), jnp.float32(10.0),
        )
        splat_sil = np.asarray(occ)
        inter = (mesh_sil > 0.5) & (splat_sil > 0.5)
        union = (mesh_sil > 0.5) | (splat_sil > 0.5)
        iou = inter.sum() / union.sum()
        assert iou > 0.85, f"mesh/splat silhouette IoU too low: {iou}"


class TestVisualize:
    def test_quiver_and_grid_write_files(self, tmp_path):
        pts = np.random.default_rng(0).uniform(-0.5, 0.5, (100, 2))
        grads = {"proj": np.random.default_rng(1).normal(0, 0.01, (100, 2))}
        p1 = plot_2d_quiver(pts, grads, np.zeros((64, 64)), str(tmp_path / "q.png"), 64)
        assert os.path.getsize(p1) > 1000
        imgs = np.random.default_rng(2).uniform(0, 1, (3, 16, 16, 3))
        p2 = save_image_grid(imgs, str(tmp_path / "grid.png"))
        assert os.path.getsize(p2) > 1000


class TestSlic:
    def test_superpixel_quantizes_and_keeps_edges(self):
        rng = np.random.default_rng(0)
        img = np.zeros((48, 48, 3), np.float32)
        img[:, 24:] = [0.9, 0.1, 0.1]
        img[:, :24] = [0.1, 0.1, 0.9]
        img += rng.normal(0, 0.05, img.shape).astype(np.float32)
        from dss_tpu.utils.image_filters import slic_segments, superpixel

        out = superpixel(img, n_segments=16)
        assert out[:, :20].std(0).mean() < img[:, :20].std(0).mean() * 0.5
        assert float(out[:, 40:, 0].mean() - out[:, :8, 0].mean()) > 0.6
        labels = slic_segments(img, 16)
        assert 8 <= len(np.unique(labels)) <= 16
