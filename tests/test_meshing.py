"""Tests for MLS SDF + marching-tetrahedra surface reconstruction."""
import jax.numpy as jnp
import numpy as np

from dss_tpu.geometry.meshing import (
    generate_mesh_from_points,
    marching_tetrahedra,
    mls_signed_distance,
)
from tests.test_render import fibonacci_sphere


def test_mls_signed_distance_sphere():
    pts = jnp.asarray(fibonacci_sphere(2000, 1.0))
    normals = pts
    q = jnp.array([[0.0, 0.0, 0.5], [0.0, 0.0, 1.5], [1.0, 0.0, 0.0]])
    f = mls_signed_distance(q, pts, normals)
    assert float(f[0]) < -0.2  # inside
    assert float(f[1]) > 0.2  # outside
    assert abs(float(f[2])) < 0.05  # on surface


def test_marching_tets_sphere_grid():
    # analytic SDF grid of a radius-0.8 sphere
    r = 48
    lin = np.linspace(-1.2, 1.2, r)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.8
    verts, faces = marching_tetrahedra(sdf, np.full(3, -1.2), np.full(3, 1.2))
    assert len(verts) > 500 and len(faces) > 1000
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii, 0.8, atol=0.05)
    assert faces.min() >= 0 and faces.max() < len(verts)
    # surface area close to 4*pi*r^2 = 8.04
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    ).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.8**2, rtol=0.1)


def test_generate_mesh_from_points():
    pts = fibonacci_sphere(3000, 0.7)
    normals = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    verts, faces = generate_mesh_from_points(pts, normals, resolution=40)
    assert len(verts) > 200 and len(faces) > 400
    radii = np.linalg.norm(verts, axis=-1)
    # reconstructed surface hugs the sphere
    assert abs(float(np.median(radii)) - 0.7) < 0.08


def test_poisson_mesh_from_points():
    """FFT Poisson reconstruction (the reference's screened-Poisson step,
    pymeshlab absent): sub-voxel accuracy on a clean sphere and robustness
    to noise where the MLS field degrades."""
    from dss_tpu.geometry.meshing import poisson_mesh_from_points

    pts = fibonacci_sphere(4000, 0.7)
    normals = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    verts, faces = poisson_mesh_from_points(pts, normals, resolution=64)
    assert len(verts) > 1000 and len(faces) > 2000
    radii = np.linalg.norm(verts, axis=-1)
    assert abs(float(radii.mean()) - 0.7) < 0.01
    assert float(radii.std()) < 0.01

    rng = np.random.default_rng(0)
    noisy = pts + rng.standard_normal(pts.shape).astype(np.float32) * 0.01
    verts_n, _ = poisson_mesh_from_points(noisy, normals, resolution=64)
    radii_n = np.linalg.norm(verts_n, axis=-1)
    # the spectral solve averages the noise away
    assert abs(float(radii_n.mean()) - 0.7) < 0.015
    assert float(radii_n.std()) < 0.015


def test_generator_poisson_default():
    from dss_tpu.models.generator import Generator
    from dss_tpu.models.point_model import PointModelParams
    from dss_tpu.render.ewa import RasterSettings
    import jax.numpy as jnp

    pts = fibonacci_sphere(2000, 0.5)
    normals = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    params = PointModelParams.create(
        jnp.asarray(pts), jnp.asarray(normals), jnp.full_like(jnp.asarray(pts), 0.5)
    )
    gen = Generator(RasterSettings(image_size=64), mesh_resolution=64)
    verts, faces = gen.generate_mesh(params)
    assert len(verts) > 500
    assert abs(float(np.linalg.norm(verts, axis=-1).mean()) - 0.5) < 0.01


class TestImplicitRender:
    def test_ray_sphere_and_box(self):
        import jax.numpy as jnp

        from dss_tpu.render.implicit import ray_box_intersect, ray_sphere_intersect

        o = jnp.array([[0.0, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t0, t1, hit = ray_sphere_intersect(o, d, jnp.zeros(3), 1.0)
        assert bool(hit[0]) and abs(float(t0[0]) - 2.0) < 1e-5 and abs(float(t1[0]) - 4.0) < 1e-5
        t0, t1, hit = ray_box_intersect(o, d, -jnp.ones(3), jnp.ones(3))
        assert bool(hit[0]) and abs(float(t0[0]) - 2.0) < 1e-5

    def test_sphere_trace_renders_sdf_sphere(self):
        import jax.numpy as jnp

        from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
        from dss_tpu.render.implicit import render_sdf

        def sdf(p):  # radius-0.6 sphere
            return jnp.linalg.norm(p, axis=-1) - 0.6

        r, t = look_at_view_transform(dist=2.0, elev=15.0, azim=30.0)
        cam = FoVPerspectiveCameras.create(r, t, fov=60.0)
        rgba = render_sdf(sdf, cam, 64, n_steps=48)
        assert rgba.shape == (64, 64, 4)
        cover = float(rgba[..., 3].mean())
        # silhouette area of a 0.6 sphere at dist 2, fov 60: ~ pi r'^2 with
        # r' = atan(0.6/…) — loose bounds suffice
        assert 0.05 < cover < 0.35
        # center pixel hits, corner doesn't
        assert rgba[32, 32, 3] == 1.0 and rgba[2, 2, 3] == 0.0
        # shading is view-dependent (headlight): center brighter than limb
        assert float(rgba[32, 32, 0]) > float(rgba[22, 10, 0])
