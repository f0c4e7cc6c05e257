"""Tests for the neural decoders (Siren/SDF/Occupancy/RenderingNetwork)."""
import jax
import jax.numpy as jnp
import numpy as np

from dss_tpu.models.decoders import (
    Occupancy,
    RenderingNetwork,
    ResidualSDF,
    SDF,
    Siren,
    approximate_gradient,
    embedding_dim,
    neural_texture_features,
    positional_encoding,
)


def test_positional_encoding_shape_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    enc = positional_encoding(x, num_freqs=4)
    assert enc.shape == (1, embedding_dim(3, 4))
    np.testing.assert_allclose(enc[0, :3], x[0], atol=1e-6)  # include_input
    np.testing.assert_allclose(enc[0, 3], np.sin(0.5), atol=1e-6)  # 2^0 sin


def test_siren_output_and_grad():
    model = Siren(hidden_size=64, n_layers=2, out_dims=(("sdf", 1),))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)))
    out = model.apply(params, jnp.ones((4, 3)) * 0.1)
    assert out["sdf"].shape == (4, 1)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, jnp.ones((4, 3)))["sdf"]))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_sdf_geometric_init_is_spherical():
    """Geometric init → SDF(x) ≈ |x| − bias: zero level set near a sphere."""
    model = SDF(hidden_size=128, n_layers=4, bias=0.6, num_frequencies=6, skip_in=(2,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    key = jax.random.PRNGKey(1)
    dirs = jax.random.normal(key, (64, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    inside = model.apply(params, dirs * 0.1)["sdf"]
    outside = model.apply(params, dirs * 1.2)["sdf"]
    assert float(inside.mean()) < float(outside.mean())
    # sign change across the init sphere
    assert float(inside.mean()) < 0 < float(outside.mean())


def test_sdf_gradient_near_unit():
    model = SDF(hidden_size=128, n_layers=4, num_frequencies=6, skip_in=(2,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    pts = jnp.array([[0.5, 0.1, -0.2], [0.0, 0.9, 0.0]])
    g = approximate_gradient(pts, lambda x: model.apply(params, x)["sdf"][..., 0])
    norms = jnp.linalg.norm(g, axis=-1)
    assert bool(jnp.all(jnp.isfinite(norms)))
    # geometric init is approximately an SDF → |∇f| ≈ 1
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=0.5)


def test_rendering_network_range():
    model = RenderingNetwork(hidden_size=64, n_layers=2)
    x = neural_texture_features(
        jnp.zeros((8, 3)), jnp.ones((8, 3)), camera_position=jnp.array([0.0, 0.0, 2.0])
    )
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)["rgb"]
    assert out.shape == (8, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_occupancy_decoder():
    model = Occupancy(hidden_size=64, n_blocks=3)
    p = jnp.zeros((5, 3))
    c = jnp.ones((5, 16))
    params = model.init(jax.random.PRNGKey(0), p, c)
    out = model.apply(params, p, c)
    assert out["occupancy"].shape == (5, 1)
    assert out["rgb"].shape == (5, 3)


def test_residual_sdf_gating():
    model = ResidualSDF(hidden_size=64, n_layers=3, siren_hidden_size=32, siren_n_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)))
    full = model.apply(params, jnp.ones((4, 3)) * 0.3)["sdf"]
    base = model.apply(params, jnp.ones((4, 3)) * 0.3, only_base=True)["sdf"]
    assert full.shape == base.shape == (4, 1)
    assert bool(jnp.all(jnp.isfinite(full)))


def test_neural_texture_render_path():
    """NeuralTexture drives per-point colors through the renderer."""
    import flax.linen as nn

    from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
    from dss_tpu.models.decoders import RenderingNetwork, neural_texture_features
    from dss_tpu.render.ewa import RasterSettings
    from dss_tpu.render.renderer import render_single_view
    from dss_tpu.render.texture import make_neural_texture
    from tests.test_render import fibonacci_sphere

    pts = jnp.asarray(fibonacci_sphere(200, 0.5))
    normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    mask = jnp.ones((200,), bool)
    r, t = look_at_view_transform(dist=2.0)
    cam = FoVPerspectiveCameras.create(r, t, fov=60.0)

    decoder = RenderingNetwork(hidden_size=32, n_layers=2)
    x0 = neural_texture_features(pts, normals, jnp.zeros(3))
    params = decoder.init(jax.random.PRNGKey(0), x0)
    tex = make_neural_texture(decoder.apply, params)

    st = RasterSettings(image_size=32, points_per_pixel=3)
    rgba, _, _ = render_single_view(
        pts, normals, jnp.ones_like(pts), mask, cam, None, st, texture_fn=tex
    )
    assert rgba.shape == (32, 32, 4)
    assert bool(jnp.all(jnp.isfinite(rgba)))
    inside = rgba[..., 3] > 0
    assert float(inside.mean()) > 0.05
    # decoder params receive gradients through the render
    g = jax.grad(
        lambda prm: jnp.sum(
            render_single_view(
                pts, normals, jnp.ones_like(pts), mask, cam, None, st,
                texture_fn=make_neural_texture(decoder.apply, prm),
            )[0][..., :3]
        )
    )(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_generator_artifacts(tmp_path):
    from dss_tpu.geometry.pointclouds import PointFilters
    from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
    from dss_tpu.models.generator import Generator
    from dss_tpu.models.point_model import PointModelParams
    from dss_tpu.render.ewa import RasterSettings
    from dss_tpu.data.io import read_ply
    from tests.test_render import fibonacci_sphere
    import os

    pts = fibonacci_sphere(1500, 0.6)
    normals = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    params = PointModelParams.create(
        jnp.asarray(pts), jnp.asarray(normals),
        colors=jnp.full((1500, 3), 0.3),
    )
    filters = PointFilters.ones(1500)
    gen = Generator(RasterSettings(image_size=32, points_per_pixel=3),
                    mesh_resolution=32)

    ply_path = gen.generate_pointclouds(params, filters, str(tmp_path / "pc.ply"))
    d = read_ply(ply_path)
    assert d.points.shape == (1500, 3)

    mesh_path = gen.generate_mesh_ply(params, filters, str(tmp_path / "mesh.ply"))
    m = read_ply(mesh_path)
    assert m.faces is not None and len(m.faces) > 100

    r, t = look_at_view_transform(dist=jnp.array([2.0]), elev=jnp.array([0.0]), azim=jnp.array([0.0]))
    cams = FoVPerspectiveCameras.create(r, t)
    paths = gen.generate_images(params, filters, cams, None, str(tmp_path))
    import imageio.v2 as imageio

    img = imageio.imread(paths[0])
    assert img.shape[:2] == (32, 32)
    # sphere silhouette: some non-background pixels
    assert (np.asarray(img) < 250).any()
