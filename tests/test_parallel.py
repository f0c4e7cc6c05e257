"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
from dss_tpu.models.point_model import PointModelParams
from dss_tpu.parallel.mesh import make_mesh, make_sharded_train_step, shard_views
from dss_tpu.render.ewa import RasterSettings
from dss_tpu.training.trainer import (
    AnnealSchedule,
    TrainConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from tests.test_render import fibonacci_sphere


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


def _scene(n_views, image_size=16, n_points=256):
    pts = jnp.asarray(fibonacci_sphere(n_points, 0.5))
    normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    params = PointModelParams.create(pts, normals, jnp.full_like(pts, 0.6))
    elev = np.linspace(0.0, 40.0, n_views)
    azim = np.linspace(0.0, 315.0, n_views)
    r, t = look_at_view_transform(
        dist=jnp.full((n_views,), 2.0), elev=jnp.asarray(elev), azim=jnp.asarray(azim)
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    return params, cams


class TestShardedTraining:
    def test_sharded_step_matches_single_device(self, eight_devices):
        """The view-sharded step must produce the same loss/update as the
        unsharded one — GSPMD should only change placement, not math."""
        n_views = 8
        params, cams = _scene(n_views)
        settings = RasterSettings(image_size=16, points_per_pixel=3)
        # SGD makes the param delta EQUAL the (pmean'd) gradient, so the
        # comparison tests the distributed gradient math directly — Adam's
        # step-1 update is sign(grad), which amplifies fp-reassociation on
        # near-zero gradients into ±lr flips.
        import optax

        optimizer = optax.sgd(0.1)
        cfg = TrainConfig(lambda_proj=0.01, lambda_repel=0.01)
        schedule = AnnealSchedule()
        step = make_train_step(optimizer, settings, cfg, schedule)

        img = jnp.zeros((n_views, 16, 16, 3))
        mask_img = jnp.ones((n_views, 16, 16))
        state = create_train_state(params, optimizer)

        ref_state, ref_metrics = step(state, cams, None, img, mask_img)

        mesh = make_mesh(8)
        sharded = make_sharded_train_step(step, mesh)
        sh_state, sh_metrics = sharded(state, cams, None, img, mask_img)

        np.testing.assert_allclose(
            float(ref_metrics["loss"]), float(sh_metrics["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ref_state.params.points),
            np.asarray(sh_state.params.points),
            rtol=1e-4,
            atol=1e-6,
        )

    def test_shard_views_placement(self, eight_devices):
        mesh = make_mesh(8)
        x = jnp.arange(8 * 4.0).reshape(8, 4)
        sx = shard_views(x, mesh)
        # each device holds one view row
        assert len(sx.sharding.device_set) == 8

    def test_graft_entry_dryrun(self, eight_devices):
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestMultiScene:
    def test_vmap_over_scenes(self, eight_devices):
        """Batched multi-scene rendering: vmap over independent clouds, each
        rendered from its own camera batch (BASELINE config 5 shape)."""
        import jax

        from dss_tpu.render.ewa import RasterSettings
        from dss_tpu.render.renderer import render_views

        n_scenes, n_views, n_pts = 4, 2, 200
        keys = jax.random.split(jax.random.PRNGKey(0), n_scenes)
        scenes = jnp.stack(
            [
                jnp.asarray(fibonacci_sphere(n_pts, 0.4 + 0.1 * i))
                for i in range(n_scenes)
            ]
        )
        normals = scenes / jnp.linalg.norm(scenes, axis=-1, keepdims=True)
        colors = jnp.full_like(scenes, 0.6)
        mask = jnp.ones((n_scenes, n_pts), bool)
        r, t = look_at_view_transform(
            dist=jnp.full((n_views,), 2.0),
            elev=jnp.array([0.0, 30.0]),
            azim=jnp.array([0.0, 90.0]),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        st = RasterSettings(image_size=16, points_per_pixel=3)

        def render_scene(p, n, c, m):
            rgba, _, vis = render_views(p, n, c, m, cams, None, st)
            return rgba, vis

        rgba, vis = jax.vmap(render_scene)(scenes, normals, colors, mask)
        assert rgba.shape == (n_scenes, n_views, 16, 16, 4)
        assert vis.shape == (n_scenes, n_views, n_pts)
        # bigger spheres cover more pixels
        cover = jnp.mean(rgba[..., 3], axis=(1, 2, 3))
        assert float(cover[3]) > float(cover[0])
        # REALLY shard the scene axis over a 4-device mesh and check both the
        # placement and that GSPMD does not change the math
        from dss_tpu.parallel.mesh import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(4, axis="scenes")
        sh = NamedSharding(mesh, P("scenes"))
        jitted = jax.jit(
            jax.vmap(render_scene),
            in_shardings=(sh, sh, sh, sh),
            out_shardings=(
                NamedSharding(mesh, P("scenes", None, None, None, None)),
                NamedSharding(mesh, P("scenes", None, None)),
            ),
        )
        rgba2, vis2 = jitted(scenes, normals, colors, mask)
        assert len(rgba2.sharding.device_set) == 4
        np.testing.assert_allclose(np.asarray(rgba), np.asarray(rgba2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(vis), np.asarray(vis2))


class TestRowSharding:
    def test_row_sharded_render_matches(self, eight_devices):
        """Pixel-axis sharding: one view's rows split over 8 devices must
        reproduce the single-device render exactly."""
        import jax

        from dss_tpu.parallel.mesh import make_mesh, render_view_row_sharded
        from dss_tpu.render.ewa import RasterSettings
        from dss_tpu.render.renderer import render_single_view

        pts = jnp.asarray(fibonacci_sphere(300, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        colors = jnp.full_like(pts, 0.6)
        mask = jnp.ones((300,), bool)
        r, t = look_at_view_transform(dist=2.0, elev=10.0, azim=30.0)
        cam = FoVPerspectiveCameras.create(r, t, fov=60.0)
        st = RasterSettings(image_size=32, points_per_pixel=3, backend="reference")

        ref, _, _ = render_single_view(pts, normals, colors, mask, cam, None, st)
        mesh = make_mesh(8)
        rgba, visible = render_view_row_sharded(
            pts, normals, colors, mask, cam, None, st, mesh
        )
        assert len(rgba.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(rgba), np.asarray(ref), atol=1e-5)


class TestShardedPallasViews:
    def test_pallas_batched_path_under_view_sharding(self, eight_devices):
        """The view-batched pallas entry (rasterize_views_pallas_lean) must
        compile and produce identical gradients when the camera batch is
        GSPMD-sharded over an 8-device mesh.  (Correctness pin; per-shard
        scaling via shard_map is a round-3 item.)"""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dss_tpu.parallel.mesh import make_mesh
        from dss_tpu.render.ewa import RasterSettings
        from dss_tpu.render.renderer import render_views

        n = 300
        pts = jnp.asarray(fibonacci_sphere(n, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        colors = jnp.full_like(pts, 0.6)
        mask = jnp.ones((n,), bool)
        r, t = look_at_view_transform(
            dist=jnp.full((8,), 2.0),
            elev=jnp.arange(8.0),
            azim=jnp.arange(8.0) * 45.0,
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        st = RasterSettings(
            image_size=32, points_per_pixel=3, backend="pallas", tile_size=16
        )

        def loss(p, c):
            rgba, _, _ = render_views(p, normals, colors, mask, c, None, st)
            return jnp.mean((rgba - 0.2) ** 2)

        g0 = jax.jit(lambda p: jax.grad(loss)(p, cams))(pts)
        mesh = make_mesh(8)
        sh_cams = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("views")))
            if x.ndim >= 1 and x.shape[0] == 8
            else x,
            cams,
        )
        g1 = jax.jit(lambda p: jax.grad(loss)(p, sh_cams))(pts)
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


class TestShardMapTrainStep:
    def test_shardmap_step_matches_single_device(self, eight_devices):
        """make_shardmap_train_step (explicit per-shard grads + one psum over
        ICI) must reproduce the single-device train step: loss, params and
        filters.  This is the by-construction distributed path — GSPMD
        sharding of the same step is pinned separately."""
        import jax

        from dss_tpu.models.point_model import PointModelParams
        from dss_tpu.parallel.mesh import make_mesh, make_shardmap_train_step
        from dss_tpu.render.ewa import RasterSettings
        from dss_tpu.training.trainer import (
            AnnealSchedule,
            TrainConfig,
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        n = 256
        pts = jnp.asarray(fibonacci_sphere(n, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        params = PointModelParams.create(pts, normals, jnp.full_like(pts, 0.5))
        r, t = look_at_view_transform(
            dist=jnp.full((8,), 2.0),
            elev=jnp.linspace(-30.0, 30.0, 8),
            azim=jnp.linspace(0.0, 315.0, 8),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        settings = RasterSettings(image_size=16, points_per_pixel=3)
        # SGD makes the param delta EQUAL the (pmean'd) gradient, so the
        # comparison tests the distributed gradient math directly — Adam's
        # step-1 update is sign(grad), which amplifies fp-reassociation on
        # near-zero gradients into ±lr flips.
        import optax

        optimizer = optax.sgd(0.1)
        cfg = TrainConfig(lambda_proj=0.01, lambda_repel=0.01)
        schedule = AnnealSchedule()
        img = jnp.full((8, 16, 16, 3), 0.3)
        mask_img = jnp.zeros((8, 16, 16)).at[:, 4:12, 4:12].set(1.0)

        state0 = create_train_state(params, optimizer)
        ref_step = make_train_step(optimizer, settings, cfg, schedule)
        s_ref, m_ref = ref_step(state0, cams, None, img, mask_img)

        mesh = make_mesh(8)
        sm_step = make_shardmap_train_step(
            optimizer, settings, cfg, schedule, mesh
        )
        s_sm, m_sm = sm_step(state0, cams, None, img, mask_img)

        # pmean of per-shard means reassociates the f32 reduction — bits
        # differ at ~1e-5 relative, semantics match.
        np.testing.assert_allclose(
            float(m_ref["loss"]), float(m_sm["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(s_ref.params.points),
            np.asarray(s_sm.params.points),
            atol=5e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(s_ref.filters.visibility),
            np.asarray(s_sm.filters.visibility),
        )

    def test_shardmap_step_tiled_io_matches(self, eight_devices):
        """The shard_map distributed step under RasterSettings.tiled_io
        (tiled targets + untiled mask_plain for in-mask sampling) matches
        the untiled distributed step: tiling is a pure relayout and the
        mask_plain leaf shards like any view-batched image."""
        import optax

        from dss_tpu.models.point_model import PointModelParams
        from dss_tpu.ops.splat_pallas import tile_images
        from dss_tpu.parallel.mesh import make_mesh, make_shardmap_train_step
        from dss_tpu.render.ewa import RasterSettings
        from dss_tpu.training.trainer import (
            AnnealSchedule,
            TrainConfig,
            create_train_state,
        )

        n = 256
        pts = jnp.asarray(fibonacci_sphere(n, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        params = PointModelParams.create(pts, normals, jnp.full_like(pts, 0.5))
        r, t = look_at_view_transform(
            dist=jnp.full((8,), 2.0),
            elev=jnp.linspace(-30.0, 30.0, 8),
            azim=jnp.linspace(0.0, 315.0, 8),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        base = RasterSettings(
            image_size=16, points_per_pixel=3, backend="pallas", tile_size=8
        )
        optimizer = optax.sgd(0.1)
        cfg = TrainConfig(lambda_proj=0.01, lambda_repel=0.01)
        schedule = AnnealSchedule()
        img = jnp.full((8, 16, 16, 3), 0.3)
        mask_img = jnp.zeros((8, 16, 16)).at[:, 4:12, 4:12].set(1.0)

        mesh = make_mesh(8)
        state0 = create_train_state(params, optimizer)
        ref_step = make_shardmap_train_step(
            optimizer, base, cfg, schedule, mesh
        )
        s_ref, m_ref = ref_step(state0, cams, None, img, mask_img)

        tiled_step = make_shardmap_train_step(
            optimizer, base.replace(tiled_io=True), cfg, schedule, mesh
        )
        s_til, m_til = tiled_step(
            state0, cams, None,
            tile_images(img, 8), tile_images(mask_img, 8),
            mask_plain=mask_img,
        )
        np.testing.assert_allclose(
            float(m_ref["loss"]), float(m_til["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s_ref.params.points),
            np.asarray(s_til.params.points),
            atol=5e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(s_ref.filters.inmask),
            np.asarray(s_til.filters.inmask),
        )


class TestMultiSceneTraining:
    def test_batched_training_improves(self, capsys):
        """BASELINE config 5 as a *training* workload: the multi-scene app
        trains S independent clouds in one vmapped jit program and improves
        the batched loss (chip-scale run + Msplats/s row: BENCHMARKS.md)."""
        import json

        from dss_tpu.apps.train_multiscene import main as ms_main

        ms_main([
            "--scenes", "2", "--points", "300", "--views", "2",
            "--image-size", "32", "--iters", "10", "--platform", "cpu",
        ])
        out = capsys.readouterr().out.strip().splitlines()
        result = json.loads(out[-1])
        first_loss = float(out[1].split("loss0=")[1])
        assert np.isfinite(result["final_loss"])
        assert result["final_loss"] < first_loss
        assert len(result["chamfer_per_scene"]) == 2
        assert all(np.isfinite(c) for c in result["chamfer_per_scene"])

    def test_folded_matches_vmap_loss_and_grads(self):
        """make_stacked_loss_fn (ONE kernel launch over the flattened S·V
        view axis) must reproduce the per-scene vmap of make_loss_fn: same
        scene-mean total, same parts, same gradients — only the dispatch
        changes (tests the scene-major repeat/reshape bookkeeping)."""
        from dss_tpu.geometry.pointclouds import PointFilters
        from dss_tpu.training.trainer import make_loss_fn, make_stacked_loss_fn

        n_scenes, n_views, n_pts = 3, 2, 200
        scenes = jnp.stack(
            [
                jnp.asarray(fibonacci_sphere(n_pts, 0.35 + 0.1 * i))
                for i in range(n_scenes)
            ]
        )
        normals = scenes / jnp.linalg.norm(scenes, axis=-1, keepdims=True)
        params = PointModelParams(
            points=scenes, normals=normals,
            colors=jnp.full_like(scenes, 0.6),
        )
        filters = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (n_scenes,) + x.shape),
            PointFilters.ones(n_pts),
        )

        def ring(i):
            r, t = look_at_view_transform(
                dist=jnp.full((n_views,), 2.0),
                elev=jnp.array([10.0 * i, 30.0]),
                azim=jnp.array([15.0 * i, 100.0 + 10.0 * i]),
            )
            return FoVPerspectiveCameras.create(r, t, fov=60.0)

        cams = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[ring(i) for i in range(n_scenes)]
        )
        st = RasterSettings(
            image_size=32, points_per_pixel=3, backend="pallas",
            tile_size=16, bin_capacity=256, Vrk_invariant=True,
            Vrk_isotropic=False,
        )
        cfg = TrainConfig(lambda_repel=0.05)
        schedule = AnnealSchedule()
        rng = np.random.default_rng(0)
        img = jnp.asarray(
            rng.uniform(0, 1, (n_scenes, n_views, 32, 32, 3)).astype(np.float32)
        )
        mask = jnp.asarray(
            (rng.uniform(0, 1, (n_scenes, n_views, 32, 32)) > 0.5).astype(
                np.float32
            )
        )
        it = jnp.zeros((), jnp.int32)

        loss_v = make_loss_fn(st, cfg, schedule)

        def vmapped(p):
            totals, (parts, _nf) = jax.vmap(
                lambda ps, fs, cs, im, ms: loss_v(ps, fs, cs, None, im, ms, it)
            )(p, filters, cams, img, mask)
            return jnp.mean(totals), jax.tree_util.tree_map(jnp.mean, parts)

        loss_s = make_stacked_loss_fn(st, cfg, schedule)

        def folded(p):
            total, (parts, _nf) = loss_s(p, filters, cams, None, img, mask, it)
            return total, parts

        (tv, pv), gv = jax.value_and_grad(vmapped, has_aux=True)(params)
        (tf, pf), gf = jax.value_and_grad(folded, has_aux=True)(params)
        np.testing.assert_allclose(float(tv), float(tf), rtol=1e-6)
        for k in pv:
            if k == "bin_overflow":
                continue
            np.testing.assert_allclose(
                float(pv[k]), float(pf[k]), rtol=1e-5, err_msg=k
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(gv), jax.tree_util.tree_leaves(gf)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )
