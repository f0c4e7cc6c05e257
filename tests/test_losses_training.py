"""Tests for image losses, surface regularizers, and the jitted train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
from dss_tpu.geometry.pointclouds import PointFilters
from dss_tpu.models.point_model import (
    PointModelParams,
    point_model_forward,
    sample_image_at_ndc,
)
from dss_tpu.render.ewa import RasterSettings
from dss_tpu.training.losses import (
    build_knn,
    dr_loss,
    get_phi,
    iou_loss,
    l1_loss,
    l2_loss,
    projection_loss,
    repulsion_loss,
    smape_loss,
)
from dss_tpu.training.trainer import (
    AnnealSchedule,
    TrainConfig,
    chamfer_distance,
    create_train_state,
    make_loss_fn,
    make_optimizer,
    make_train_step,
    psnr,
)
from tests.test_render import fibonacci_sphere


class TestImageLosses:
    def test_l1_l2_smape(self):
        x = jnp.array([1.0, 2.0, 3.0])
        y = jnp.array([1.5, 2.0, 2.0])
        np.testing.assert_allclose(l1_loss(x, y), 0.5, atol=1e-6)
        np.testing.assert_allclose(l2_loss(x, y), (0.25 + 1.0) / 3, atol=1e-6)
        assert float(smape_loss(x, y)) > 0

    def test_l1_masked(self):
        x = jnp.array([1.0, 100.0])
        y = jnp.array([0.0, 0.0])
        m = jnp.array([True, False])
        np.testing.assert_allclose(l1_loss(x, y, mask=m), 1.0, atol=1e-6)

    def test_iou(self):
        a = jnp.ones((1, 4, 4))
        np.testing.assert_allclose(iou_loss(a, a), 0.0, atol=1e-6)
        b = jnp.zeros((1, 4, 4))
        np.testing.assert_allclose(iou_loss(a, b), 1.0, atol=1e-6)

    def test_dr_loss_parts(self):
        img = jnp.ones((2, 8, 8, 3)) * 0.5
        pred = jnp.ones((2, 8, 8, 3)) * 0.25
        m = jnp.ones((2, 8, 8))
        total, parts = dr_loss(img, pred, m, m)
        np.testing.assert_allclose(parts["loss_dr_rgb"], 0.25, atol=1e-5)
        np.testing.assert_allclose(parts["loss_dr_silhouette"], 0.0, atol=1e-5)
        np.testing.assert_allclose(total, 0.25, atol=1e-5)


class TestSurfaceLosses:
    @pytest.fixture(scope="class")
    def flat_cloud(self):
        key = jax.random.PRNGKey(0)
        xy = jax.random.uniform(key, (300, 2), minval=-1.0, maxval=1.0)
        pts = jnp.concatenate([xy, jnp.zeros((300, 1))], axis=-1)
        normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (300, 1))
        mask = jnp.ones((300,), bool)
        return pts, normals, mask

    def test_phi_positive_decreasing(self, flat_cloud):
        pts, _, mask = flat_cloud
        knn = build_knn(pts, mask, knn_k=8)
        phi = get_phi(knn)
        assert phi.shape == (300, 7)
        assert bool(jnp.all(phi >= 0)) and bool(jnp.all(phi <= 1))
        # nearest neighbor gets the largest weight
        assert bool(jnp.all(phi[:, 0] >= phi[:, -1] - 1e-6))

    def test_projection_zero_on_plane(self, flat_cloud):
        pts, normals, mask = flat_cloud
        lp = projection_loss(pts, normals, mask)
        np.testing.assert_allclose(lp, 0.0, atol=1e-8)
        # lift one point off the plane -> positive loss pulling it back
        pts2 = pts.at[0, 2].set(0.05)
        lp2 = projection_loss(pts2, normals, mask)
        assert float(lp2) > 1e-9
        g = jax.grad(lambda p: projection_loss(p, normals, mask))(pts2)
        assert float(g[0, 2]) > 0  # gradient pushes the point down to the plane

    def test_repulsion_prefers_spread(self, flat_cloud):
        pts, normals, mask = flat_cloud
        # clumped cloud = two near-duplicate clusters
        clumped = jnp.concatenate(
            [pts[:150], pts[:150] + jnp.array([1e-3, 0.0, 0.0])], axis=0
        )
        l_spread = repulsion_loss(pts, normals, mask)
        l_clump = repulsion_loss(clumped, normals, mask)
        assert float(l_clump) > float(l_spread) - 0.2  # clumps not favored
        g = jax.grad(lambda p: repulsion_loss(p, normals, mask))(clumped)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0

    def test_normal_consistency_anchors_to_pca(self):
        from dss_tpu.training.losses import normal_consistency_loss
        from tests.test_render import fibonacci_sphere

        pts = jnp.asarray(fibonacci_sphere(500, 1.0))
        mask = jnp.ones((500,), bool)
        good = pts  # unit sphere: radial normals
        rng = np.random.default_rng(0)
        bad = jnp.asarray(rng.standard_normal((500, 3)).astype(np.float32))
        assert float(normal_consistency_loss(pts, good, mask)) < 1e-3
        assert float(normal_consistency_loss(pts, bad, mask)) > 0.3
        # gradient flows to normals, not points (PCA target is detached)
        gn = jax.grad(lambda n: normal_consistency_loss(pts, n, mask))(bad)
        assert float(jnp.abs(gn).max()) > 0
        gp = jax.grad(lambda p: normal_consistency_loss(p, good, mask))(pts)
        np.testing.assert_allclose(gp, 0.0, atol=1e-6)

    def test_normal_consistency_jet_anchor(self):
        """anchor='jet' pulls a noisy field toward the jet-fit normals of
        the geometry: optimizing ONLY this loss recovers GT normals on a
        sphere with noisy points, and ends closer to GT than the PCA
        anchor does (the in-training version of apps/refine_normals,
        VERDICT r3 ask #4)."""
        import optax

        from dss_tpu.training.losses import normal_consistency_loss
        from dss_tpu.utils.mathutil import normalize
        from tests.test_render import fibonacci_sphere

        rng = np.random.default_rng(1)
        gt = jnp.asarray(fibonacci_sphere(600, 1.0))
        pts = gt * (1.0 + 0.01 * rng.standard_normal((600, 1)).astype(np.float32))
        mask = jnp.ones((600,), bool)
        # noisy start: GT + strong tangential perturbation
        noisy = normalize(
            gt + 0.6 * jnp.asarray(rng.standard_normal((600, 3)), jnp.float32)
        )

        def train(anchor, k):
            loss = jax.jit(
                lambda n: normal_consistency_loss(
                    pts, n, mask, neighborhood_size=k, anchor=anchor
                )
            )
            opt = optax.adam(0.05)
            n, st = noisy, opt.init(noisy)
            for _ in range(60):
                g = jax.grad(loss)(n)
                up, st = opt.update(g, st)
                n = n + up
            return normalize(n)

        def cos_gt(n):
            return float(jnp.mean(jnp.abs(jnp.sum(n * gt, -1))))

        start = cos_gt(noisy)
        jet = cos_gt(train("jet", 32))
        pca = cos_gt(train("pca", 32))
        assert jet > 0.98, f"jet anchor did not recover normals: {jet}"
        assert jet >= pca - 1e-3, (jet, pca)
        assert jet > start + 0.1, (start, jet)

    def test_masked_points_ignored(self, flat_cloud):
        pts, normals, mask = flat_cloud
        # add garbage padding points, masked out
        pts_pad = jnp.concatenate([pts, jnp.full((50, 3), 1e6)], axis=0)
        normals_pad = jnp.concatenate([normals, jnp.zeros((50, 3))], axis=0)
        mask_pad = jnp.concatenate([mask, jnp.zeros((50,), bool)])
        lp = projection_loss(pts_pad, normals_pad, mask_pad)
        np.testing.assert_allclose(lp, 0.0, atol=1e-8)


class TestModelAndTrainStep:
    def _setup(self):
        pts = jnp.asarray(fibonacci_sphere(400, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        params = PointModelParams.create(
            pts, normals, jnp.full_like(pts, 0.5)
        )
        r, t = look_at_view_transform(
            dist=jnp.array([2.0, 2.0]),
            elev=jnp.array([0.0, 20.0]),
            azim=jnp.array([0.0, 120.0]),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        settings = RasterSettings(image_size=32, points_per_pixel=3)
        return params, cams, settings

    def test_sample_image_at_ndc(self):
        img = jnp.arange(16.0).reshape(1, 4, 4)
        # center of pixel (1, 2): ndc x for col 2 with align_corners=False:
        # x = (c + 0.5) / W * 2 - 1 = 0.25; y row 1 -> -0.25
        v = sample_image_at_ndc(img, jnp.array([[[0.25, -0.25]]]))
        np.testing.assert_allclose(v, [[6.0]], atol=1e-5)

    def test_model_forward_filters(self):
        params, cams, settings = self._setup()
        filters = PointFilters.ones(params.points.shape[0])
        mask_img = jnp.ones((2, 32, 32))
        out, nf = point_model_forward(
            params, filters, cams, None, settings, mask_img=mask_img
        )
        assert out["img_pred"].shape == (2, 32, 32, 3)
        assert out["mask_img_pred"].shape == (2, 32, 32)
        assert int(nf.visibility.sum()) > 50
        # full GT mask -> inmask == visibility
        np.testing.assert_array_equal(np.asarray(nf.inmask), np.asarray(nf.visibility))

    def test_anneal_schedule(self):
        sch = AnnealSchedule(
            init_backward_radii=10.0,
            steps_backward_radii=200,
            gamma_backward_radii=0.9,
            limit_backward_radii=2.0,
        )
        np.testing.assert_allclose(sch.backward_radii(jnp.int32(0)), 10.0)
        np.testing.assert_allclose(sch.backward_radii(jnp.int32(200)), 9.0)
        np.testing.assert_allclose(sch.backward_radii(jnp.int32(10**6)), 2.0)

    def test_train_step_reduces_loss(self):
        params, cams, settings = self._setup()
        optimizer = make_optimizer()
        state = create_train_state(params, optimizer)
        cfg = TrainConfig(lambda_proj=0.01, lambda_repel=0.01)
        schedule = AnnealSchedule()
        step = make_train_step(optimizer, settings, cfg, schedule)

        # Target: render of the *initial* cloud shifted — use a blank target to
        # simply check the machinery: loss finite, params move, filters update.
        img = jnp.zeros((2, 32, 32, 3))
        mask_img = jnp.zeros((2, 32, 32))
        mask_img = mask_img.at[:, 8:24, 8:24].set(1.0)

        losses = []
        for _ in range(3):
            state, metrics = step(state, cams, None, img, mask_img)
            assert bool(metrics["params_finite"])
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert int(state.step) == 3
        # points should have moved
        assert float(jnp.abs(state.params.points - params.points).max()) > 0

    def test_train_trajectory_pinned_pallas(self):
        """Full-stack regression lock: 4 deterministic train steps on the
        pallas backend must reproduce a pinned loss trajectory.  The round-2
        kernel rework (fast table build + view-batched grid) reproduced the
        flagship E5/E8 runs bit-for-bit — this pins that property at test
        scale so any future semantics drift in shading/EWA/kernels/losses/
        optimizer fails loudly.  (Regenerate the constants deliberately if a
        semantics change is intended.)"""
        params, cams, settings = self._setup()
        settings = settings.replace(backend="pallas", tile_size=16)
        optimizer = make_optimizer()
        state = create_train_state(params, optimizer)
        cfg = TrainConfig(lambda_proj=0.01, lambda_repel=0.01)
        schedule = AnnealSchedule()
        step = jax.jit(make_train_step(optimizer, settings, cfg, schedule))

        img = jnp.full((2, 32, 32, 3), 0.25)
        mask_img = jnp.zeros((2, 32, 32)).at[:, 8:24, 8:24].set(1.0)
        losses = []
        for _ in range(4):
            state, metrics = step(state, cams, None, img, mask_img)
            losses.append(float(metrics["loss"]))
        # Regenerated (round 3) for the matmul_scatter default (MXU one-hot
        # scatter replaces sort+cumsum segment sums): same math, different
        # f32 association — step 1 (pre-update loss) is bit-identical,
        # steps 2-4 drift <0.8% through Adam.  (Previous pin, sentinel-merge
        # sorted_segment_sum: [0.308618, 0.741177, 0.520276, 0.407514].)
        pinned = [0.308618, 0.738219, 0.522067, 0.410642]
        np.testing.assert_allclose(losses, pinned, rtol=1e-4)

    def test_depth_loss_drives_z_gradients(self):
        """λ_depth alone produces point gradients through _zbuf_backward —
        the z-grad path (reference rasterize_points.cu:823-885) as a USED
        training capability, not just a parity artifact."""
        params, cams, settings = self._setup()
        settings = settings.replace(lean_fragments=False)
        filters = PointFilters.ones(params.points.shape[0])
        # GT = the scene rendered from a slightly shrunk cloud → nonzero
        # depth residual on covered pixels
        gt_params = params.replace(points=params.points * 0.95)
        out_gt, _ = point_model_forward(
            gt_params, filters, cams, None, settings
        )
        depth_img = out_gt["depth_pred"]
        mask_img = out_gt["mask_img_pred"]
        img = out_gt["img_pred"]

        cfg = TrainConfig(
            lambda_rgb=0.0, lambda_silhouette=0.0, lambda_depth=1.0
        )
        loss_fn = make_loss_fn(settings, cfg, AnnealSchedule())
        (total, (parts, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(
            params, filters, cams, None, img, mask_img,
            jnp.zeros((), jnp.int32), depth_img,
        )
        assert float(parts["loss_dr_depth"]) > 1e-4
        g = np.asarray(grads.points)
        assert np.isfinite(g).all()
        # with rgb/silhouette off, any point gradient came through the depth
        # term; zbuf only depends on view-space z, so the z-grad path fired
        assert np.abs(g).max() > 0.0

    def test_depth_loss_on_lean_depth_channel(self):
        """λ_depth on the LEAN path via the weighted-depth compositor channel
        (settings.depth_channel), including under tiled_io with pre-tiled
        targets — the full-speed training configuration for depth
        supervision (no fragment buffers)."""
        from dss_tpu.ops.splat_pallas import tile_images

        params, cams, settings = self._setup()
        filters = PointFilters.ones(params.points.shape[0])
        for tiled in (False, True):
            sett = settings.replace(
                backend="pallas", tile_size=16, lean_fragments=True,
                depth_channel=True, tiled_io=tiled,
            )
            gt_params = params.replace(points=params.points * 0.95)
            out_gt, _ = point_model_forward(
                gt_params, filters, cams, None, sett,
            )
            depth_img = out_gt["depth_pred"]
            mask_img = out_gt["mask_img_pred"]
            img = out_gt["img_pred"]
            mask_plain = None
            if tiled:
                # the GT mask in row/col layout for the in-mask sampling
                mask_plain = jnp.zeros((2, 32, 32)).at[:, 8:24, 8:24].set(1.0)

            cfg = TrainConfig(
                lambda_rgb=0.0, lambda_silhouette=0.0, lambda_depth=1.0
            )
            loss_fn = make_loss_fn(sett, cfg, AnnealSchedule())
            (total, (parts, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(
                params, filters, cams, None, img, mask_img,
                jnp.zeros((), jnp.int32), depth_img, mask_plain,
            )
            assert float(parts["loss_dr_depth"]) > 1e-4, f"tiled={tiled}"
            g = np.asarray(grads.points)
            assert np.isfinite(g).all()
            assert np.abs(g).max() > 0.0, f"tiled={tiled}"

    def test_depth_loss_requires_depth_batch(self):
        """λ_depth > 0 without a depth batch is a config error, not a silent
        no-op.  (The zbuf-carrying-path requirement can only trip on the
        pallas lean path — the reference backend always carries zbuf.)"""
        params, cams, settings = self._setup()
        filters = PointFilters.ones(params.points.shape[0])
        cfg = TrainConfig(lambda_depth=1.0)
        loss_fn = make_loss_fn(settings, cfg, AnnealSchedule())
        img = jnp.zeros((2, 32, 32, 3))
        mask_img = jnp.zeros((2, 32, 32))
        with pytest.raises(ValueError, match="lambda_depth"):
            loss_fn(params, filters, cams, None, img, mask_img,
                    jnp.zeros((), jnp.int32), None)

    def test_chamfer(self):
        x = jnp.asarray(fibonacci_sphere(200, 1.0))
        cd, cn = chamfer_distance(x, x, x, x)
        np.testing.assert_allclose(cd, 0.0, atol=1e-5)
        np.testing.assert_allclose(cn, 0.0, atol=1e-5)
        y = x * 1.1
        cd2, _ = chamfer_distance(x, y)
        assert float(cd2) > 0

    def test_psnr(self):
        a = jnp.ones((4, 4, 3)) * 0.5
        assert float(psnr(a, a)) > 100
        b = jnp.zeros((4, 4, 3))
        np.testing.assert_allclose(psnr(a, b), -10 * np.log10(0.25), atol=1e-3)


class TestConvergence:
    def test_toy_inverse_rendering_converges(self):
        """End-to-end sanity: optimizing an offset sphere toward rendered
        targets of the true sphere must reduce the loss substantially."""
        gt_pts = jnp.asarray(fibonacci_sphere(300, 0.5))
        gt_n = gt_pts / jnp.linalg.norm(gt_pts, axis=-1, keepdims=True)
        colors = jnp.full_like(gt_pts, 0.6)
        mask = jnp.ones((300,), bool)
        r, t = look_at_view_transform(
            dist=jnp.full((4,), 2.0),
            elev=jnp.array([0.0, 20.0, -20.0, 10.0]),
            azim=jnp.array([0.0, 90.0, 180.0, 270.0]),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        settings = RasterSettings(image_size=24, points_per_pixel=3)

        from dss_tpu.models.point_model import point_model_forward

        gt_params = PointModelParams.create(gt_pts, gt_n, colors)
        filters0 = PointFilters.ones(300)
        out_gt, _ = point_model_forward(gt_params, filters0, cams, None, settings)
        img = out_gt["img_pred"]
        mask_img = out_gt["mask_img_pred"]

        # init: sphere offset by 0.25
        init = PointModelParams.create(gt_pts + jnp.array([0.25, 0.1, 0.0]), gt_n, colors)
        optimizer = make_optimizer(lr_points=0.02, lr_normals=0.01, lr_colors=0.0)
        state = create_train_state(init, optimizer)
        step = make_train_step(
            optimizer, settings, TrainConfig(lambda_proj=0.01, lambda_repel=0.01),
            AnnealSchedule(init_backward_radii=5.0, steps_backward_radii=-1),
        )
        losses = []
        for _ in range(40):
            state, metrics = step(state, cams, None, img, mask_img)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.7, f"no convergence: {losses[0]} -> {losses[-1]}"
        # the cloud moved toward the target (center offset shrinks)
        off0 = 0.269  # |(0.25, 0.1, 0)|
        off1 = float(jnp.linalg.norm(jnp.mean(state.params.points, 0) - jnp.mean(gt_pts, 0)))
        assert off1 < off0 * 0.7, f"center offset did not shrink: {off1}"


def test_prune_dead_points():
    """Points far outside every silhouette get exactly-zero gradients and are
    pruned; points shaping the silhouette stay (reference Model.prune_points,
    point_modeling.py:114-133)."""
    from dss_tpu.models.point_model import prune_dead_points

    pts = jnp.asarray(fibonacci_sphere(200, 0.4))
    # 20 stray points far off to the side (visible nowhere near the mask)
    stray = jnp.tile(jnp.array([[5.0, 5.0, 0.0]]), (20, 1))
    allpts = jnp.concatenate([pts, stray])
    normals = allpts / jnp.maximum(jnp.linalg.norm(allpts, axis=-1, keepdims=True), 1e-9)
    params = PointModelParams.create(allpts, normals)
    filters = PointFilters.ones(220)
    r, t = look_at_view_transform(
        dist=jnp.array([2.0, 2.0]), elev=jnp.array([0.0, 30.0]), azim=jnp.array([0.0, 120.0])
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    settings = RasterSettings(image_size=24, points_per_pixel=3)
    mask_gt = jnp.ones((2, 24, 24))
    active = prune_dead_points(params, filters, cams, settings, mask_gt)
    # sphere points overwhelmingly kept; stray points dropped
    # with only 2 views, back-facing-everywhere points are legitimately dead
    assert float(active[:200].mean()) > 0.45
    assert not bool(active[200:].any())


def test_prune_outside_silhouette():
    """Floaters off the surface project outside the object mask in many
    views and are pruned; every true surface point survives (it projects
    inside the silhouette in all views, GT-free hull consistency)."""
    from dss_tpu.models.point_model import (
        prune_outside_silhouette,
        render_model,
    )

    pts = jnp.asarray(fibonacci_sphere(400, 0.5))
    normals = pts / jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
    r, t = look_at_view_transform(
        dist=jnp.full((8,), 2.0),
        elev=jnp.asarray([0.0, 20.0, -20.0, 40.0, 0.0, 15.0, -30.0, 10.0]),
        azim=jnp.asarray([0.0, 45.0, 90.0, 135.0, 180.0, 225.0, 270.0, 315.0]),
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    settings = RasterSettings(image_size=48, points_per_pixel=3)
    masks = render_model(
        PointModelParams.create(pts, normals),
        PointFilters.ones(400),
        cams,
        None,
        settings,
    )[..., 3]

    # floaters at 1.4-2x the radius — off-surface but still near the object,
    # like the yoga6 stragglers the criterion was measured on
    floaters = jnp.asarray(
        [[0.9, 0.0, 0.0], [0.0, -0.75, 0.3], [-0.5, 0.6, -0.4]]
    )
    allpts = jnp.concatenate([pts, floaters])
    keep = prune_outside_silhouette(allpts, cams, masks, outside_frac=0.2)
    assert bool(keep[:400].all()), "true surface points must survive"
    assert not bool(keep[400:].any()), "floaters must be pruned"


def test_prune_depth_inconsistent():
    """Interior floaters project inside the silhouette in EVERY view (the
    hull test keeps them) but never lie on the front depth surface; the
    depth-consistency prune removes exactly those.  True surface points
    are front-most in at least one of 8 surrounding views and survive."""
    from dss_tpu.models.point_model import (
        prune_depth_inconsistent,
        prune_outside_silhouette,
    )

    # dense enough that every in-silhouette pixel receives a FRONT-surface
    # point: at 4k pts the z-buffer has shadow gaps whose min depth is the
    # back surface, which a mid-depth floater can accidentally match
    n = 12000
    pts = jnp.asarray(fibonacci_sphere(n, 0.5))
    r, t = look_at_view_transform(
        dist=jnp.full((8,), 2.0),
        elev=jnp.asarray([0.0, 20.0, -20.0, 40.0, 0.0, 15.0, -30.0, 10.0]),
        azim=jnp.asarray([0.0, 45.0, 90.0, 135.0, 180.0, 225.0, 270.0, 315.0]),
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)

    # analytic point z-buffer with the renderer's NDC convention: project,
    # scatter-min view-space z per pixel, background = zfar
    size, zfar = 64, 10.0
    view_z = cams.transform_points_world_to_view(pts)[..., 2]  # (V, P)
    p_ndc = jnp.clip(-cams.transform_points_screen(pts)[..., :2], -1.0, 1.0)
    ix = jnp.clip(
        jnp.round((p_ndc[..., 0] + 1.0) * (size / 2.0) - 0.5), 0, size - 1
    ).astype(jnp.int32)
    iy = jnp.clip(
        jnp.round((p_ndc[..., 1] + 1.0) * (size / 2.0) - 0.5), 0, size - 1
    ).astype(jnp.int32)
    depth = jnp.full((8, size, size), zfar)
    depth = jax.vmap(
        lambda d, yy, xx, z: d.at[yy, xx].min(z)
    )(depth, iy, ix, view_z)

    # interior floaters: strictly inside the hull, so every view's mask
    # contains them — but they sit BEHIND the front surface everywhere
    interior = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.1, -0.05, 0.1], [-0.15, 0.1, 0.0]]
    )
    allpts = jnp.concatenate([pts, interior])

    masks = (depth < zfar).astype(jnp.float32)
    keep_hull = prune_outside_silhouette(allpts, cams, masks)
    assert bool(keep_hull[n:].all()), (
        "silhouette hull must NOT catch interior floaters (that blindness "
        "is what the depth criterion exists for)"
    )

    keep = prune_depth_inconsistent(allpts, cams, depth, tol=0.05)
    # ~1% of surface points land on silhouette-edge pixels in all their
    # front-facing views, where bilinear sampling mixes the zfar background;
    # the production recipe absorbs this with denser maps + min_views
    assert float(keep[:n].mean()) > 0.98, "surface points must survive"
    assert not bool(keep[n:].any()), "interior floaters must be pruned"


def test_reseed_coverage_fills_hole():
    """Delete a cap of a sphere; masks rendered from the FULL sphere leave a
    silhouette deficit there.  Reseeding must propose points near the hole
    (GT-free hull carving) and shrink the gt->pred Hausdorff."""
    from dss_tpu.models.point_model import render_model
    from dss_tpu.models.reseed import reseed_coverage
    from dss_tpu.training.metrics import chamfer_hausdorff

    full = jnp.asarray(fibonacci_sphere(600, 0.5))
    normals = full / jnp.maximum(
        jnp.linalg.norm(full, axis=-1, keepdims=True), 1e-9
    )
    r, t = look_at_view_transform(
        dist=jnp.full((8,), 2.0),
        elev=jnp.asarray([0.0, 20.0, -20.0, 40.0, 0.0, 15.0, -30.0, 10.0]),
        azim=jnp.asarray([0.0, 45.0, 90.0, 135.0, 180.0, 225.0, 270.0, 315.0]),
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    settings = RasterSettings(image_size=64, points_per_pixel=3)

    def alpha(pts):
        n = pts / jnp.maximum(jnp.linalg.norm(pts, -1, keepdims=True), 1e-9)
        return render_model(
            PointModelParams.create(pts, n),
            PointFilters.ones(pts.shape[0]),
            cams,
            None,
            settings,
        )[..., 3]

    gt_masks = alpha(full)
    # hole: delete the +x cap (visible edge-on from several of the views)
    keep = np.asarray(full[:, 0] < 0.35)
    holed = full[jnp.asarray(keep)]
    pred_alpha = alpha(holed)

    new_pts, near_idx = reseed_coverage(
        holed,
        jnp.ones((holed.shape[0],), bool),
        cams,
        gt_masks,
        pred_alpha,
        n_new=64,
        hull_outside_frac=0.2,
    )
    assert new_pts.shape[0] >= 8, f"only {new_pts.shape[0]} proposals"
    assert near_idx.shape == (new_pts.shape[0],)
    # proposals concentrate toward the missing cap (+x hemisphere)
    assert float(np.mean(new_pts[:, 0] > 0.0)) > 0.7
    # and they reduce the coverage tail vs the full GT sphere
    before = chamfer_hausdorff(holed, full)
    allp = jnp.concatenate([holed, jnp.asarray(new_pts)])
    after = chamfer_hausdorff(allp, full)
    assert float(after["hausdorff"]) < float(before["hausdorff"]) * 0.8, (
        float(before["hausdorff"]),
        float(after["hausdorff"]),
    )


def test_reseed_coverage_depth_guided():
    """Occluded-hole case the silhouette cannot see: delete a cap but view
    it head-on so the sphere's BACK surface still covers every ray (alpha
    stays on).  With GT depth maps, depth deficit (render's front surface
    far behind GT depth) finds it and proposals land ON the missing cap."""
    from dss_tpu.geometry.pointclouds import PointFilters as PF
    from dss_tpu.models.point_model import point_model_forward
    from dss_tpu.models.reseed import reseed_coverage

    full = jnp.asarray(fibonacci_sphere(800, 0.5))
    normals = full / jnp.maximum(
        jnp.linalg.norm(full, axis=-1, keepdims=True), 1e-9
    )
    # all 4 views look from the +x side: the -x half silhouette never shows
    r, t = look_at_view_transform(
        dist=jnp.full((4,), 2.0),
        elev=jnp.asarray([0.0, 15.0, -15.0, 5.0]),
        azim=jnp.asarray([75.0, 90.0, 105.0, 90.0]),
    )
    cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
    settings = RasterSettings(
        image_size=64, points_per_pixel=5, lean_fragments=False
    )

    def render(pts):
        n = pts / jnp.maximum(jnp.linalg.norm(pts, -1, keepdims=True), 1e-9)
        out, _ = point_model_forward(
            PointModelParams.create(pts, n),
            PF.ones(pts.shape[0]),
            cams,
            None,
            settings,
        )
        alpha = out["mask_img_pred"]
        depth = jnp.where(alpha > 0.5, out["depth_pred"], cams.zfar[0])
        return alpha, depth

    gt_alpha, gt_depth = render(full)
    keep = np.asarray(full[:, 0] < 0.35)  # delete the +x cap (facing cams)
    holed = full[jnp.asarray(keep)]
    pred_alpha, pred_depth = render(holed)

    # silhouette-only finds (almost) nothing: the back surface covers rays
    sil_pts, _ = reseed_coverage(
        holed, jnp.ones((holed.shape[0],), bool), cams, gt_alpha, pred_alpha,
        n_new=64, hull_outside_frac=0.3,
    )
    # depth-guided finds the cap
    new_pts, near_idx = reseed_coverage(
        holed, jnp.ones((holed.shape[0],), bool), cams, gt_alpha, pred_alpha,
        n_new=64, hull_outside_frac=0.3,
        gt_depths=gt_depth, pred_depths=pred_depth, depth_tol=0.1,
    )
    assert new_pts.shape[0] >= 8, (
        f"depth-guided proposals: {new_pts.shape[0]} (sil-only found "
        f"{sil_pts.shape[0]})"
    )
    # proposals sit on the missing cap: +x side, near the sphere surface
    assert float(np.mean(new_pts[:, 0] > 0.3)) > 0.8, new_pts[:, 0]
    radii = np.linalg.norm(new_pts, axis=-1)
    assert float(np.mean(np.abs(radii - 0.5) < 0.1)) > 0.8, radii
