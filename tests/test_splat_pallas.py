"""Parity tests: Pallas tile-binned rasterizer vs the pure-JAX reference
implementation (the executable spec) on identical inputs — the same role the
CPU twins play for the CUDA kernels in the reference (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform
from dss_tpu.ops.splat_pallas import (
    bin_splats,
    ndc_to_pixel,
    occ_backward_pallas,
    rasterize_forward_pallas,
)
from dss_tpu.render.ewa import RasterSettings, prepare_splats
from dss_tpu.render.rasterizer import (
    _occ_backward,
    _rasterize_rows,
    visible_points_mask,
)
from tests.test_render import fibonacci_sphere


def make_splats(n=500, seed=0, image_size=64):
    """Realistic splat set from the EWA pipeline on a sphere."""
    pts = jnp.asarray(fibonacci_sphere(n, 0.5))
    normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    mask = jnp.ones((n,), bool)
    r, t = look_at_view_transform(dist=2.0, elev=15.0, azim=40.0)
    cam = FoVPerspectiveCameras.create(r, t, fov=60.0)
    st = RasterSettings(
        image_size=image_size, points_per_pixel=5, backface_culling=True
    )
    sp = prepare_splats(pts, normals, mask, cam, st)
    return sp, st


class TestBinning:
    def test_ndc_to_pixel_roundtrip(self):
        s = 64
        # pixel center c maps to ndc 1-(2c+1)/s; ndc_to_pixel inverts it.
        c = jnp.arange(s, dtype=jnp.float32)
        ndc = 1.0 - (2.0 * c + 1.0) / s
        np.testing.assert_allclose(ndc_to_pixel(ndc, s), c, atol=1e-4)

    def test_bin_splats_covers_aabb(self):
        # One splat at ndc (0,0) with radius covering the whole image must be
        # listed in every tile.
        pts = jnp.array([[0.0, 0.0, 1.0]])
        radii = jnp.array([[1.0, 1.0]])
        b = bin_splats(
            pts, jnp.ones((1, 3)), jnp.ones((1,)), radii,
            image_size=64, tile_size=32, bin_capacity=8,
        )
        assert int((b.tile_counts > 0).sum()) == 4
        np.testing.assert_array_equal(np.asarray(b.tile_ids[:, 0]), 0)

    def test_bin_splats_small_splat_one_tile(self):
        # Tiny splat in the up-left quadrant (+x,+y ndc → low pixel indices).
        pts = jnp.array([[0.5, 0.5, 1.0]])
        radii = jnp.array([[0.01, 0.01]])
        b = bin_splats(
            pts, jnp.ones((1, 3)), jnp.ones((1,)), radii,
            image_size=64, tile_size=32, bin_capacity=8,
        )
        counts = np.asarray(b.tile_counts).reshape(2, 2)
        assert counts[0, 0] == 1 and counts.sum() == 1

    def test_depth_sorted_within_tile(self):
        key = jax.random.PRNGKey(0)
        pts = jnp.concatenate(
            [
                jax.random.uniform(key, (50, 2), minval=-0.2, maxval=0.2),
                jax.random.uniform(jax.random.PRNGKey(1), (50, 1), minval=0.5, maxval=3.0),
            ],
            axis=-1,
        )
        radii = jnp.full((50, 2), 0.05)
        b = bin_splats(
            pts, jnp.ones((50, 3)), jnp.ones((50,)), radii,
            image_size=64, tile_size=32, bin_capacity=64,
        )
        z = np.asarray(b.tile_data[:, 2, :])
        ids = np.asarray(b.tile_ids)
        for tile in range(z.shape[0]):
            zz = z[tile][ids[tile] >= 0]
            assert np.all(np.diff(zz) >= -1e-6)

    def test_overflow_reported(self):
        pts = jnp.zeros((20, 3)).at[:, 2].set(1.0)
        radii = jnp.full((20, 2), 0.01)
        b = bin_splats(
            pts, jnp.ones((20, 3)), jnp.ones((20,)), radii,
            image_size=64, tile_size=32, bin_capacity=4,
        )
        assert int(b.overflow) == 16  # 20 candidates, capacity 4

    def test_masked_median_matches_nanmedian(self):
        from dss_tpu.ops.splat_pallas import masked_median

        rng = np.random.default_rng(11)
        for n, frac in [(101, 0.5), (100, 0.3), (7, 1.0), (5, 0.0)]:
            vals = jnp.asarray(rng.standard_normal(n).astype(np.float32))
            mask = jnp.asarray(rng.random(n) < frac)
            got = float(masked_median(vals, mask))
            if not bool(mask.any()):
                assert got == 0.0
            else:
                want = float(np.median(np.asarray(vals)[np.asarray(mask)]))
                np.testing.assert_allclose(got, want, rtol=1e-6)


class TestOverflowSurfacing:
    """The pallas backend's static binning budgets must be observable at
    runtime (VERDICT: 'silent truncation in practice'); Fragments.overflow
    carries the exact fwd+occ-bwd dropped-candidate count."""

    def _render(self, settings):
        from dss_tpu.render.renderer import render_single_view

        pts = jnp.asarray(fibonacci_sphere(200, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        colors = jnp.full_like(pts, 0.6)
        mask = jnp.ones((200,), bool)
        r, t = look_at_view_transform(dist=2.0, elev=15.0, azim=40.0)
        cam = FoVPerspectiveCameras.create(r, t, fov=60.0)
        _, frags, _ = render_single_view(
            pts, normals, colors, mask, cam, None, settings
        )
        return frags

    def test_clean_render_reports_zero(self):
        st = RasterSettings(
            image_size=64, points_per_pixel=5, backend="pallas",
            tile_size=16, bin_capacity=256,
        )
        assert int(self._render(st).overflow) == 0

    def test_span_overflow_reported(self):
        # Large backward support (scaler 50 ≈ whole image) with a 1-tile
        # span budget must report dropped occ-backward candidates.
        st = RasterSettings(
            image_size=64, points_per_pixel=5, backend="pallas",
            tile_size=16, bin_capacity=256, max_tiles_per_splat=1,
            radii_backward_scaler=50.0,
        )
        assert int(self._render(st).overflow) > 0

    def test_train_step_metric(self):
        from dss_tpu.models.point_model import PointModelParams
        from dss_tpu.training.trainer import (
            AnnealSchedule,
            TrainConfig,
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        pts = jnp.asarray(fibonacci_sphere(128, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        params = PointModelParams.create(pts, normals, jnp.full_like(pts, 0.6))
        r, t = look_at_view_transform(dist=2.0, elev=10.0, azim=20.0)
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        st = RasterSettings(image_size=32, points_per_pixel=3, backend="pallas",
                            tile_size=16, bin_capacity=128)
        optimizer = make_optimizer()
        step = make_train_step(optimizer, st, TrainConfig(), AnnealSchedule())
        state = create_train_state(params, optimizer)
        img = jnp.zeros((1, 32, 32, 3))
        mask_img = jnp.ones((1, 32, 32))
        _, metrics = step(state, cams, None, img, mask_img)
        assert "bin_overflow" in metrics
        assert int(metrics["bin_overflow"]) == 0

    def test_caps_scale_with_point_budget(self):
        """Default bin capacities must scale with the live point budget in
        the concentrated regime (6k < P <= 20k): the busiest tile's
        candidate count measured ~0.29·P forward / ~0.56·P backward on the
        E20 10k cloud (scripts/diag_overflow.py) — the old fixed 2048 floor
        silently dropped 27.8k backward pairs/iter (BENCHMARKS.md round 4).
        P <= 6k keeps 2048 (5k flagship measured max 1246/2389; no extra
        block DMA on the headline bench); P > 20k keeps the dense-cloud
        rule (radii shrink with point spacing)."""
        from dss_tpu.ops.splat_pallas import _bwd_tile_budget
        from dss_tpu.render.renderer import _tile_config

        st = RasterSettings(image_size=512, points_per_pixel=5,
                            backend="pallas")

        def caps(p):
            tc = _tile_config(p, st)
            return tc[1], _bwd_tile_budget(tc, p)[1]

        fwd5, bwd5 = caps(5000)
        fwd10, bwd10 = caps(10000)
        fwd20, bwd20 = caps(20000)
        fwd100, bwd100 = caps(100000)
        # 5k regime unchanged (the headline bench shape)
        assert (fwd5, bwd5) == (2048, 2048)
        # 10k/20k cover the measured occupancies with margin
        assert fwd10 >= 2874 and bwd10 >= 5616  # measured @10k, scaler 5
        assert fwd20 >= 2 * 2874 and bwd20 >= 2 * 5616  # ~linear in P
        # monotone within the concentrated regime
        assert fwd20 >= fwd10 and bwd20 >= bwd10
        # dense rule untouched (4·P/n_tiles, measured fine at 100k)
        assert fwd100 == 4 * 100096 // 64 // 128 * 128 or fwd100 >= 6144


class TestForwardParity:
    @pytest.mark.parametrize("image_size", [32, 64])
    def test_matches_reference(self, image_size):
        sp, st = make_splats(n=400, image_size=image_size)
        dmt = jnp.float32(0.05)
        ref = _rasterize_rows(
            sp.pts_screen, sp.ellipse_params, sp.cutoff, sp.radii,
            dmt, image_size, 5, 8,
        )
        out = rasterize_forward_pallas(
            sp.pts_screen, sp.ellipse_params, sp.cutoff, sp.radii,
            dmt, image_size, 5, tile_size=16, bin_capacity=256,
            chunk=128, max_tiles_xy=4,
        )
        ref_idx, ref_z, ref_q, ref_occ = ref
        idx, z, q, occ = out
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))
        # Fragment sets must match per pixel (order may differ on z ties).
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), axis=-1), np.sort(np.asarray(ref_idx), axis=-1)
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(z), axis=-1),
            np.sort(np.asarray(ref_z), axis=-1),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(q), axis=-1),
            np.sort(np.asarray(ref_q), axis=-1),
            atol=1e-4,
        )

    def test_mxu_quadric_matches_elementwise(self):
        """The MXU-quadric conic evaluation (RasterSettings.mxu_quadric — a
        measured perf negative on v5e, kept behind the flag) must reproduce
        the elementwise path: same fragment sets, q within the tile-centered
        cancellation bound (~1e-5), occupancy identical."""
        sp, st = make_splats(n=400, image_size=64)
        dmt = jnp.float32(0.05)
        base = rasterize_forward_pallas(
            sp.pts_screen, sp.ellipse_params, sp.cutoff, sp.radii,
            dmt, 64, 5, tile_size=16, bin_capacity=256,
            chunk=128, max_tiles_xy=4, mxu_quadric=False,
        )
        quad = rasterize_forward_pallas(
            sp.pts_screen, sp.ellipse_params, sp.cutoff, sp.radii,
            dmt, 64, 5, tile_size=16, bin_capacity=256,
            chunk=128, max_tiles_xy=4, mxu_quadric=True,
        )
        np.testing.assert_array_equal(np.asarray(quad[3]), np.asarray(base[3]))
        np.testing.assert_array_equal(
            np.sort(np.asarray(quad[0]), axis=-1),
            np.sort(np.asarray(base[0]), axis=-1),
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(quad[2]), axis=-1),
            np.sort(np.asarray(base[2]), axis=-1),
            atol=2e-4,
        )

    def test_depth_merge_parity(self):
        # Two stacked splats beyond the merge window.
        pts = jnp.array(
            [[0.0, 0.0, 1.0], [0.01, 0.0, 1.5], [0.6, 0.0, 1.0]], jnp.float32
        )
        ellipse = jnp.tile(jnp.array([[44.4, 0.0, 44.4]]), (3, 1))
        cutoff = jnp.ones((3,))
        radii = jnp.full((3, 2), 0.15)
        dmt = jnp.float32(0.05)
        args = (pts, ellipse, cutoff, radii, dmt)
        ref = _rasterize_rows(*args, 32, 3, 8)
        out = rasterize_forward_pallas(*args, 32, 3, tile_size=16, bin_capacity=128)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), atol=1e-6)


class TestBackwardParity:
    def test_occ_backward_matches_reference(self):
        sp, st = make_splats(n=300, image_size=32)
        dmt = jnp.float32(0.05)
        idx, z, q, occ = _rasterize_rows(
            sp.pts_screen, sp.ellipse_params, sp.cutoff, sp.radii, dmt, 32, 5, 8
        )
        visible = visible_points_mask(idx, sp.pts_screen.shape[0])
        key = jax.random.PRNGKey(3)
        grad_occ = jax.random.normal(key, (32, 32))

        ref = _occ_backward(
            sp.pts_screen, sp.radii, visible, grad_occ, jnp.float32(3.0), 32, 8
        )
        out = occ_backward_pallas(
            sp.pts_screen, sp.radii, visible, grad_occ, jnp.float32(3.0), 32,
            tile_size=16, bin_capacity=1024, chunk=128, max_tiles_xy=8,
        )
        # atol 5e-4: sorted_segment_sum computes segment sums as differences
        # of f32 prefix sums — a segment whose true sum cancels to 0 can keep
        # a ±2^-13 residue (1e-6 of the ~1e2 gradient scale) whose sign/size
        # depends on XLA's cumsum tree shape.
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=5e-4)


class TestRendererBackendParity:
    def test_end_to_end_backends_match(self):
        """Full render (shading + rasterize + composite) must agree between
        the reference and pallas backends, including gradients."""
        import jax

        from dss_tpu.render.renderer import render_single_view
        from dss_tpu.render.lighting import DirectionalLights

        pts = jnp.asarray(fibonacci_sphere(300, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        colors = jnp.broadcast_to(jnp.array([0.7, 0.4, 0.3]), pts.shape)
        mask = jnp.ones((300,), bool)
        r, t = look_at_view_transform(dist=2.0, elev=20.0, azim=50.0)
        cam = FoVPerspectiveCameras.create(r, t, fov=60.0)
        lights = DirectionalLights.create()

        def run(backend, lean=True):
            st = RasterSettings(
                image_size=32, points_per_pixel=5, backface_culling=True,
                backend=backend, tile_size=16, bin_capacity=256,
                lean_fragments=lean,
            )

            def loss(p):
                rgba, _, vis = render_single_view(
                    p, normals, colors, mask, cam, lights, st
                )
                return jnp.mean((rgba - 0.2) ** 2), (rgba, vis)

            (l, (rgba, vis)), g = jax.value_and_grad(loss, has_aux=True)(pts)
            return l, rgba, vis, g

        l_ref, rgba_ref, vis_ref, g_ref = run("reference")
        for lean in (True, False):  # lean = training path, full = debug path
            l_pal, rgba_pal, vis_pal, g_pal = run("pallas", lean=lean)
            np.testing.assert_allclose(float(l_ref), float(l_pal), rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(rgba_ref), np.asarray(rgba_pal), atol=1e-5
            )
            np.testing.assert_array_equal(
                np.asarray(vis_ref), np.asarray(vis_pal)
            )
            np.testing.assert_allclose(
                np.asarray(g_ref), np.asarray(g_pal), rtol=1e-3, atol=1e-4
            )


class TestViewBatchedLean:
    def test_view_batched_matches_reference(self):
        """render_views on the pallas lean path folds the view axis into the
        kernel grid (rasterize_views_pallas_lean) — outputs AND gradients
        must match the per-view reference backend."""
        import jax

        from dss_tpu.render.renderer import render_views
        from dss_tpu.render.lighting import DirectionalLights

        n = 300
        pts = jnp.asarray(fibonacci_sphere(n, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        colors = jnp.broadcast_to(jnp.array([0.7, 0.4, 0.3]), pts.shape)
        mask = jnp.ones((n,), bool)
        r, t = look_at_view_transform(
            dist=jnp.full((3,), 2.0),
            elev=jnp.array([0.0, 25.0, -20.0]),
            azim=jnp.array([0.0, 80.0, 200.0]),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        lights = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (3,) + x.shape),
            DirectionalLights.create(),
        )

        def run(backend):
            st = RasterSettings(
                image_size=32, points_per_pixel=5, backface_culling=True,
                backend=backend, tile_size=16, lean_fragments=True,
            )

            def loss(p, c):
                rgba, frags, vis = render_views(
                    p, normals, c, mask, cams, lights, st
                )
                return jnp.mean((rgba - 0.2) ** 2), (rgba, vis)

            (l, (rgba, vis)), g = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True
            )(pts, colors)
            return l, rgba, vis, g

        l_ref, rgba_ref, vis_ref, (gp_ref, gc_ref) = run("reference")
        l_pal, rgba_pal, vis_pal, (gp_pal, gc_pal) = run("pallas")
        np.testing.assert_allclose(float(l_ref), float(l_pal), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rgba_ref), np.asarray(rgba_pal), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(vis_ref), np.asarray(vis_pal))
        np.testing.assert_allclose(
            np.asarray(gp_ref), np.asarray(gp_pal), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(gc_ref), np.asarray(gc_pal), rtol=1e-3, atol=1e-4
        )

    def test_tiled_io_bitwise_matches_untiled(self):
        """RasterSettings.tiled_io exchanges images in the kernels' native
        tiled layout (the forward untile and the backward re-tile transposes
        drop off the hot path); it is a pure relayout, so forward images AND
        gradients must be BITWISE identical to the untiled path after
        untile_images."""
        import jax

        from dss_tpu.ops.splat_pallas import tile_images, untile_images
        from dss_tpu.render.renderer import render_views

        n = 300
        s = 64
        pts = jnp.asarray(fibonacci_sphere(n, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        colors = jnp.broadcast_to(jnp.array([0.7, 0.4, 0.3]), pts.shape)
        mask = jnp.ones((n,), bool)
        r, t = look_at_view_transform(
            dist=jnp.full((2,), 2.0),
            elev=jnp.array([0.0, 25.0]),
            azim=jnp.array([0.0, 80.0]),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        base = RasterSettings(
            image_size=s, points_per_pixel=5, backface_culling=True,
            backend="pallas", tile_size=32, lean_fragments=True,
        )
        rng = np.random.default_rng(3)
        tgt = jnp.asarray(rng.uniform(0, 1, (2, s, s, 4)).astype(np.float32))
        tgt_t = tile_images(tgt, 32)
        assert np.array_equal(np.asarray(untile_images(tgt_t, s)), np.asarray(tgt))

        def run(settings, target):
            def loss(p, c):
                rgba, _, vis = render_views(
                    p, normals, c, mask, cams, None, settings
                )
                return jnp.sum(jnp.abs(rgba - target)), (rgba, vis)

            (l, (rgba, vis)), g = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True
            )(pts, colors)
            return l, rgba, vis, g

        _, rgba_u, vis_u, (gp_u, gc_u) = run(base, tgt)
        _, rgba_t, vis_t, (gp_t, gc_t) = run(base.replace(tiled_io=True), tgt_t)
        np.testing.assert_array_equal(
            np.asarray(rgba_u), np.asarray(untile_images(rgba_t, s))
        )
        np.testing.assert_array_equal(np.asarray(vis_u), np.asarray(vis_t))
        np.testing.assert_array_equal(np.asarray(gp_u), np.asarray(gp_t))
        np.testing.assert_array_equal(np.asarray(gc_u), np.asarray(gc_t))

    def test_tiled_io_reference_backend_honors_layout(self):
        """Non-pallas backends tile the final rgba so the tiled_io layout
        contract holds for every backend (the loss code never branches)."""
        from dss_tpu.ops.splat_pallas import untile_images
        from dss_tpu.render.renderer import render_views

        n = 200
        s = 32
        pts = jnp.asarray(fibonacci_sphere(n, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        colors = jnp.broadcast_to(jnp.array([0.7, 0.4, 0.3]), pts.shape)
        mask = jnp.ones((n,), bool)
        r, t = look_at_view_transform(
            dist=jnp.full((2,), 2.0),
            elev=jnp.array([0.0, 25.0]),
            azim=jnp.array([0.0, 80.0]),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        base = RasterSettings(
            image_size=s, points_per_pixel=5, backend="reference",
            tile_size=16,
        )
        rgba_u, _, _ = render_views(pts, normals, colors, mask, cams, None, base)
        rgba_t, _, _ = render_views(
            pts, normals, colors, mask, cams, None, base.replace(tiled_io=True)
        )
        assert rgba_t.shape == (2, (s // 16) ** 2, 4, 16 * 16)
        np.testing.assert_array_equal(
            np.asarray(rgba_u), np.asarray(untile_images(rgba_t, s))
        )


class TestSortedSegmentSum:
    """sorted_segment_sum replaces scatter-add segment sums on hot paths
    (TPU scatters serialize); it must match jax.ops.segment_sum exactly in
    structure and closely in value (cumsum reassociation)."""

    def test_matches_scatter_segment_sum(self):
        from dss_tpu.ops.splat_pallas import sorted_segment_sum

        rng = np.random.default_rng(7)
        n, p = 10_000, 257
        # ids in [0, p]: id == p is the dump bucket (dropped)
        seg = jnp.asarray(rng.integers(0, p + 1, size=(n,), dtype=np.int32))
        vals = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        got = sorted_segment_sum(vals, seg, p)
        want = jax.ops.segment_sum(vals, seg, num_segments=p + 1)[:p]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    def test_empty_and_singleton_segments(self):
        from dss_tpu.ops.splat_pallas import sorted_segment_sum

        seg = jnp.asarray([0, 0, 3, 5], dtype=jnp.int32)  # 1, 2, 4 empty
        vals = jnp.asarray([[1.0], [2.0], [4.0], [8.0]])
        got = np.asarray(sorted_segment_sum(vals, seg, 6))[:, 0]
        np.testing.assert_allclose(got, [3.0, 0.0, 0.0, 4.0, 0.0, 8.0])

    def test_all_dumped(self):
        from dss_tpu.ops.splat_pallas import sorted_segment_sum

        seg = jnp.full((5,), 4, dtype=jnp.int32)
        vals = jnp.ones((5, 2))
        got = np.asarray(sorted_segment_sum(vals, seg, 4))
        np.testing.assert_allclose(got, np.zeros((4, 2)))

    def test_precision_at_production_scale(self):
        """ADVICE r1: each segment sum is a difference of a single global f32
        cumsum — bound the cancellation error at real fragment counts (~2M
        values into 5k points, heavy-tailed magnitudes) against an f64 direct
        segment sum.  Measured ~3e-5 of the RMS segment magnitude; gate 1e-3."""
        from dss_tpu.ops.splat_pallas import sorted_segment_sum

        rng = np.random.default_rng(0)
        n, p = 2_100_000, 5000
        vals = (
            rng.standard_normal((n, 2)) * rng.lognormal(0.0, 2.0, (n, 1))
        ).astype(np.float32)
        seg = rng.integers(0, p, n).astype(np.int32)
        got = np.asarray(
            sorted_segment_sum(jnp.asarray(vals), jnp.asarray(seg), p)
        )
        want = np.zeros((p, 2))
        np.add.at(want, seg, vals.astype(np.float64))
        scale = np.sqrt(np.mean(want**2))
        assert np.abs(got - want).max() <= 1e-3 * scale


class TestMatmulSegmentSum:
    """segment_sum_views_matmul (RasterSettings.matmul_scatter): the MXU
    one-hot outer-product scatter must match the sort+cumsum path (it is
    MORE accurate — direct sums instead of global-cumsum differences)."""

    def test_matches_sorted_segment_sum(self):
        from dss_tpu.ops.splat_pallas import (
            segment_sum_views_matmul,
            sorted_segment_sum,
        )

        rng = np.random.default_rng(3)
        v, n, c, p = 3, 9000, 3, 641
        seg = jnp.asarray(rng.integers(0, p + 1, size=(v, n), dtype=np.int32))
        vals = jnp.asarray(rng.standard_normal((v, c, n)).astype(np.float32))
        got = segment_sum_views_matmul(vals, seg, p)
        want = jax.vmap(
            lambda va, sg: sorted_segment_sum(va.T, sg, p)
        )(vals, seg)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )

    def test_dump_bucket_and_padding(self):
        """num_segments ids drop; the chunk padding (seg=p, vals=0) must not
        leak into any real segment — p and p-1 share a 128-block (hi=p//128),
        the adversarial case for the hi/lo split."""
        from dss_tpu.ops.splat_pallas import segment_sum_views_matmul

        p = 129  # p-1=128 → hi=1/lo=0; dump p → hi=1/lo=1 (same hi block)
        seg = jnp.asarray([[0, 128, 128, 129, 129]], dtype=jnp.int32)
        vals = jnp.asarray([[[1.0, 2.0, 4.0, 64.0, 64.0]]])
        got = np.asarray(segment_sum_views_matmul(vals, seg, p))[0, :, 0]
        assert got[0] == 1.0 and got[128] == 6.0
        assert np.all(got[1:128] == 0.0)

    def test_end_to_end_gradients_match_sorted_path(self):
        """Flag-on vs flag-off through the full view-batched lean render:
        gradients to points and colors must agree (the only change is the
        scatter algorithm; interpret-mode f32 dots make it exact here)."""
        from dss_tpu.geometry.cameras import (
            FoVPerspectiveCameras,
            look_at_view_transform,
        )
        from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
        from dss_tpu.render.ewa import RasterSettings, compute_vrk_h_global
        from dss_tpu.render.renderer import render_views

        verts, faces = ico_sphere(level=3, radius=0.5)
        pts_np, normals_np = sample_points_from_mesh(verts, faces, 600)
        pts, normals = jnp.asarray(pts_np), jnp.asarray(normals_np)
        colors = jnp.full_like(pts, 0.6)
        mask = jnp.ones((600,), bool)
        r, t = look_at_view_transform(
            dist=jnp.full((2,), 2.0),
            elev=jnp.asarray([-10.0, 20.0]),
            azim=jnp.asarray([0.0, 120.0]),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)

        def grads(mms):
            s = RasterSettings(
                image_size=64, points_per_pixel=5, cutoff_threshold=1.0,
                Vrk_invariant=True, Vrk_isotropic=False,
                backface_culling=True, matmul_scatter=mms,
            )

            def loss(p_, c_):
                vh = compute_vrk_h_global(p_, mask)
                rgba, _, _ = render_views(
                    p_, normals, c_, mask, cams, None, s, vrk_h=vh
                )
                return jnp.mean(rgba[..., :3]) + jnp.mean(rgba[..., 3] ** 2)

            return jax.grad(loss, argnums=(0, 1))(pts, colors)

        g_sorted = grads(False)
        g_matmul = grads(True)
        for a, b in zip(g_sorted, g_matmul):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )


class TestDepthChannel:
    """RasterSettings.depth_channel: weighted view-space depth Σw·z/Σw on
    every backend, with z gradients through the compositor's depth column
    (lean) / the zbuf scatter (reference) — the same locally-constant-weights
    semantics, so values AND gradients must agree across backends."""

    def _scene(self, n_views=2):
        pts = jnp.asarray(fibonacci_sphere(300, 0.5))
        normals = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        colors = jnp.broadcast_to(jnp.array([0.7, 0.4, 0.3]), pts.shape)
        mask = jnp.ones((300,), bool)
        r, t = look_at_view_transform(
            dist=jnp.full((n_views,), 2.0),
            elev=jnp.linspace(0.0, 25.0, n_views),
            azim=jnp.linspace(0.0, 80.0, n_views),
        )
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        return pts, normals, colors, mask, cams

    def test_depth_matches_reference_with_gradients(self):
        """Lean pallas weighted depth (and its z-grads) vs the reference
        backend's fragment-built weighted depth — plus the fragment pallas
        path, which forms it from zbuf/qvalue/frag_scaler."""
        from dss_tpu.render.renderer import render_views

        pts, normals, colors, mask, cams = self._scene()

        def run(backend, lean):
            st = RasterSettings(
                image_size=32, points_per_pixel=5, backface_culling=True,
                backend=backend, tile_size=16, bin_capacity=256,
                lean_fragments=lean, depth_channel=True,
            )

            def loss(p):
                rgba, frags, _ = render_views(
                    p, normals, colors, mask, cams, None, st
                )
                d = frags.wdepth
                covered = d > 0.0
                # rgb + silhouette + depth: exercises every gradient path
                return (
                    jnp.mean((rgba - 0.2) ** 2)
                    + jnp.mean(jnp.where(covered, jnp.abs(d - 1.8), 0.0))
                ), d

            (l, d), g = jax.value_and_grad(loss, has_aux=True)(pts)
            return l, d, g

        l_ref, d_ref, g_ref = run("reference", lean=False)
        for lean in (True, False):
            l_pal, d_pal, g_pal = run("pallas", lean=lean)
            np.testing.assert_allclose(float(l_ref), float(l_pal), rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(d_ref), np.asarray(d_pal), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(g_ref), np.asarray(g_pal), rtol=1e-3, atol=1e-4
            )

    def test_single_splat_depth_and_grad_exact(self):
        """One splat covering a pixel: wdepth equals that splat's view z
        exactly (the weighted mean is a no-op) and d(loss)/dz equals the
        pixel count of covered pixels times the cotangent."""
        from dss_tpu.render.renderer import render_views

        pts = jnp.asarray([[0.0, 0.0, 0.0]])
        normals = jnp.asarray([[0.0, 0.0, 1.0]])
        colors = jnp.asarray([[1.0, 1.0, 1.0]])
        mask = jnp.ones((1,), bool)
        r, t = look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
        cams = FoVPerspectiveCameras.create(r, t, fov=60.0)
        st = RasterSettings(
            image_size=16, points_per_pixel=5, backface_culling=False,
            backend="pallas", tile_size=16, bin_capacity=128,
            lean_fragments=True, depth_channel=True,
        )

        def depth_sum(p):
            _, frags, _ = render_views(p, normals, colors, mask, cams, None, st)
            covered = frags.wdepth > 0.0
            return (
                jnp.sum(jnp.where(covered, frags.wdepth, 0.0)),
                jnp.sum(covered),
            )

        (total, n_cov), g = jax.value_and_grad(
            depth_sum, has_aux=True
        )(pts)
        n_cov = int(n_cov)
        assert n_cov > 0
        np.testing.assert_allclose(float(total), 2.0 * n_cov, rtol=1e-5)
        # d(Σ depth)/dz = n_cov exactly (w/Σw = 1 per covered pixel); view z
        # increases as the point moves toward -Z in world space here, so
        # compare magnitude through the camera transform by FD instead
        eps = 1e-3
        t_p = float(depth_sum(pts + jnp.asarray([[0, 0, eps]]))[0])
        t_m = float(depth_sum(pts - jnp.asarray([[0, 0, eps]]))[0])
        fd = (t_p - t_m) / (2 * eps)
        np.testing.assert_allclose(float(g[0, 2]), fd, rtol=1e-3)

    def test_tiled_io_depth_bitwise_matches_untiled(self):
        """depth_channel under tiled_io: wdepth arrives in tile order and is
        bitwise equal to the untiled run after untiling; z-grads identical."""
        from dss_tpu.ops.splat_pallas import tile_images, untile_images
        from dss_tpu.render.renderer import render_views

        pts, normals, colors, mask, cams = self._scene()
        s = 64
        base = RasterSettings(
            image_size=s, points_per_pixel=5, backface_culling=True,
            backend="pallas", tile_size=32, lean_fragments=True,
            depth_channel=True,
        )
        rng = np.random.default_rng(7)
        tgt = jnp.asarray(rng.uniform(1.0, 3.0, (2, s, s)).astype(np.float32))

        def run(settings, target):
            def loss(p):
                _, frags, _ = render_views(
                    p, normals, colors, mask, cams, None, settings
                )
                d = frags.wdepth
                return jnp.sum(jnp.where(d > 0, jnp.abs(d - target), 0.0)), d

            (l, d), g = jax.value_and_grad(loss, has_aux=True)(pts)
            return l, d, g

        l_u, d_u, g_u = run(base, tgt)
        l_t, d_t, g_t = run(base.replace(tiled_io=True), tile_images(tgt, 32))
        # the scalar loss sums in a different order across layouts — ulp-level
        # only; the depth images and gradients must be bitwise equal
        np.testing.assert_allclose(float(l_u), float(l_t), rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(d_u), np.asarray(untile_images(d_t, s))
        )
        np.testing.assert_array_equal(np.asarray(g_u), np.asarray(g_t))

    def test_rgb_unchanged_by_depth_channel(self):
        """Adding the depth column must not perturb rgb/occ outputs or their
        gradients (bitwise: the first four compositor columns are the same
        math in the same order)."""
        from dss_tpu.render.renderer import render_views

        pts, normals, colors, mask, cams = self._scene()

        def run(dch):
            st = RasterSettings(
                image_size=32, points_per_pixel=5, backface_culling=True,
                backend="pallas", tile_size=16, bin_capacity=256,
                lean_fragments=True, depth_channel=dch,
            )

            def loss(p, c):
                rgba, _, _ = render_views(p, normals, c, mask, cams, None, st)
                return jnp.mean((rgba - 0.2) ** 2), rgba

            (l, rgba), g = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True
            )(pts, colors)
            return rgba, g

        rgba_off, g_off = run(False)
        rgba_on, g_on = run(True)
        np.testing.assert_array_equal(np.asarray(rgba_off), np.asarray(rgba_on))
        for a, b in zip(g_off, g_on):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
