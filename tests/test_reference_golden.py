"""Reference-anchored correctness gate (BASELINE.md quality gate).

The goldens in tests/golden/reference_cpu_*.npz were produced by COMPILING AND
RUNNING the reference's own CPU rasterizer
(/root/reference/DSS/csrc/rasterize_points_cpu.cpp via
scripts/gen_reference_goldens.py) on EWA inputs stored alongside the outputs.
These tests pin dss_tpu's rasterizer — both the pure-JAX spec and the Pallas
backend — against yifita/DSS's own numbers: if the NDC flip, the depth-merge
rule, the top-K selection, or the occ-backward field ever deviates from the
reference, these fail.  (Previously the golden was self-referential —
VERDICT.md Missing #1.)

Tolerances: fragments are compared exactly (idx) / to float32 round-off
(zbuf, qvalue); the composited image must match to <= 1e-3 pixel RMSE
(BASELINE.md: "≤ 1e-3 pixel RMSE vs reference renders").
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from dss_tpu.render.rasterizer import _occ_backward, _zbuf_backward, rasterize_points

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SCENES = ["reference_cpu_teapot256", "reference_cpu_synthetic128"]


@pytest.fixture(scope="module", params=SCENES)
def golden(request):
    path = os.path.join(GOLDEN_DIR, request.param + ".npz")
    return dict(np.load(path))


def _run_spec(g):
    return rasterize_points(
        int(g["image_size"]),
        int(g["points_per_pixel"]),
        32,
        jnp.asarray(g["pts_screen"]),
        jnp.asarray(g["ellipse_params"]),
        jnp.asarray(g["cutoff"]),
        jnp.asarray(g["radii"]),
        float(g["depth_merging_threshold"]),
        1.0,
    )


def _sort_frags(idx, zbuf, qvalue):
    """Order fragments per pixel by (z, idx) to neutralize equal-z tie order,
    keeping -1 padding at the end."""
    key = np.where(idx >= 0, zbuf, np.inf) + 1e-9 * np.where(idx >= 0, idx, 0)
    order = np.argsort(key, axis=-1, kind="stable")
    tk = lambda a: np.take_along_axis(a, order, axis=-1)
    return tk(idx), tk(zbuf), tk(qvalue)


class TestForwardFragments:
    def test_spec_matches_reference(self, golden):
        idx, zbuf, qvalue, occ = map(np.asarray, _run_spec(golden))

        np.testing.assert_array_equal(occ, golden["occupancy"])

        gi, gz, gq = _sort_frags(
            golden["idx"], golden["zbuf"], golden["qvalue"]
        )
        oi, oz, oq = _sort_frags(idx, zbuf, qvalue)
        np.testing.assert_array_equal(oi, gi)
        np.testing.assert_allclose(oz, gz, atol=1e-6, rtol=1e-6)
        # q is a*dx²+b*dxdy+c*dy² with conic coefficients up to ~4e3:
        # float32 evaluation-order differences reach ~1e-4 absolute.
        np.testing.assert_allclose(oq, gq, atol=5e-4, rtol=1e-4)

    def test_pallas_matches_reference(self, golden):
        from dss_tpu.ops.splat_pallas import rasterize_points_pallas

        s = int(golden["image_size"])
        p = golden["pts_screen"].shape[0]
        tile = 16 if s <= 128 else 32
        tile_config = (tile, -(-p // 8) * 8, 8, 16)
        scaler = jnp.ones((p,))
        colors = jnp.ones((p, 3))
        idx, zbuf, qvalue, occ, _, _, _, overflow = rasterize_points_pallas(
            s,
            int(golden["points_per_pixel"]),
            tile_config,
            jnp.asarray(golden["pts_screen"]),
            jnp.asarray(golden["ellipse_params"]),
            jnp.asarray(golden["cutoff"]),
            jnp.asarray(golden["radii"]),
            float(golden["depth_merging_threshold"]),
            1.0,
            scaler,
            colors,
        )
        assert int(overflow) == 0
        np.testing.assert_array_equal(np.asarray(occ), golden["occupancy"])
        gi, gz, gq = _sort_frags(
            golden["idx"], golden["zbuf"], golden["qvalue"]
        )
        oi, oz, oq = _sort_frags(*map(np.asarray, (idx, zbuf, qvalue)))
        np.testing.assert_array_equal(oi, gi)
        np.testing.assert_allclose(oz, gz, atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(oq, gq, atol=5e-4, rtol=1e-4)

    def test_composited_image_rmse(self, golden):
        """BASELINE.md quality gate: <= 1e-3 pixel RMSE vs the image
        composited from the reference's fragments."""
        idx, zbuf, qvalue, occ = map(np.asarray, _run_spec(golden))
        p = golden["pts_screen"].shape[0]
        rng = np.random.default_rng(7)
        colors = rng.random((p + 1, 3)).astype(np.float32)
        colors[-1] = 0.0  # idx -1 slot

        def composite(idx, qvalue):
            w = np.where(idx >= 0, np.exp(-0.5 * np.maximum(qvalue, 0.0)), 0.0)
            c = colors[idx]  # (S,S,K,3); -1 indexes the zero row
            num = (w[..., None] * c).sum(-2)
            return num / np.maximum(w.sum(-1)[..., None], 1e-10)

        ours = composite(idx, qvalue)
        ref = composite(golden["idx"], golden["qvalue"])
        rmse = float(np.sqrt(np.mean((ours - ref) ** 2)))
        assert rmse <= 1e-3, f"pixel RMSE vs reference render: {rmse}"


class TestOccBackward:
    def test_field_matches_reference(self, golden):
        """Whole-image support: the reference-CPU box rule and dss_tpu's
        CUDA-style disc rule coincide (see scripts/gen_reference_goldens.py),
        isolating the shared semantics — NDC flip, validity rejects, the
        asymmetric grad>0∧outside-splat rule, and the d/max(‖d‖²,ε) field."""
        pts = jnp.asarray(golden["pts_screen"])
        radii = jnp.asarray(golden["radii"])
        s = int(golden["image_size"])
        # scaler making the median-radius disc cover all of NDC (diam 2√2<4)
        scaler = 4.0 / float(np.median(golden["radii"]))
        grad_xy = np.asarray(
            _occ_backward(
                pts,
                radii,
                jnp.ones((pts.shape[0],), bool),
                jnp.asarray(golden["grad_occ"]),
                scaler,
                s,
                32,
            )
        )
        want = golden["grad_pts_xy_wide"]
        # The d/max(‖d‖²,ε) field is singular at pixel centers: for points
        # within ~3e-4 NDC of an active pixel, last-ulp differences between
        # the two PixToNdc evaluation orders are amplified without bound, and
        # the ε itself diverges (reference CPU 1e-8 vs CUDA+dss_tpu 1e-10).
        # Exclude those few points; everything else must match.
        pix = golden["grad_occ"] != 0.0
        ys, xs = np.nonzero(pix)
        xf = 1.0 - (2.0 * xs + 1.0) / s
        yf = 1.0 - (2.0 * ys + 1.0) / s
        d2 = (xf[None, :] - pts[:, 0:1]) ** 2 + (yf[None, :] - pts[:, 1:2]) ** 2
        keep = np.asarray(d2.min(axis=1) >= 1e-7)
        assert (~keep).sum() <= 10
        denom = np.maximum(np.abs(want[keep]), 1.0)
        np.testing.assert_allclose(
            grad_xy[keep] / denom, want[keep] / denom, atol=6e-3
        )

    def test_finite_radius_matches_reference(self, golden):
        """FINITE support (mid-anneal scaler) — the path training actually
        uses.  Here the reference-CPU support rule (skip iff |dx|>rx·s AND
        |dy|>ry·s, rasterize_points_cpu.cpp:464 — a per-point cross) and
        dss_tpu's CUDA-rule global disc (‖d‖ ≤ median(radii)·s,
        rasterize_points_backward.cu:150-158) genuinely diverge, so the
        comparison corrects the support-rule delta analytically: golden +
        Σ(disc-only contributions) − Σ(cross-only contributions) must equal
        dss_tpu's output.  Everything OUTSIDE the delta — the validity
        rejects, the asymmetric grad>0∧outside-splat rule, and the
        d/max(‖d‖²,ε) field over the (large) region where both rules agree —
        is thereby pinned against the reference execution at finite radius.
        Non-vacuity: the CPU cross rule keeps infinite strip arms (the skip
        needs BOTH axes to exceed), so no point is fully delta-free; instead
        the test asserts the agreed-region contribution magnitude exceeds
        the correction for most points (all of them, on the teapot), i.e.
        the comparison is dominated by reference-pinned signal."""
        pts = np.asarray(golden["pts_screen"])
        radii = np.asarray(golden["radii"])
        s = int(golden["image_size"])
        scaler = float(golden["radii_backward_scaler_finite"])
        g_img = golden["grad_occ_finite"]
        p = pts.shape[0]

        grad_xy = np.asarray(
            _occ_backward(
                jnp.asarray(pts),
                jnp.asarray(radii),
                jnp.ones((p,), bool),
                jnp.asarray(g_img),
                scaler,
                s,
                32,
            )
        )

        # Active pixels in NDC (reference convention: index-reversed).
        ys, xs = np.nonzero(g_img != 0.0)
        g = g_img[ys, xs].astype(np.float64)
        xf = 1.0 - (2.0 * xs + 1.0) / s
        yf = 1.0 - (2.0 * ys + 1.0) / s

        # Same pooled-median disc radius _occ_backward derives (visible=all).
        cur_r = float(np.median(radii)) * scaler
        pt_ok = (
            (pts[:, 2] >= 0.0)
            & (np.abs(pts[:, 0]) <= 1.0)
            & (np.abs(pts[:, 1]) <= 1.0)
        )

        corr = np.zeros((p, 2), np.float64)
        inter_mag = np.zeros((p,), np.float64)
        d2min = np.full((p,), np.inf)
        for i in range(0, p, 2048):
            sl = slice(i, min(i + 2048, p))
            dx = xf[None, :] - pts[sl, 0:1]
            dy = yf[None, :] - pts[sl, 1:2]
            dist2 = dx * dx + dy * dy
            d2min[sl] = dist2.min(axis=1)
            outside_splat = (np.abs(dx) > radii[sl, 0:1]) | (
                np.abs(dy) > radii[sl, 1:2]
            )
            gate = pt_ok[sl, None] & ~((g[None, :] > 0.0) & outside_splat)
            in_cross = ~(
                (np.abs(dx) > radii[sl, 0:1] * scaler)
                & (np.abs(dy) > radii[sl, 1:2] * scaler)
            )
            in_disc = dist2 <= cur_r * cur_r
            delta = gate & (in_cross != in_disc)
            w = g[None, :] / np.maximum(dist2, 1e-8)
            signed = np.where(delta, np.where(in_disc, w, -w), 0.0)
            corr[sl, 0] = (signed * dx).sum(axis=1)
            corr[sl, 1] = (signed * dy).sum(axis=1)
            w_agree = np.where(gate & in_disc & in_cross, w, 0.0)
            inter_mag[sl] = np.abs(w_agree * dx).sum(axis=1) + np.abs(
                w_agree * dy
            ).sum(axis=1)

        want = golden["grad_pts_xy_finite"].astype(np.float64) + corr

        # Singular-pixel exclusion, as in the wide-radius test.
        keep = d2min >= 1e-7
        assert (~keep).sum() <= 10

        # Non-vacuous: the reference-pinned agreed region must carry more
        # contribution magnitude than the analytic correction for most
        # points (100% on the teapot; the synthetic scene's wild radii mix
        # makes its cross arms relatively larger).
        ok = keep & pt_ok
        dominated = float(
            (np.abs(corr[ok]).sum(axis=1) < inter_mag[ok]).mean()
        )
        assert dominated > 0.5, f"agreed-region-dominant fraction {dominated}"

        denom = np.maximum(np.abs(want), 1.0)
        np.testing.assert_allclose(
            grad_xy[keep] / denom[keep], want[keep] / denom[keep], atol=6e-3
        )

    def test_zbuf_backward_matches_reference(self, golden):
        p = golden["pts_screen"].shape[0]
        grad_z = np.asarray(
            _zbuf_backward(
                jnp.asarray(golden["idx"]), jnp.asarray(golden["grad_zbuf"]), p
            )
        )
        np.testing.assert_allclose(
            grad_z, golden["grad_pts_z"], atol=1e-5, rtol=1e-5
        )
