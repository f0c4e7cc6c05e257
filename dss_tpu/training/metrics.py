"""Point-cloud quality metrics for the denoising benchmark.

Reference: scripts/evaluatePointClouds.py (36-166) — chamfer distance,
Hausdorff distance, point-to-surface (point-to-plane against the GT cloud's
local planes), and NUC-style uniformity, tabulated per shape.  The reference
depends on the uninstalled legacy `pytorch_points` package; these are clean
jnp implementations of the same metrics.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from dss_tpu.geometry.knn import knn_points, masked_gather
from dss_tpu.geometry.normals import estimate_normals
from dss_tpu.utils.mathutil import eps_denom, normalize


def chamfer_hausdorff(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    pred_mask: Optional[jnp.ndarray] = None,
    gt_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Symmetric chamfer (mean of squared NN dists both ways) and Hausdorff
    (max of directed max NN dists)."""

    def directed(a, b, am, bm):
        d, _ = knn_points(a, b, am, bm, k=1)
        d = d[:, 0]
        w = jnp.ones(a.shape[:1]) if am is None else am.astype(jnp.float32)
        d = jnp.where(jnp.isfinite(d), d, 0.0)
        mean = jnp.sum(d * w) / eps_denom(jnp.sum(w))
        mx = jnp.max(jnp.where(w > 0, d, -jnp.inf))
        return mean, jnp.sqrt(jnp.maximum(mx, 0.0))

    cd_pg, h_pg = directed(pred, gt, pred_mask, gt_mask)
    cd_gp, h_gp = directed(gt, pred, gt_mask, pred_mask)
    return {
        "chamfer": cd_pg + cd_gp,
        "hausdorff": jnp.maximum(h_pg, h_gp),
        "cd_pred2gt": cd_pg,
        "cd_gt2pred": cd_gp,
    }


def point_to_surface(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    gt_normals: Optional[jnp.ndarray] = None,
    pred_mask: Optional[jnp.ndarray] = None,
    gt_mask: Optional[jnp.ndarray] = None,
    k: int = 4,
) -> jnp.ndarray:
    """Mean |nᵢ·(x − xᵢ)| of each predicted point against the local planes of
    its GT neighbors (the reference's point-to-face proxy)."""
    if gt_normals is None:
        gt_normals = estimate_normals(gt, gt_mask, neighborhood_size=8)
    gt_normals = normalize(gt_normals)
    _, idx = knn_points(pred, gt, pred_mask, gt_mask, k=k)
    nn = masked_gather(gt, idx)
    nnn = masked_gather(gt_normals, idx)
    valid = (idx >= 0).astype(pred.dtype)
    d = jnp.abs(jnp.sum((pred[:, None, :] - nn) * nnn, axis=-1)) * valid
    per_point = jnp.sum(d, axis=-1) / eps_denom(jnp.sum(valid, axis=-1))
    w = jnp.ones(pred.shape[:1]) if pred_mask is None else pred_mask.astype(pred.dtype)
    return jnp.sum(per_point * w) / eps_denom(jnp.sum(w))


def uniformity_nuc(
    points: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    k: int = 8,
) -> jnp.ndarray:
    """NUC-style uniformity: coefficient of variation of the local kNN
    density (mean NN distance) across the cloud — 0 for perfectly uniform."""
    d, idx = knn_points(points, points, mask, mask, k=k, exclude_self=True)
    valid = (idx >= 0).astype(points.dtype)
    local = jnp.sqrt(jnp.maximum(jnp.sum(d * valid, -1) / eps_denom(jnp.sum(valid, -1)), 0.0))
    w = jnp.ones(points.shape[:1]) if mask is None else mask.astype(points.dtype)
    mean = jnp.sum(local * w) / eps_denom(jnp.sum(w))
    var = jnp.sum((local - mean) ** 2 * w) / eps_denom(jnp.sum(w))
    return jnp.sqrt(var) / eps_denom(mean)
