"""Image losses and surface regularizers.

Reference: DSS/training/losses.py — SmapeLoss (116-127), L1/L2 (130-146),
IouLoss (498-513), SurfaceLoss machinery (148-276), ProjectionLoss (282-391,
feature-preserving MLS after Öztireli et al.), RepulsionLoss (394-495).

All functions are unbatched over clouds (single (P, ·) cloud + validity mask,
matching the training workload of one shared cloud) and fully jit/vmap-able;
reductions respect the mask.  kNN comes from dss_tpu.geometry.knn instead of
pytorch3d knn_points / FRNN.
"""
from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dss_tpu.geometry.knn import grid_knn_points, knn_points, masked_gather
from dss_tpu.utils.mathutil import eps_denom, normalize

# ---------------------------------------------------------------------------
# Image losses
# ---------------------------------------------------------------------------


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    m = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * m) / eps_denom(jnp.sum(m))


def l1_loss(x, y, mask=None, weights=None):
    """Reference L1Loss (losses.py:130-137)."""
    d = jnp.abs(x - y)
    if weights is not None:
        d = d * weights
    return masked_mean(d, mask)


def l2_loss(x, y, mask=None, weights=None):
    d = (x - y) ** 2
    if weights is not None:
        d = d * weights
    return masked_mean(d, mask)


def smape_loss(x, y, mask=None, eps: float = 1e-8):
    """Relative L1 (losses.py:116-127)."""
    d = jnp.abs(x - y) / (jnp.abs(x) + jnp.abs(y) + eps)
    return masked_mean(d, mask)


def iou_loss(predict: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 − intersection/union over all non-batch dims, meaned over batch
    (losses.py:498-513)."""
    if predict.ndim == target.ndim == 2:
        predict, target = predict[None], target[None]
    dims = tuple(range(1, predict.ndim))
    inter = jnp.sum(predict * target, axis=dims)
    union = jnp.sum(predict + target - predict * target, axis=dims)
    return jnp.mean(1.0 - inter / eps_denom(union))


# ---------------------------------------------------------------------------
# Surface regularizers (projection & repulsion)
# ---------------------------------------------------------------------------


class KnnCache(NamedTuple):
    """Neighbor structure shared by the surface losses (reference
    SurfaceLoss._build_knn, losses.py:157-180: knn_k total with the self
    column dropped)."""

    dists: jnp.ndarray  # (P, K) squared dists, inf for invalid
    idx: jnp.ndarray  # (P, K) int32, -1 for invalid
    nn: jnp.ndarray  # (P, K, 3) neighbor positions (0 fill)
    valid: jnp.ndarray  # (P, K) bool


def build_knn(
    points: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    knn_k: int = 12,
    grid_threshold: Optional[int] = None,
) -> KnnCache:
    """Neighbor cache for the surface losses.

    Dispatch: brute MXU distance matmul at every size; neighbor SELECTION
    switches from exact top_k to `lax.approx_min_k` above 20k points (see
    the in-line rationale below).  The uniform-grid kNN
    (the FRNN path the reference switches to above ~20k points, SurfaceLoss
    `frnn.frnn_grid_points`, losses.py:157-180) is a measured 13-25×
    REGRESSION on TPU (bench_knn: 25k 43 ms brute / 1080 ms grid, 100k
    553 ms / 3877 ms): the grid's 27-cell candidate loads are gather-bound
    (~8 ns/row on the gather unit), while brute force is one MXU distance
    matmul + vectorized top_k.  The GPU intuition behind FRNN does not
    transfer.  Grid stays available for explicit dispatch (parity-tested
    `test_build_knn_grid_dispatch_matches_brute`) and via the
    DSS_KNN_GRID_THRESHOLD env knob for re-measurement on other hardware.
    """
    k = knn_k - 1  # reference drops the self column
    p = points.shape[0]
    if grid_threshold is None:
        grid_threshold = int(
            os.environ.get("DSS_KNN_GRID_THRESHOLD", 1_000_000_000)
        )
    if p > grid_threshold:
        grid_res = max(4, math.ceil((p / 96.0) ** 0.5))
        dists, idx = grid_knn_points(
            points, mask, k=k, exclude_self=True,
            grid_res=grid_res, bucket_size=64,
        )
    else:
        # approx_min_k (the TPU PartialReduce custom call) replaces the
        # sort-lowered top_k by DEFAULT above 20k points — measured on
        # silicon (bench_knn, post permutation fix): 3-4.5× per call
        # (25k: 14.5 ms vs 43.5 brute; 100k: 121.7 vs 552.9) at recall
        # 0.987-0.988, and the 4×25k multi-scene step drops 4.0 →
        # 0.87 s/it with per-scene chamfer identical at 60 iters
        # (BENCHMARKS.md round 5).  The ≤20k regime (flagship is 5k)
        # keeps exact brute top_k.  DSS_KNN_APPROX=1/0 forces the
        # selection on/off at every size (exact on CPU either way —
        # approx_min_k falls back to exact there).
        approx_env = os.environ.get("DSS_KNN_APPROX")
        approx = bool(int(approx_env)) if approx_env is not None else (
            p > 20000
        )
        dists, idx = knn_points(
            points, points, mask, mask, k=k, exclude_self=True,
            approx=approx,
        )
    nn = masked_gather(points, idx)
    valid = idx >= 0
    dists = jnp.where(valid, dists, 0.0)
    return KnnCache(dists=dists, idx=idx, nn=nn, valid=valid)


def get_phi(knn: KnnCache, filter_scale: float = 2.0) -> jnp.ndarray:
    """Compact spatial kernel (1 − d²/h)₊⁴ with h = 4·mean local sq-spacing
    (losses.py:261-276)."""
    valid_f = knn.valid.astype(knn.dists.dtype)
    mean_sq = jnp.sum(knn.dists * valid_f, axis=-1, keepdims=True) / eps_denom(
        jnp.sum(valid_f, axis=-1, keepdims=True)
    )
    h = mean_sq * 4.0
    w = jnp.maximum(1.0 - knn.dists / eps_denom(h), 0.0)
    w = w * w
    w = w * w
    return w * valid_f


def denoise_normals(
    normals: jnp.ndarray,
    knn: KnnCache,
    weights: jnp.ndarray,
    reliable: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Robust normal mollification: weighted neighbor average, keeping the
    original normal where `reliable` (visibility ∧ inmask) is True
    (losses.py:182-220)."""
    knn_normals = masked_gather(normals, knn.idx)
    denom = eps_denom(jnp.sum(weights, axis=-1, keepdims=True))
    averaged = jnp.sum(knn_normals * weights[..., None], axis=-2) / denom
    if reliable is not None:
        averaged = jnp.where(reliable[:, None], normals, averaged)
    return averaged


def get_normal_w(
    normals: jnp.ndarray, knn: KnnCache, sharpness_sigma: float = 0.75
) -> jnp.ndarray:
    """exp(−‖n̂−n̂ᵢ‖²/σ²) (losses.py:222-245)."""
    inv_sigma = 1.0 / (sharpness_sigma * sharpness_sigma)
    n = normalize(normals)
    nn = normalize(masked_gather(normals, knn.idx))
    diff = nn - n[:, None, :]
    w = jnp.exp(-jnp.sum(diff * diff, axis=-1) * inv_sigma)
    return w * knn.valid


def projection_loss(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: jnp.ndarray,
    visibility: Optional[jnp.ndarray] = None,
    reliable: Optional[jnp.ndarray] = None,
    knn: Optional[KnnCache] = None,
    knn_k: int = 12,
    filter_scale: float = 2.0,
    sharpness_sigma: float = 0.75,
) -> jnp.ndarray:
    """Surface-attraction regularizer (losses.py:282-391): weighted squared
    distance of each point to its neighbors' local planes.

    weights = phi · normal_w · visibility_w, where invisible neighbors are
    down-weighted to 0.1 (losses.py:338-342); spatial_w is overridden to ones
    (losses.py:292-298).  Returns the masked mean (reduction='mean').
    """
    if knn is None:
        knn = build_knn(points, mask, knn_k)
    knn_w = jax.lax.stop_gradient  # weight block is under no_grad in reference

    phi = knn_w(get_phi(knn, filter_scale))
    n_denoised = knn_w(denoise_normals(normals, knn, phi, reliable))
    normal_w = knn_w(get_normal_w(n_denoised, knn, sharpness_sigma))
    if visibility is None:
        vis_w = jnp.ones_like(phi)
    else:
        vis_nb = masked_gather(visibility.astype(points.dtype)[:, None], knn.idx)[..., 0]
        vis_w = jnp.where(vis_nb > 0.5, 1.0, 0.1)
    weights = knn_w(phi * normal_w * vis_w * knn.valid)

    knn_normals = masked_gather(n_denoised, knn.idx)
    # sdf_i = nᵢ·(xᵢ − x): neighbor positions detached (losses.py:372-375)
    sdf = jnp.sum(
        (jax.lax.stop_gradient(knn.nn) - points[:, None, :]) * knn_normals, axis=-1
    )
    per_point = jnp.sum(weights * sdf * sdf, axis=-1) / eps_denom(
        jnp.sum(weights, axis=-1)
    )
    return masked_mean(per_point, mask)


def normal_consistency_loss(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: jnp.ndarray,
    neighborhood_size: int = 8,
    anchor: str = "pca",
) -> jnp.ndarray:
    """Pull the LEARNED normal field toward a geometric normal estimate of
    the current cloud: mean(1 − cos(n̂, stopgrad(sign-aligned estimate))).

    In the reference, normals only receive gradients through shading; the
    surface losses detach their denoised normals (losses.py:182-220 under
    no_grad), which leaves the learned field noisy (observed
    chamfer_normal ≈ 0.68 on the flagship).  This regularizer anchors the
    field to the geometry without changing the surface-loss semantics; the
    target's sign is taken from the learned normal, so shading keeps
    owning the orientation.

    anchor="pca": plane-PCA estimate (k=neighborhood_size).  Measured E1:
    no headroom on a NOISY cloud (PCA of the early cloud scores worse than
    the learned field).
    anchor="jet": weighted osculating-jet fit + bilateral (the in-training
    version of apps/refine_normals, VERDICT r3 ask #4) — on a CONVERGED
    cloud the jet field scores 0.24 vs the shading plateau 0.36, so the
    anchor has real headroom where PCA has none.  Oriented by the learned
    field each step."""
    from dss_tpu.geometry.normals import estimate_normals, refine_normals

    n = normalize(normals)
    if anchor == "jet":
        target = jax.lax.stop_gradient(
            refine_normals(
                jax.lax.stop_gradient(points),
                jax.lax.stop_gradient(n),
                mask,
                neighborhood_size=max(neighborhood_size, 16),
            )
        )
    else:
        target = jax.lax.stop_gradient(
            normalize(estimate_normals(points, mask, neighborhood_size))
        )
    sign = jnp.where(
        jnp.sum(jax.lax.stop_gradient(n) * target, -1, keepdims=True) < 0,
        -1.0,
        1.0,
    )
    cos = jnp.sum(n * target * sign, axis=-1)
    return masked_mean(1.0 - cos, mask)


def repulsion_loss(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: jnp.ndarray,
    reliable: Optional[jnp.ndarray] = None,
    knn: Optional[KnnCache] = None,
    knn_k: int = 12,
    filter_scale: float = 2.0,
    sharpness_sigma: float = 0.75,
) -> jnp.ndarray:
    """Uniform-spread regularizer (losses.py:394-495): project neighbor
    offsets onto the tangent plane; loss = exp(−|repel_vec|), minimized when
    the density-weighted mean tangential offset is large."""
    if knn is None:
        knn = build_knn(points, mask, knn_k)
    sg = jax.lax.stop_gradient

    phi = sg(get_phi(knn, filter_scale))
    n_denoised = sg(denoise_normals(normals, knn, phi, reliable))

    knn_diff = points[:, None, :] - sg(knn.nn)
    knn_normals = masked_gather(n_denoised, knn.idx)
    proj = knn_diff - jnp.sum(knn_diff * knn_normals, axis=-1, keepdims=True) * knn_normals

    # spatial_w = exp(−d²·N/diag²·filter_scale) (losses.py:247-259)
    valid_pts = jnp.where(mask[:, None], points, jnp.nan)
    lo = jnp.nanmin(valid_pts, axis=0)
    hi = jnp.nanmax(valid_pts, axis=0)
    diag2 = eps_denom(jnp.sum((hi - lo) ** 2))
    n_valid = jnp.sum(mask.astype(points.dtype))
    inv_sigma_spatial = n_valid / diag2
    spatial_w = sg(
        jnp.exp(-knn.dists * inv_sigma_spatial * filter_scale) * knn.valid
    )
    normal_w = sg(get_normal_w(n_denoised, knn, sharpness_sigma))
    density_w = sg(jnp.sum(spatial_w, axis=-1, keepdims=True) + 1.0)
    weights = sg(spatial_w * normal_w)

    repel_vec = jnp.sum(proj * weights[..., None], axis=1) / eps_denom(
        jnp.sum(weights, axis=1, keepdims=True)
    )
    repel_vec = repel_vec * density_w
    per_point = jnp.exp(-jnp.abs(repel_vec))  # (P, 3)
    return masked_mean(per_point, mask[:, None])


# ---------------------------------------------------------------------------
# Combined training objective (reference Trainer.calc_dr_loss /
# calc_pcl_reg_loss, trainer.py:275-376)
# ---------------------------------------------------------------------------


def dr_loss(
    img: jnp.ndarray,
    img_pred: jnp.ndarray,
    mask_img: jnp.ndarray,
    mask_img_pred: jnp.ndarray,
    lambda_rgb: float = 1.0,
    lambda_silhouette: float = 1.0,
    tiled: bool = False,
):
    """Image losses: L1 RGB restricted to gt∧pred silhouette intersection +
    silhouette (0.01·IoU + L1 mask) (trainer.py:332-376).

    Every term is an elementwise mean/sum, so it computes identically in
    the rasterizer's tiled layout (RasterSettings.tiled_io: img/img_pred
    (V, n_tiles, 3, tt) channel axis −2, masks (V, n_tiles, tt)) — pass
    tiled=True so the silhouette mask broadcasts on the right axis.

    Returns (total, dict of parts)."""
    inter = (mask_img > 0.5) & (mask_img_pred > 0.5)
    ch_mask = inter[:, :, None, :] if tiled else inter[..., None]
    loss_rgb = l1_loss(img, img_pred, mask=ch_mask) * lambda_rgb
    loss_sil = (
        0.01 * iou_loss(mask_img.astype(img.dtype), mask_img_pred)
        + jnp.mean(jnp.abs(mask_img.astype(img.dtype) - mask_img_pred))
    ) * lambda_silhouette
    total = loss_rgb + loss_sil
    return total, {"loss_dr_rgb": loss_rgb, "loss_dr_silhouette": loss_sil}


def depth_l1_loss(
    depth: jnp.ndarray,
    depth_pred: jnp.ndarray,
    mask_img: jnp.ndarray,
) -> jnp.ndarray:
    """Masked L1 between GT dense depth and the rendered depth.

    depth (V, S, S): view-space GT depth, background = zfar (the data-gen
    convention, reference create_mvr_data_from_mesh.py:216-240).
    depth_pred (V, S, S): rendered view-space depth, -1 where uncovered —
    the weighted-depth channel (settings.depth_channel, lean path) or the
    first-fragment zbuf (lean_fragments=False).  Layout-agnostic: all three
    images may arrive in the pallas tile order under tiled_io.
    Supervision is restricted to pixels covered by BOTH the GT silhouette and
    a rendered fragment — uncovered pixels carry no depth semantics (their
    -1/zfar difference is silhouette information, already supervised by the
    mask loss).  Extension beyond the reference: it serves img.depth
    (dataset.py:71-75) but ships no depth term; this one drives the z-grad
    path (rasterize_points.cu:823-885 / rasterizer._zbuf_backward).
    """
    valid = (mask_img > 0.5) & (depth_pred > 0.0)
    return l1_loss(depth, depth_pred, mask=valid)
