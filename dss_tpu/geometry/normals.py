"""PCA normal / local-frame / curvature estimation.

Replaces the reference's `estimate_pointcloud_local_coord_frames`
(DSS/utils/mathHelper.py:34-110), which runs batched SVD on kNN neighborhoods
through the torch-batch-svd cuSOLVER binding.  Here the neighborhood covariance
eigendecomposition is XLA's batched 3x3 `eigh` — fully vectorized on TPU.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dss_tpu.geometry.knn import knn_points, masked_gather
from dss_tpu.utils.mathutil import eps_denom, normalize


@partial(jax.jit, static_argnames=("neighborhood_size", "disambiguate_directions"))
def estimate_local_coord_frames(
    points: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    neighborhood_size: int = 8,
    disambiguate_directions: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point PCA frame from the kNN neighborhood (self included).

    Returns:
      curvatures: (P, 3) eigenvalues of the neighborhood covariance / K,
        ascending (index 0 ~ normal direction).
      frames: (P, 3, 3) with columns = principal directions in ascending
        eigenvalue order (frames[:, :, 0] is the normal direction).
    """
    p = points.shape[0]
    if mask is None:
        mask = jnp.ones((p,), bool)

    _, idx = knn_points(points, points, mask, mask, k=neighborhood_size)
    nn = masked_gather(points, idx)  # (P, K, 3)
    valid = (idx >= 0).astype(points.dtype)[..., None]  # (P, K, 1)
    cnt = eps_denom(jnp.sum(valid, axis=1))  # (P, 1)
    mean = jnp.sum(nn * valid, axis=1) / cnt
    centered = (nn - mean[:, None, :]) * valid
    cov = jnp.einsum("pki,pkj->pij", centered, centered) / neighborhood_size
    curvatures, frames = jnp.linalg.eigh(cov)  # ascending

    if disambiguate_directions:
        # Flip normals to point from the neighborhood centroid toward the point
        # (reference optional disambiguation, mathHelper.py:94-106).
        n = frames[:, :, 0]
        outward = points - mean
        s = jnp.where(jnp.sum(n * outward, axis=-1, keepdims=True) < 0, -1.0, 1.0)
        frames = frames.at[:, :, 0].multiply(s)

    return curvatures, frames


def estimate_normals(
    points: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    neighborhood_size: int = 8,
    reference_normals: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """PCA normals; optionally sign-aligned to `reference_normals`
    (reference estimate_pointcloud_normals, mathHelper.py:113-147)."""
    _, frames = estimate_local_coord_frames(points, mask, neighborhood_size)
    n = frames[:, :, 0]
    if reference_normals is not None:
        s = jnp.where(jnp.sum(n * reference_normals, axis=-1, keepdims=True) < 0, -1.0, 1.0)
        n = n * s
    return normalize(n)
