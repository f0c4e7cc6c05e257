"""Fragment compositing — pure jnp, differentiable for free.

Replaces pytorch3d's `NormWeightedCompositor` / `weighted_sum` CUDA ops used by
the reference (DSS/core/renderer.py:2-3, 59-72; the vestigial local
DSS/csrc/weighted_sum.cu is never built, see SURVEY.md §2.4).  A gather +
weighted reduction needs no custom kernel on TPU — XLA fuses it.
"""
from __future__ import annotations

import jax.numpy as jnp


def weighted_sum(
    idx: jnp.ndarray, weights: jnp.ndarray, features: jnp.ndarray
) -> jnp.ndarray:
    """out[..., c] = Σ_k w_k · features[idx_k, c], skipping idx < 0.

    Args:
      idx: (..., K) int32 fragment point ids, -1 padded.
      weights: (..., K) fragment weights.
      features: (P, C) per-point features.
    Returns: (..., C).
    """
    valid = idx >= 0
    safe = jnp.maximum(idx, 0)
    frag_feat = features[safe]  # (..., K, C)
    w = jnp.where(valid, weights, 0.0)
    return jnp.einsum("...k,...kc->...c", w, frag_feat)


def norm_weighted_sum(
    idx: jnp.ndarray,
    weights: jnp.ndarray,
    features: jnp.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Per-pixel normalized blending: weighted_sum / max(Σ_k w_k, eps)
    (pytorch3d NormWeightedCompositor semantics, the reference default
    compositor, configs/default.yaml:31)."""
    valid = idx >= 0
    w = jnp.where(valid, weights, 0.0)
    total = jnp.sum(w, axis=-1, keepdims=True)
    out = weighted_sum(idx, weights, features)
    return out / jnp.maximum(total, eps)
