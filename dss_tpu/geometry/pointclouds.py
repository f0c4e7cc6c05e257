"""Fixed-capacity point-cloud containers (pytree dataclasses).

The reference wraps pytorch3d's packed/padded/list `Pointclouds`
(DSS/core/cloud.py:23-279) and *re-allocates* clouds when filtering
(DSS/core/rasterizer.py:148-254).  On TPU all shapes must be static under jit,
so we keep a single padded representation `(B?, P, .)` plus boolean masks, and
every "filter" becomes a mask update — no reallocation, no recompilation.

`PointFilters` mirrors the reference's `PointCloudsFilters` (inmask /
activation / visibility triple, DSS/core/cloud.py:285-360).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from dss_tpu.utils.mathutil import eps_denom


@struct.dataclass
class PointClouds:
    """A single padded point cloud (unbatched: shapes (P, .)).

    Multi-cloud batches are expressed with vmap, which composes with pjit —
    idiomatic JAX instead of the reference's packed/padded dual representation.

    Attributes:
      points:   (P, 3) float32 positions.
      normals:  (P, 3) float32 unit normals (zeros if absent).
      features: (P, C) float32 per-point features (colors), C >= 1.
      mask:     (P,) bool — True for real points, False for padding.
    """

    points: jnp.ndarray
    normals: jnp.ndarray
    features: jnp.ndarray
    mask: jnp.ndarray

    @classmethod
    def create(
        cls,
        points: jnp.ndarray,
        normals: Optional[jnp.ndarray] = None,
        features: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        capacity: Optional[int] = None,
    ) -> "PointClouds":
        points = jnp.asarray(points, jnp.float32)
        p = points.shape[0]
        cap = capacity or p
        if normals is None:
            normals = jnp.zeros((p, 3), jnp.float32)
        if features is None:
            features = jnp.ones((p, 3), jnp.float32)
        if mask is None:
            mask = jnp.ones((p,), bool)
        normals = jnp.asarray(normals, jnp.float32)
        features = jnp.asarray(features, jnp.float32)
        mask = jnp.asarray(mask, bool)
        if cap > p:
            pad = cap - p
            points = jnp.pad(points, ((0, pad), (0, 0)))
            normals = jnp.pad(normals, ((0, pad), (0, 0)))
            features = jnp.pad(features, ((0, pad), (0, 0)))
            mask = jnp.pad(mask, (0, pad))
        return cls(points=points, normals=normals, features=features, mask=mask)

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def num_points(self) -> jnp.ndarray:
        return jnp.sum(self.mask)

    def masked_points(self, fill: float = 0.0) -> jnp.ndarray:
        return jnp.where(self.mask[:, None], self.points, fill)

    # ---- normalization (reference DSS/core/cloud.py:153-202) -------------

    def normalize_to_sphere(self) -> tuple["PointClouds", jnp.ndarray, jnp.ndarray]:
        """Center and scale so valid points fit the unit sphere.

        Returns (new_cloud, center (3,), scale ()) — apply `x*scale + center`
        to undo.
        """
        w = self.mask.astype(jnp.float32)[:, None]
        n = eps_denom(jnp.sum(w))
        center = jnp.sum(self.points * w, axis=0) / n
        centered = (self.points - center) * self.mask[:, None]
        radius = jnp.max(jnp.linalg.norm(centered, axis=-1))
        scale = eps_denom(radius)
        return (
            self.replace(points=centered / scale),
            center,
            scale,
        )

    def normalize_to_box(self) -> tuple["PointClouds", jnp.ndarray, jnp.ndarray]:
        """Center on the bbox center and scale the longest side to 2."""
        big = 1e30
        pts = jnp.where(self.mask[:, None], self.points, jnp.nan)
        lo = jnp.nanmin(pts, axis=0)
        hi = jnp.nanmax(pts, axis=0)
        center = (lo + hi) / 2.0
        scale = eps_denom(jnp.max(hi - lo) / 2.0)
        newpts = (self.points - center) / scale * self.mask[:, None]
        return self.replace(points=newpts), center, scale

    def subsample_randomly(self, key: jax.Array, ratio: float) -> "PointClouds":
        """Randomly deactivate points to approximately `ratio` of the valid set
        (reference DSS/core/cloud.py:260 returns a smaller cloud; we mask)."""
        keep = jax.random.uniform(key, (self.capacity,)) < ratio
        return self.replace(mask=self.mask & keep)


@struct.dataclass
class PointFilters:
    """Reference `PointCloudsFilters` (DSS/core/cloud.py:285-360): three boolean
    masks AND-combined to select the active subset of a cloud.

    - activation: point pruning state (learned/maintained by the model).
    - visibility: produced by the rasterizer forward pass.
    - inmask: point projects inside the GT mask (model forward).
    """

    activation: jnp.ndarray
    visibility: jnp.ndarray
    inmask: jnp.ndarray

    @classmethod
    def ones(cls, capacity: int) -> "PointFilters":
        m = jnp.ones((capacity,), bool)
        return cls(activation=m, visibility=m, inmask=m)

    def combined(self) -> jnp.ndarray:
        return self.activation & self.visibility & self.inmask
