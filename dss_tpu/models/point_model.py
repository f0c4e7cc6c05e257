"""Point model: the learnable parameters ARE the point cloud.

Reference: DSS/models/point_modeling.py `Model` (33-246) — nn.Parameters
(points, normals, colors) with per-group learnability, a texture (shading)
module, and the renderer; forward renders the camera batch, reduces the
visibility filter across views, and computes the `inmask` filter by sampling
the GT mask at the projected point locations (194-212).

Here the model is a pytree of parameters + pure functions; "buffers" (the
activation/visibility/inmask filters) travel in a separate state pytree so
`jax.grad` sees only the learnables.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dss_tpu.geometry.cameras import FoVPerspectiveCameras
from dss_tpu.geometry.pointclouds import PointFilters
from dss_tpu.render.ewa import RasterSettings
from dss_tpu.render.lighting import Lights
from dss_tpu.render.renderer import render_views
from dss_tpu.utils.mathutil import normalize


@struct.dataclass
class PointModelParams:
    """Learnable state (reference point_modeling.py:47-52)."""

    points: jnp.ndarray  # (P, 3)
    normals: jnp.ndarray  # (P, 3)
    colors: jnp.ndarray  # (P, 3)

    @classmethod
    def create(cls, points, normals=None, colors=None):
        points = jnp.asarray(points, jnp.float32)
        if normals is None:
            normals = jnp.zeros_like(points)
        if colors is None:
            colors = jnp.ones_like(points)
        return cls(
            points=points,
            normals=jnp.asarray(normals, jnp.float32),
            colors=jnp.asarray(colors, jnp.float32),
        )


def sample_image_at_ndc(
    images: jnp.ndarray, p_ndc: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear lookup of (V, H, W) images at (V, P, 2) NDC xy (grid_sample
    align_corners=False semantics; borders clamped — the reference uses
    reflection padding, identical inside [-1, 1] after its clamp,
    DSS/utils/__init__.py:266-317)."""
    v, h, w = images.shape
    x = (p_ndc[..., 0] + 1.0) * (w / 2.0) - 0.5
    y = (p_ndc[..., 1] + 1.0) * (h / 2.0) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def at(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        return jax.vmap(lambda img, a, b: img[a, b])(images, yy, xx)

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def point_model_forward(
    params: PointModelParams,
    filters: PointFilters,
    cameras: FoVPerspectiveCameras,
    lights: Optional[Lights],
    settings: RasterSettings,
    mask_img: Optional[jnp.ndarray] = None,
    vrk_h: Optional[jnp.ndarray] = None,
    **render_kwargs,
) -> Tuple[Dict[str, jnp.ndarray], PointFilters]:
    """Render the camera batch and update the point filters.

    Mirrors Model.forward (point_modeling.py:135-214): render all V views with
    the activation filter applied; visibility := any view rendered the point;
    inmask := point projects inside the GT mask in any view AND is visible.

    Returns ({img_pred (V,S,S,3), mask_img_pred (V,S,S)}, new_filters).
    """
    normals = normalize(params.normals)
    active = filters.activation

    # The splat kernel size h is a world-space quantity (kNN spacing) shared
    # by every view: compute it ONCE per step instead of per vmapped view
    # (the reference computes it once for the batch too — it caches _Vrk_h,
    # rasterizer.py:359-388).  At 100k points the kNN dominates per-view cost.
    if vrk_h is None:
        from dss_tpu.render.ewa import (
            compute_vrk_h_global,
            compute_vrk_h_isotropic,
        )

        if settings.Vrk_invariant:
            vrk_h = compute_vrk_h_global(params.points, active)
        elif settings.Vrk_isotropic:
            vrk_h = compute_vrk_h_isotropic(params.points, active)

    rgba, frags, visible = render_views(
        params.points,
        normals,
        params.colors,
        active,
        cameras,
        lights,
        settings,
        vrk_h=vrk_h,
        **render_kwargs,
    )
    visibility = jnp.any(visible, axis=0) & active

    if settings.tiled_io:
        # rgba is (V, n_tiles, 4, tt) — channel axis −2 (splat_pallas
        # tiled layout); predictions stay tiled for the loss.
        img_pred = rgba[:, :, :3, :]
        mask_pred = rgba[:, :, 3, :]
    else:
        img_pred = rgba[..., :3]
        mask_pred = rgba[..., 3]

    if mask_img is not None:
        p_screen = cameras.transform_points_screen(params.points)  # (V, P, 3)
        # NDC xy sign flip: image array +x right/+y down vs NDC +x left/+y up
        # (reference point_modeling.py:199-201).
        p = jnp.clip(-p_screen[..., :2], -1.0, 1.0)
        sampled = sample_image_at_ndc(mask_img.astype(jnp.float32), p)  # (V, P)
        inmask = jnp.any(sampled > 0.5, axis=0) & visibility
    else:
        inmask = filters.inmask

    new_filters = PointFilters(
        activation=active,
        visibility=jax.lax.stop_gradient(visibility),
        inmask=jax.lax.stop_gradient(inmask),
    )
    out = {
        "img_pred": img_pred,
        "mask_img_pred": mask_pred,
        # total candidates dropped by static binning budgets across views —
        # the pallas backend's "sanitizer" counter; 0 on the exact backend
        "bin_overflow": jax.lax.stop_gradient(jnp.sum(frags.overflow)),
    }
    # Per-pixel view-space depth (V, S, S; tiled layout under tiled_io),
    # -1 where uncovered.  Preferred source: the weighted-depth channel
    # (settings.depth_channel — works on the lean hot path, z-grads to every
    # contributing splat); fallback: nearest-fragment zbuf on fragment-
    # carrying paths (lean_fragments=False), z-grads through _zbuf_backward
    # (reference rasterize_points.cu z-grad path, 823-885).  The reference
    # serves img.depth (dataset.py:71-75) but ships no depth loss; dss_tpu's
    # optional lambda_depth term makes this a trained capability.
    if frags.wdepth is not None:
        out["depth_pred"] = frags.wdepth
    elif frags.zbuf.shape[-1] > 0:
        out["depth_pred"] = frags.zbuf[..., 0]
    return out, new_filters


def point_model_forward_stacked(
    params: PointModelParams,  # leaves (S, P, ...)
    filters: PointFilters,  # leaves (S, P)
    cameras: FoVPerspectiveCameras,  # leaves (S, V, ...)
    lights: Optional[Lights],
    settings: RasterSettings,
    mask_img: Optional[jnp.ndarray] = None,  # (S, V, H, W)
    **render_kwargs,
) -> Tuple[Dict[str, jnp.ndarray], PointFilters]:
    """Multi-scene point_model_forward: S independent clouds rendered in ONE
    lean kernel launch (renderer.render_views_stacked folds the scene axis
    into the kernel's view axis — vmapping point_model_forward over scenes
    would lower the Pallas call to a sequential XLA while loop).  The
    pure-jnp parts (vrk_h, filter updates, in-mask sampling) vmap over the
    scene axis as usual.  Same per-scene semantics as point_model_forward
    (parity-pinned in tests/test_parallel.py).

    Returns ({img_pred (S,V,...), mask_img_pred, bin_overflow ()},
    new_filters with (S, P) leaves)."""
    normals = normalize(params.normals)  # elementwise — scene axis free
    active = filters.activation

    vrk_h = None
    if settings.Vrk_invariant or settings.Vrk_isotropic:
        from dss_tpu.render.ewa import (
            compute_vrk_h_global,
            compute_vrk_h_isotropic,
        )

        fn = (compute_vrk_h_global if settings.Vrk_invariant
              else compute_vrk_h_isotropic)
        vrk_h = jax.vmap(fn)(params.points, active)

    from dss_tpu.render.renderer import render_views_stacked

    rgba, frags, visible = render_views_stacked(
        params.points, normals, params.colors, active,
        cameras, lights, settings, vrk_h=vrk_h, **render_kwargs,
    )
    visibility = jnp.any(visible, axis=1) & active  # (S, P)

    if settings.tiled_io:
        img_pred = rgba[:, :, :, :3, :]
        mask_pred = rgba[:, :, :, 3, :]
    else:
        img_pred = rgba[..., :3]
        mask_pred = rgba[..., 3]

    if mask_img is not None:
        def sample_scene(cam_s, pts_s, mask_s, vis_s):
            p_screen = cam_s.transform_points_screen(pts_s)
            p = jnp.clip(-p_screen[..., :2], -1.0, 1.0)
            sampled = sample_image_at_ndc(mask_s.astype(jnp.float32), p)
            return jnp.any(sampled > 0.5, axis=0) & vis_s

        inmask = jax.vmap(sample_scene)(
            cameras, params.points, mask_img, visibility
        )
    else:
        inmask = filters.inmask

    new_filters = PointFilters(
        activation=active,
        visibility=jax.lax.stop_gradient(visibility),
        inmask=jax.lax.stop_gradient(inmask),
    )
    out = {
        "img_pred": img_pred,
        "mask_img_pred": mask_pred,
        "bin_overflow": jax.lax.stop_gradient(jnp.sum(frags.overflow)),
    }
    if frags.wdepth is not None:
        out["depth_pred"] = frags.wdepth
    return out, new_filters


def render_model(
    params: PointModelParams,
    filters: PointFilters,
    cameras: FoVPerspectiveCameras,
    lights: Optional[Lights],
    settings: RasterSettings,
    **render_kwargs,
) -> jnp.ndarray:
    """Eval-time render → RGBA (V, S, S, 4) (reference Model.render,
    point_modeling.py:216-236)."""
    from dss_tpu.render.ewa import compute_vrk_h_global, compute_vrk_h_isotropic

    vrk_h = None
    if settings.Vrk_invariant:
        vrk_h = compute_vrk_h_global(params.points, filters.activation)
    elif settings.Vrk_isotropic:
        vrk_h = compute_vrk_h_isotropic(params.points, filters.activation)
    rgba, _, _ = render_views(
        params.points,
        normalize(params.normals),
        params.colors,
        filters.activation,
        cameras,
        lights,
        settings,
        vrk_h=vrk_h,
        **render_kwargs,
    )
    return rgba


def prune_dead_points(
    params: PointModelParams,
    filters: PointFilters,
    cameras: FoVPerspectiveCameras,
    settings: RasterSettings,
    mask_gt: jnp.ndarray,
) -> jnp.ndarray:
    """Active-point detection via silhouette-gradient support (reference
    Model.prune_points, point_modeling.py:114-133): a point is dead if the
    silhouette loss gradient w.r.t. it is exactly zero."""

    def loss_fn(points):
        rgba, _, _ = render_views(
            points,
            normalize(params.normals),
            params.colors,
            filters.activation,
            cameras,
            None,
            settings,
        )
        return jnp.mean(jnp.abs(rgba[..., 3] - mask_gt))

    grad = jax.grad(loss_fn)(params.points)
    return ~jnp.all(grad == 0.0, axis=-1)


def prune_outside_silhouette(
    points: jnp.ndarray,
    cameras: FoVPerspectiveCameras,
    masks: jnp.ndarray,
    outside_frac: float = 0.09,
    mask_threshold: float = 0.5,
) -> jnp.ndarray:
    """GT-free floater pruning by silhouette consistency.

    A point on the true surface projects inside the object mask in every
    view (the silhouette is the projection of the whole volume), so a point
    that samples outside the mask in a substantial fraction of views is a
    floater.  Complements the gradient-support prune (reference
    point_modeling.py:114-133): floaters still receive silhouette gradients
    (they are not "dead"), they are just wrong — the reference has no tool
    for them.

    The fraction threshold absorbs silhouette-edge aliasing: true boundary
    points sample <0.5 in a handful of grazing views (measured up to ~17%
    of views for GT surface samples at 512²), but yoga6 floaters at 0.4
    world units off-surface fall outside in far more.  0.09 (≈12 of 128
    views) measured: removes 9/5000 points, Hausdorff 0.424→0.150, chamfer
    0.002728→0.002650 on the flagship cloud.

    Args:
      points: (P, 3) world-space positions.
      cameras: a batch of V cameras.
      masks: (V, S, S) GT object masks in [0, 1].
      outside_frac: prune a point outside the mask in > this fraction of views.
      mask_threshold: bilinear-sampled mask value below which a projection
        counts as outside.

    Returns:
      (P,) bool keep-mask (True = keep).
    """
    p_screen = cameras.transform_points_screen(points)  # (V, P, 3)
    # NDC xy sign flip: image array +x right/+y down vs NDC +x left/+y up
    # (reference point_modeling.py:199-201).  The clip maps out-of-frame
    # projections onto border pixels, which are background — correctly
    # counting points outside the frame as outside the silhouette.
    p = jnp.clip(-p_screen[..., :2], -1.0, 1.0)
    sampled = sample_image_at_ndc(jnp.asarray(masks, jnp.float32), p)  # (V, P)
    views_outside = jnp.sum(sampled <= mask_threshold, axis=0)
    return views_outside <= outside_frac * masks.shape[0]


def prune_depth_inconsistent(
    points: jnp.ndarray,
    cameras: FoVPerspectiveCameras,
    depth_maps: jnp.ndarray,
    tol: float = 0.02,
    min_views: int = 1,
) -> jnp.ndarray:
    """GT-cloud-free INTERIOR-floater pruning by front-depth consistency.

    The silhouette test (`prune_outside_silhouette`) cannot see points
    strictly INSIDE the visual hull — an interior point projects inside the
    mask in every view.  But the dataset's dense per-view depth maps
    (training data, reference dataset.py:71-75) expose them: a true surface
    point lies ON the front depth surface (|view-space z − depth(pixel)| ≤
    tol) in at least the views that see its patch, while an interior (or
    hull-interior hovering) point is off the front surface in EVERY view —
    behind it everywhere (interior) or in front without generating the
    depth (hovering).

    Measured on the depth-supervised flagship cloud (BENCHMARKS.md round 5):
    the silhouette prune removes 0/5000 while pred→GT outliers cap Hausdorff
    at 0.117; this prune removes the ~1.5k never-on-surface points —
    chamfer 0.001231 → 0.000570, Hausdorff 0.1172 → 0.0788 (tol 0.02).

    Args:
      points: (P, 3) world-space positions.
      cameras: a batch of V cameras.
      depth_maps: (V, S, S) per-view front depth, zfar where empty.
      tol: view-space depth agreement tolerance (world units).
      min_views: keep a point seen on-surface in >= this many views.

    Returns:
      (P,) bool keep-mask (True = keep).
    """
    view_z = cameras.transform_points_world_to_view(points)[..., 2]  # (V, P)
    p_screen = cameras.transform_points_screen(points)  # (V, P, 3)
    p = jnp.clip(-p_screen[..., :2], -1.0, 1.0)
    sampled = sample_image_at_ndc(
        jnp.asarray(depth_maps, jnp.float32), p
    )  # (V, P)
    near = jnp.abs(view_z - sampled) <= tol
    return jnp.sum(near, axis=0) >= min_views
