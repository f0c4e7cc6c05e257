"""Elliptical splat rasterization — pure-JAX reference implementation.

This module is the executable spec for the splat rasterizer: per-pixel
all-points testing with top-K depth selection, exactly mirroring the
reference's CPU/CUDA twins (DSS/csrc/rasterize_points.cu:64-212 naive kernel,
rasterize_points_cpu.cpp:27-143).  The Pallas tile-binned kernel
(dss_tpu.ops.splat_pallas) is validated against this on identical inputs — the
same role the CPU twin plays for the CUDA kernels in the reference.

Semantics implemented (all behavioral requirements from the reference):

Forward (one view):
  - Pixel (row r, col c) has NDC center xf = 1 - (2c+1)/S, yf = 1 - (2r+1)/S:
    the "+Y up, +X left" convention with the x/y index reversal
    (rasterize_points.cu:154-161, PixToNdc rasterization_utils.cuh:8-11).
  - A splat covers a pixel iff pz >= 0, |dx| <= radii_x, |dy| <= radii_y and
    Q = a dx² + b dx dy + c dy² <= cutoff (rasterize_points.cu:64-124).
  - Per pixel keep the K nearest-in-z covering splats, sorted ascending by z,
    then truncate at the first fragment with z - z0 > depth_merging_threshold
    (rasterize_points.cu:201-210) — only the front surface blends.
  - occupancy = 1 iff any splat covered the pixel (before depth truncation).
  - idx = -1, zbuf = -1, qvalue = -1 padding for empty fragment slots.

Backward (custom VJP — occupancy is a step function, so its "gradient" is the
hand-defined attraction/repulsion field of the reference, not autograd):
  - d(occ)/d(pts_xy): each pixel spreads grad_occ to *visible* points within
    the scaled support radius as d/max(‖d‖², 1e-10), where visible = point
    appears in some pixel's idx list (rasterizer.py:854-867).  The support
    test matches the fast CUDA kernel: ‖d‖² <= (median(radii)·radii_scaler)²
    (rasterize_points_backward.cu:30-178, search radius from
    rasterizer.py:888).  A pixel with grad_occ > 0 (rendered but should be
    empty) only pushes points that actually cover it
    (rasterize_points_backward.cu:160-170).
  - d(zbuf)/d(pts_z): scatter-add of grad_zbuf into the rasterized points
    (rasterize_points.cu:823-885) — a segment sum.
  - qvalue grads are intentionally discarded (reference
    EllipticalRasterizer.backward consumes only occ_grad and zbuf_grad,
    rasterizer.py:787-977); the EWA weight map is treated as locally constant.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

INF = jnp.inf


@struct.dataclass
class Fragments:
    """Per-pixel fragment buffers (reference PointFragments,
    DSS/core/rasterizer.py:31-36).  Shapes for one view; batched via vmap."""

    idx: jnp.ndarray  # (S, S, K) int32, -1 padded
    zbuf: jnp.ndarray  # (S, S, K) view-space depth, -1 padded
    qvalue: jnp.ndarray  # (S, S, K) conic value Q, -1 padded
    occupancy: jnp.ndarray  # (S, S) float {0, 1}
    # () int32: candidates dropped by the pallas backend's static tile/
    # capacity budgets (fwd + occ-bwd binning); 0 on the exact reference
    # backend.  Nonzero at runtime = lost fragments/gradients — raise
    # bin_capacity / max_tiles_per_splat.
    overflow: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )
    # (S, S) weighted-mean view-space depth Σw·z/Σw, −1 where uncovered —
    # populated on every backend when RasterSettings.depth_channel is on
    # ((n_tiles, tt) tile order under tiled_io); None otherwise.
    wdepth: jnp.ndarray | None = None


def pixel_ndc_coords(image_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NDC centers (xf (S,), yf (S,)) for pixel columns / rows.

    Index-reversed pixel-center rule: col c -> xf = 1 - (2c+1)/S (+X left),
    row r -> yf = 1 - (2r+1)/S (+Y up)."""
    s = image_size
    i = jnp.arange(s, dtype=jnp.float32)
    coord = 1.0 - (2.0 * i + 1.0) / s
    return coord, coord


def _rasterize_rows(
    pts: jnp.ndarray,
    ellipse: jnp.ndarray,
    cutoff: jnp.ndarray,
    radii: jnp.ndarray,
    depth_merging_threshold: jnp.ndarray,
    image_size: int,
    points_per_pixel: int,
    row_chunk: int,
):
    """Forward rasterization, scanning over row chunks to bound the (pixels, P)
    working set."""
    s, k = image_size, points_per_pixel
    p = pts.shape[0]
    xf, yf = pixel_ndc_coords(s)

    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
    a, b, c = ellipse[:, 0], ellipse[:, 1], ellipse[:, 2]

    def row_block(y_block):  # y_block: (R,) ndc y values
        # (R, S, P) pairwise pixel/point quantities
        dx = xf[None, :, None] - px[None, None, :]  # (1, S, P)
        dy = y_block[:, None, None] - py[None, None, :]  # (R, 1, P)
        dx = jnp.broadcast_to(dx, (y_block.shape[0], s, p))
        q = a * dx * dx + b * dx * dy + c * dy * dy
        accept = (
            (pz[None, None, :] >= 0.0)
            & (jnp.abs(dx) <= radii[None, None, :, 0])
            & (jnp.abs(dy) <= radii[None, None, :, 1])
            & (q <= cutoff[None, None, :])
        )
        z = jnp.where(accept, pz[None, None, :], INF)
        # K smallest depths (ties broken by point index, like the sequential
        # insertion in the reference only approximately — acceptable).
        k_eff = min(k, p)
        neg_topz, top_idx = jax.lax.top_k(-z, k_eff)  # (R, S, K) ascending z
        if k_eff < k:
            pad = ((0, 0), (0, 0), (0, k - k_eff))
            neg_topz = jnp.pad(neg_topz, pad, constant_values=-INF)
            top_idx = jnp.pad(top_idx, pad, constant_values=0)
        topz = -neg_topz
        hit = jnp.isfinite(topz)
        top_q = jnp.take_along_axis(q, top_idx, axis=-1)
        # Depth-merge truncation: z sorted ascending -> keep prefix.
        keep = hit & (topz - topz[..., :1] <= depth_merging_threshold)
        idx = jnp.where(keep, top_idx, -1).astype(jnp.int32)
        zbuf = jnp.where(keep, topz, -1.0)
        qv = jnp.where(keep, top_q, -1.0)
        occ = jnp.any(accept, axis=-1).astype(jnp.float32)
        return idx, zbuf, qv, occ

    if s % row_chunk != 0:
        row_chunk = 1
    n_blocks = s // row_chunk
    y_blocks = yf.reshape(n_blocks, row_chunk)
    idx, zbuf, qv, occ = jax.lax.map(row_block, y_blocks)
    return (
        idx.reshape(s, s, k),
        zbuf.reshape(s, s, k),
        qv.reshape(s, s, k),
        occ.reshape(s, s),
    )


def _occ_backward(
    pts: jnp.ndarray,
    radii: jnp.ndarray,
    visible: jnp.ndarray,
    grad_occ: jnp.ndarray,
    radii_backward_scaler: jnp.ndarray,
    image_size: int,
    row_chunk: int,
) -> jnp.ndarray:
    """Hand-defined occupancy gradient field → (P, 2) xy grads (fast-kernel
    semantics, see module docstring)."""
    s = image_size
    p = pts.shape[0]
    xf, yf = pixel_ndc_coords(s)
    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]

    # Search radius: median of visible splat radii (both axes pooled) scaled
    # by the annealed backward scaler (reference rasterizer.py:888).
    r_pool = jnp.where(visible[:, None], radii, jnp.nan)
    cur_r = jnp.nanmedian(r_pool) * radii_backward_scaler
    cur_r2 = cur_r * cur_r

    # Point-side static rejections (rasterize_points_backward.cu:144-147).
    pt_ok = visible & (pz >= 0.0) & (jnp.abs(px) <= 1.0) & (jnp.abs(py) <= 1.0)

    if s % row_chunk != 0:
        row_chunk = 1
    n_blocks = s // row_chunk
    y_blocks = yf.reshape(n_blocks, row_chunk)
    g_blocks = grad_occ.reshape(n_blocks, row_chunk, s)

    def accum(carry, blk):
        y_block, g_block = blk  # (R,), (R, S)
        dx = xf[None, :, None] - px[None, None, :]
        dy = y_block[:, None, None] - py[None, None, :]
        dx = jnp.broadcast_to(dx, (y_block.shape[0], s, p))
        dist2 = dx * dx + dy * dy
        inside_support = dist2 <= cur_r2
        outside_splat = (jnp.abs(dx) > radii[None, None, :, 0]) | (
            jnp.abs(dy) > radii[None, None, :, 1]
        )
        g = g_block[:, :, None]
        contribute = (
            inside_support
            & pt_ok[None, None, :]
            & (g != 0.0)
            & ~((g > 0.0) & outside_splat)
        )
        denom = jnp.maximum(dist2, 1e-10)
        w = jnp.where(contribute, g / denom, 0.0)
        gx = jnp.einsum("rsp,rsp->p", w, dx)
        gy = jnp.einsum("rsp,rsp->p", w, dy)
        return carry + jnp.stack([gx, gy], axis=-1), None

    grad_xy, _ = jax.lax.scan(
        accum, jnp.zeros((p, 2), pts.dtype), (y_blocks, g_blocks)
    )
    return grad_xy


def _zbuf_backward(
    idx: jnp.ndarray, grad_zbuf: jnp.ndarray, num_points: int
) -> jnp.ndarray:
    """(P,) z grads: scatter-add grad_zbuf into the rasterized point ids
    (reference _backward_zbuf, rasterize_points.cu:823-885)."""
    flat_idx = idx.reshape(-1)
    flat_g = grad_zbuf.reshape(-1)
    safe = jnp.where(flat_idx >= 0, flat_idx, num_points)
    out = jax.ops.segment_sum(
        jnp.where(flat_idx >= 0, flat_g, 0.0), safe, num_segments=num_points + 1
    )
    return out[:num_points]


def visible_points_mask(idx: jnp.ndarray, num_points: int) -> jnp.ndarray:
    """(P,) True for points appearing in any pixel's fragment list (reference
    get_per_point_visibility_mask, DSS/utils/__init__.py:320-340)."""
    flat = idx.reshape(-1)
    safe = jnp.where(flat >= 0, flat, num_points)
    hits = jax.ops.segment_sum(
        jnp.ones_like(flat, jnp.int32), safe, num_segments=num_points + 1
    )
    return hits[:num_points] > 0


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def rasterize_points(
    image_size: int,
    points_per_pixel: int,
    row_chunk: int,
    pts_screen: jnp.ndarray,
    ellipse_params: jnp.ndarray,
    cutoff: jnp.ndarray,
    radii: jnp.ndarray,
    depth_merging_threshold,
    radii_backward_scaler,
):
    """Differentiable elliptical splat rasterization (one view).

    Args:
      image_size, points_per_pixel, row_chunk: static ints.
      pts_screen: (P, 3) NDC x, y + view-space z.  The ONLY differentiable
        input (reference returns grads for pts_screen alone,
        rasterizer.py:791-806, 977).
      ellipse_params: (P, 3) conic (a, b, c), detached upstream.
      cutoff: (P,) conic cutoff; -inf disables a splat.
      radii: (P, 2) axis-aligned NDC half-extents; 0 disables.
      depth_merging_threshold: traced scalar.
      radii_backward_scaler: traced scalar (annealed during training).
    Returns:
      (idx (S,S,K) int32, zbuf (S,S,K), qvalue (S,S,K), occupancy (S,S)).
    """
    return _rasterize_rows(
        pts_screen,
        ellipse_params,
        cutoff,
        radii,
        depth_merging_threshold,
        image_size,
        points_per_pixel,
        row_chunk,
    )


def _rasterize_fwd(
    image_size,
    points_per_pixel,
    row_chunk,
    pts_screen,
    ellipse_params,
    cutoff,
    radii,
    depth_merging_threshold,
    radii_backward_scaler,
):
    out = _rasterize_rows(
        pts_screen,
        ellipse_params,
        cutoff,
        radii,
        depth_merging_threshold,
        image_size,
        points_per_pixel,
        row_chunk,
    )
    idx = out[0]
    residuals = (pts_screen, radii, idx, radii_backward_scaler)
    return out, residuals


def _rasterize_bwd(image_size, points_per_pixel, row_chunk, residuals, grads):
    pts_screen, radii, idx, radii_backward_scaler = residuals
    _, grad_zbuf, _grad_qvalue, grad_occ = grads
    p = pts_screen.shape[0]

    visible = visible_points_mask(idx, p)
    grad_xy = _occ_backward(
        pts_screen,
        radii,
        visible,
        grad_occ,
        radii_backward_scaler,
        image_size,
        row_chunk,
    )
    grad_z = _zbuf_backward(idx, grad_zbuf, p)
    grad_pts = jnp.concatenate([grad_xy, grad_z[:, None]], axis=-1)
    zeros = lambda x: jnp.zeros_like(x)
    return (
        grad_pts,
        zeros(jnp.zeros((p, 3), pts_screen.dtype)),
        zeros(jnp.zeros((p,), pts_screen.dtype)),
        zeros(radii),
        jnp.zeros(()),
        jnp.zeros(()),
    )


rasterize_points.defvjp(_rasterize_fwd, _rasterize_bwd)


def clip_grad_norm(x: jnp.ndarray, max_norm: float) -> jnp.ndarray:
    """Identity whose VJP clips per-row gradient norms to `max_norm`
    (reference _clip_grad hook, rasterizer.py:667-673, clip_pts_grad=0.05)."""

    @jax.custom_vjp
    def _ident(v):
        return v

    def _fwd(v):
        return v, None

    def _bwd(_, g):
        n = jnp.linalg.norm(g, axis=-1, keepdims=True)
        scale = jnp.clip(n, 0.0, max_norm) / jnp.maximum(n, 1e-12)
        return (g * scale,)

    _ident.defvjp(_fwd, _bwd)
    return _ident(x)
