"""Surface-splatting renderer: shade → EWA setup → rasterize → composite.

Reference: DSS/core/renderer.py `SurfaceSplattingRenderer.forward` (36-82):
rasterize, weights = exp(-0.5·qvalue)·scaler, composite the per-point RGB,
return RGBA with alpha = the occupancy map.

Everything here is single-view and functional; `render_views` vmaps over the
camera/light batch (the reference instead "extends" the cloud to the camera
batch and re-packs, point_modeling.py:206-209 — with vmap no data duplication
happens).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dss_tpu.geometry.cameras import FoVPerspectiveCameras
from dss_tpu.geometry.knn import masked_gather
from dss_tpu.render.compositor import norm_weighted_sum, weighted_sum
from dss_tpu.render.ewa import RasterSettings, prepare_splats
from dss_tpu.render.lighting import Lights, shade_points
from dss_tpu.render.rasterizer import (
    Fragments,
    clip_grad_norm,
    rasterize_points,
    visible_points_mask,
)


def _tile_config(p: int, settings: RasterSettings):
    """(tile_size, bin_capacity, chunk, max_tiles, max_tiles_bwd,
    pair_cap_fwd, pair_cap_bwd) for the pallas backend (-1 entries = auto).

    - Capacity guard: with few tiles (small images) every splat can land in
      every tile, so capacity caps at the padded point count (the reference
      similarly sizes bins by max(10000, P), rasterizer.py:732-733).
    - Per-grid-step overhead dominates the fragment kernel (measured: tile
      64 > 32 > 16 at 512²) — the tile can never exceed the image.
    - Central tiles of a concentrated scene legitimately see most candidates
      (measured 2.5k dropped/view on yoga6 at cap 512) — generous capacity,
      up to 2048 (or P).  The compact layout ignores capacity entirely (it
      has no cap).
    - Dense clouds (auto): splat radii shrink with point spacing (1-2 px at
      100k), so a 2×2 tile budget suffices and the P·rep pair arrays (which
      feed every binning sort) shrink 4×.  Span overflow is reported — and
      the train CLI warns — if a scene violates the smaller budget; an
      EXPLICIT settings.max_tiles_per_splat overrides the clamp (ADVICE r2)
      for forward and backward alike.
    """
    p_cap = -(-p // settings.bin_chunk) * settings.bin_chunk
    tile_size = min(settings.tile_size, settings.image_size)
    n_tiles = (settings.image_size // tile_size) ** 2
    # Concentrated mid-size clouds (6k < P <= 20k): the busiest tile's
    # candidate count scales ~linearly with P — measured 0.29·P forward /
    # 0.56·P backward on the E20 10k cloud (scripts/diag_overflow.py), so
    # the fixed 2048 floor silently dropped 27.8k backward pairs/iter at
    # 10k points (BENCHMARKS.md round 4).  0.4·P covers the forward worst
    # case with margin; _bwd_tile_budget raises the backward table to
    # 0.75·P.  At P <= 6k the 2048 floor holds (5k flagship measured
    # max-tile 1246 fwd / 2389 bwd early-anneal; only a <=0.1% transient
    # drop) — kept unchanged so the flagship bench pays no extra block DMA.
    conc = (-(-(2 * p) // 5) + 127) // 128 * 128 if 6000 < p <= 20000 else 0
    bin_capacity = min(
        p_cap,
        max(settings.bin_capacity, 2048, 4 * p_cap // max(n_tiles, 1), conc),
    )
    if settings.max_tiles_per_splat > 0:
        max_tiles = max_tiles_bwd = settings.max_tiles_per_splat
    else:
        max_tiles = 4 if p <= 20000 else 2
        max_tiles_bwd = -1  # auto in _bwd_tile_budget
    pair_cap_fwd = (
        int(settings.pair_cap_scale_fwd * p)
        if settings.pair_cap_scale_fwd > 0
        else -1
    )
    pair_cap_bwd = (
        int(settings.pair_cap_scale_bwd * p)
        if settings.pair_cap_scale_bwd > 0
        else -1
    )
    return (
        tile_size,
        bin_capacity,
        settings.bin_chunk,
        max_tiles,
        max_tiles_bwd,
        pair_cap_fwd,
        pair_cap_bwd,
        1 if settings.mxu_quadric else 0,
        1 if settings.tiled_io else 0,
        1 if settings.matmul_scatter else 0,
        1 if settings.depth_channel else 0,
    )


def _prep_view(points, normals, colors, mask, camera, lights, settings,
               vrk_h, shininess, texture_fn):
    """Per-view prep shared by the single-view and view-batched paths:
    shading (LightingTexture / NeuralTexture, texture.py:74-162) → EWA setup
    (masks, not reallocation) → optional per-point grad clip.
    Returns (shaded (P, 3), splats, pts_screen (P, 3))."""
    if texture_fn is not None:
        shaded = texture_fn(points, normals, camera)
    elif lights is not None:
        shaded = shade_points(
            points, normals, colors, lights, camera.camera_position()[0],
            shininess,
        )
    else:
        shaded = colors
    splats = prepare_splats(points, normals, mask, camera, settings, vrk_h)
    pts_screen = splats.pts_screen
    if settings.clip_pts_grad > 0:
        pts_screen = clip_grad_norm(pts_screen, settings.clip_pts_grad)
    return shaded, splats, pts_screen


def _finish_composite(rgbw, occ, normalize_composite):
    """rgbw (…, 4) weighted rgb sums + weight sum → rgba with alpha = occ."""
    if normalize_composite:
        rgb = rgbw[..., :3] / jnp.maximum(rgbw[..., 3:4], 1e-10)
    else:
        rgb = rgbw[..., :3]
    return jnp.concatenate([rgb, occ[..., None]], axis=-1)


def _weighted_depth(wsum, wz):
    """Σw (…), Σw·z (…) → weighted-mean view-space depth, −1 uncovered.
    Gradient flows through the numerator only where covered; the
    denominator's cotangent reaches only the (detached) weights."""
    return jnp.where(wsum > 0.0, wz / jnp.maximum(wsum, 1e-10), -1.0)


def render_single_view(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    colors: jnp.ndarray,
    mask: jnp.ndarray,
    camera: FoVPerspectiveCameras,
    lights: Optional[Lights],
    settings: RasterSettings,
    vrk_h: Optional[jnp.ndarray] = None,
    shininess: float = 64.0,
    normalize_composite: bool = True,
    row_chunk: int = 8,
    texture_fn=None,
) -> Tuple[jnp.ndarray, Fragments, jnp.ndarray]:
    """Render one view.

    Args:
      points/normals: (P, 3); colors: (P, 3) albedo; mask: (P,) valid points.
      camera: single camera (batch dim 1); lights: one view's lights or None
        (None → raw albedo, no shading).
      texture_fn: optional (points, normals, camera) → colors override (e.g.
        a NeuralTexture from dss_tpu.render.texture) — takes precedence over
        the lighting shading.
    Returns:
      rgba (S, S, 4), fragments, visible (P,) bool.
    """
    shaded, splats, pts_screen = _prep_view(
        points, normals, colors, mask, camera, lights, settings, vrk_h,
        shininess, texture_fn,
    )

    # 3. Rasterize (custom VJP: occupancy/zbuf gradients, see rasterizer.py).
    backend = settings.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    frag_scaler = None
    visible = None
    if backend == "pallas":
        from dss_tpu.ops.splat_pallas import (
            rasterize_points_pallas,
            rasterize_points_pallas_lean,
        )

        tile_config = _tile_config(points.shape[0], settings)
        raster_args = (
            pts_screen,
            splats.ellipse_params,
            splats.cutoff,
            splats.radii,
            settings.depth_merging_threshold,
            settings.radii_backward_scaler,
            splats.scaler,
            shaded,
        )
        if settings.lean_fragments:
            occ, visible, rgbw, overflow = rasterize_points_pallas_lean(
                settings.image_size, settings.points_per_pixel, tile_config,
                *raster_args,
            )
            empty = jnp.zeros(
                (settings.image_size, settings.image_size, 0), jnp.float32
            )
            wdepth = (
                _weighted_depth(rgbw[..., 3], rgbw[..., 4])
                if settings.depth_channel else None
            )
            fragments = Fragments(
                idx=empty.astype(jnp.int32), zbuf=empty, qvalue=empty,
                occupancy=occ, overflow=overflow, wdepth=wdepth,
            )
        else:
            idx, zbuf, qvalue, occ, _frag_scaler, visible, rgbw, overflow = (
                rasterize_points_pallas(
                    settings.image_size, settings.points_per_pixel,
                    tile_config, *raster_args,
                )
            )
            wdepth = None
            if settings.depth_channel:
                # Per-fragment weights exactly as the compositor forms them
                # (the kernel no longer materializes frag_scaler — gather it;
                # qvalue = −1 padding is killed by the 0 gathered scaler).
                # This is the debug/fragment path; the hot path is lean.
                fsc = masked_gather(splats.scaler[:, None], idx)[..., 0]
                wf = jnp.exp(-0.5 * qvalue) * fsc * (idx >= 0)
                wdepth = _weighted_depth(
                    jnp.sum(wf, axis=-1), jnp.sum(wf * zbuf, axis=-1)
                )
            fragments = Fragments(
                idx=idx, zbuf=zbuf, qvalue=qvalue, occupancy=occ,
                overflow=overflow, wdepth=wdepth,
            )
        # Compositing was fused into the fragment kernel: rgbw carries the
        # weighted rgb sums + weight sum; only the norm division remains.
        rgba = _finish_composite(rgbw, occ, normalize_composite)
        return rgba, fragments, visible

    idx, zbuf, qvalue, occ = rasterize_points(
        settings.image_size,
        settings.points_per_pixel,
        row_chunk,
        pts_screen,
        splats.ellipse_params,
        splats.cutoff,
        splats.radii,
        settings.depth_merging_threshold,
        settings.radii_backward_scaler,
    )

    # 4. weights = exp(-0.5 Q) · scaler (renderer.py:53); per-fragment scaler
    # gathered with the negative-index guard (rasterizer.py:631-633).
    frag_scaler = masked_gather(splats.scaler[:, None], idx)[..., 0]
    weights = jnp.exp(-0.5 * qvalue) * frag_scaler

    wdepth = None
    if settings.depth_channel:
        # zbuf's cotangent routes through _zbuf_backward's per-point scatter
        # (weights detached: the rasterizer vjp drops the qvalue cotangent
        # and scaler is stop_gradient'd in prepare_splats) — the same z-grad
        # semantics as the lean kernel's depth column.
        wv = weights * (idx >= 0)
        wdepth = _weighted_depth(
            jnp.sum(wv, axis=-1), jnp.sum(wv * zbuf, axis=-1)
        )
    fragments = Fragments(
        idx=idx, zbuf=zbuf, qvalue=qvalue, occupancy=occ, wdepth=wdepth
    )

    # 5. Composite to RGB; alpha = occupancy (renderer.py:57-78).
    compose = norm_weighted_sum if normalize_composite else weighted_sum
    rgb = compose(idx, weights, shaded)
    rgba = jnp.concatenate([rgb, occ[..., None]], axis=-1)

    visible = visible_points_mask(idx, points.shape[0])
    return rgba, fragments, visible


def render_views(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    colors: jnp.ndarray,
    mask: jnp.ndarray,
    cameras: FoVPerspectiveCameras,
    lights: Optional[Lights],
    settings: RasterSettings,
    vrk_h: Optional[jnp.ndarray] = None,
    **kwargs,
) -> Tuple[jnp.ndarray, Fragments, jnp.ndarray]:
    """Render a batch of V views.

    The per-view math (shading, EWA setup, projection) is vmapped; on the
    pallas lean path the rasterization itself runs as ONE view-batched kernel
    call — the view axis lives in the Pallas grid.  vmap of the kernel would
    instead lower to an XLA while loop over views with per-view dynamic
    slices (profiled at ~5 ms/step of pure overhead at 8 views) and, for the
    compact layout, materialize every view's resident buffers at once.

    Returns (rgba (V, S, S, 4), fragments (V, ...), visible (V, P)).
    """
    backend = settings.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    if backend == "pallas" and settings.lean_fragments:
        return _render_views_batched(
            points, normals, colors, mask, cameras, lights, settings,
            vrk_h, _tile_config(points.shape[0], settings), **kwargs,
        )

    def one(cam_tree, light_tree):
        cam = jax.tree_util.tree_map(lambda x: x[None], cam_tree)
        return render_single_view(
            points, normals, colors, mask, cam, light_tree, settings, vrk_h, **kwargs
        )

    if lights is None:
        out = jax.vmap(lambda c: one(c, None))(
            jax.tree_util.tree_map(lambda x: x, cameras)
        )
    else:
        out = jax.vmap(one)(cameras, lights)
    if settings.tiled_io:
        # Non-batched backends (reference spec, fragment pallas path) render
        # untiled; tile the final rgba so every backend honors the layout
        # contract (the relayout cost only matters on the lean hot path,
        # which never takes this branch).
        from dss_tpu.ops.splat_pallas import tile_images

        rgba, fragments, visible = out
        tile = min(settings.tile_size, settings.image_size)
        if fragments.wdepth is not None:
            fragments = fragments.replace(
                wdepth=tile_images(fragments.wdepth, tile)
            )
        return tile_images(rgba, tile), fragments, visible
    return out


def _render_views_batched(
    points, normals, colors, mask, cameras, lights, settings, vrk_h,
    tile_config, shininess: float = 64.0, normalize_composite: bool = True,
    texture_fn=None, row_chunk: int = 8,
):
    """Lean pallas path with the view axis folded into the kernel grid."""
    from dss_tpu.ops.splat_pallas import rasterize_views_pallas_lean

    def prep(cam_tree, light_tree):
        cam = jax.tree_util.tree_map(lambda x: x[None], cam_tree)
        shaded, splats, pts_screen = _prep_view(
            points, normals, colors, mask, cam, light_tree, settings, vrk_h,
            shininess, texture_fn,
        )
        return (
            pts_screen, splats.ellipse_params, splats.cutoff, splats.radii,
            splats.scaler, shaded,
        )

    if lights is None:
        pts_s, ell, cut, rad, scl, shaded = jax.vmap(
            lambda c: prep(c, None)
        )(cameras)
    else:
        pts_s, ell, cut, rad, scl, shaded = jax.vmap(prep)(cameras, lights)

    occ, visible, rgbw, overflow = rasterize_views_pallas_lean(
        settings.image_size, settings.points_per_pixel, tile_config,
        pts_s, ell, cut, rad,
        settings.depth_merging_threshold, settings.radii_backward_scaler,
        scl, shaded,
    )
    return _package_lean(
        occ, visible, rgbw, overflow, settings, normalize_composite
    )


def _package_lean(occ, visible, rgbw, overflow, settings,
                  normalize_composite):
    """Composite + Fragments packaging shared by the view-batched and the
    stacked multi-scene lean paths."""
    wdepth = None
    if settings.tiled_io:
        # Tiled layout: rgbw (V, n_tiles, 4(+1), tt), occ (V, n_tiles, tt);
        # the composite is elementwise, so it runs in tile order too and
        # rgba stays tiled ((V, n_tiles, 4, tt), channel axis −2).
        if normalize_composite:
            rgb = rgbw[:, :, :3, :] / jnp.maximum(rgbw[:, :, 3:4, :], 1e-10)
        else:
            rgb = rgbw[:, :, :3, :]
        rgba = jnp.concatenate([rgb, occ[:, :, None, :]], axis=2)
        if settings.depth_channel:
            wdepth = _weighted_depth(rgbw[:, :, 3, :], rgbw[:, :, 4, :])
    else:
        rgba = _finish_composite(rgbw, occ, normalize_composite)
        if settings.depth_channel:
            wdepth = _weighted_depth(rgbw[..., 3], rgbw[..., 4])
    v = rgba.shape[0]
    empty = jnp.zeros(
        (v, settings.image_size, settings.image_size, 0), jnp.float32
    )
    fragments = Fragments(
        idx=empty.astype(jnp.int32), zbuf=empty, qvalue=empty,
        occupancy=occ, overflow=overflow, wdepth=wdepth,
    )
    return rgba, fragments, visible


def render_views_stacked(
    points: jnp.ndarray,  # (S, P, 3) — one cloud per scene
    normals: jnp.ndarray,  # (S, P, 3)
    colors: jnp.ndarray,  # (S, P, 3)
    mask: jnp.ndarray,  # (S, P)
    cameras: FoVPerspectiveCameras,  # leaves (S, V, ...)
    lights: Optional[Lights],  # leaves (S, V, ...) or None
    settings: RasterSettings,
    vrk_h: Optional[jnp.ndarray] = None,  # (S,)
    shininess: float = 64.0,
    normalize_composite: bool = True,
    texture_fn=None,
) -> Tuple[jnp.ndarray, Fragments, jnp.ndarray]:
    """Multi-scene batched render: ALL S·V views in ONE lean kernel call.

    vmap of render_views over the scene axis lowers the Pallas entry to a
    sequential XLA while loop over scenes (scalar-prefetch grids don't
    batch); folding the scene axis into the kernel's view axis instead
    gives grid (S·V, n_tiles) — every view of every scene pipelines through
    the same launch.  The per-view candidate tables already carry their own
    point data, so views of different clouds coexist in one grid exactly
    like views of one cloud (the binning is vmapped jnp either way).

    Requires the pallas lean path (the production training configuration).
    Returns (rgba (S, V, ...), fragments, visible (S, V, P)).
    """
    backend = settings.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    if backend != "pallas" or not settings.lean_fragments:
        # correctness fallback: per-scene vmap of the standard entry
        def one(p, n, c, m, cam, li, vh):
            return render_views(
                p, n, c, m, cam, li, settings, vrk_h=vh,
                shininess=shininess,
                normalize_composite=normalize_composite,
                texture_fn=texture_fn,
            )

        vh_axis = None if vrk_h is None else 0
        li_axis = None if lights is None else 0
        return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, li_axis, vh_axis))(
            points, normals, colors, mask, cameras, lights, vrk_h
        )

    from dss_tpu.ops.splat_pallas import rasterize_views_pallas_lean

    s_scenes, p = points.shape[:2]
    n_views = jax.tree_util.tree_leaves(cameras)[0].shape[1]

    def flat(x):
        return x.reshape((s_scenes * n_views,) + x.shape[2:])

    cams_f = jax.tree_util.tree_map(flat, cameras)
    lights_f = (
        None if lights is None else jax.tree_util.tree_map(flat, lights)
    )

    def rep(x):
        # scene-major repeat: view j of scene s lands at row s·V + j,
        # matching the flattened camera order
        return jnp.repeat(x, n_views, axis=0)

    def prep(pts_s, nrm_s, col_s, msk_s, vh_s, cam_tree, light_tree):
        cam = jax.tree_util.tree_map(lambda x: x[None], cam_tree)
        shaded, splats, pts_screen = _prep_view(
            pts_s, nrm_s, col_s, msk_s, cam, light_tree, settings,
            vh_s, shininess, texture_fn,
        )
        return (
            pts_screen, splats.ellipse_params, splats.cutoff, splats.radii,
            splats.scaler, shaded,
        )

    in_axes = (0, 0, 0, 0, (None if vrk_h is None else 0), 0,
               (None if lights is None else 0))
    pts_s, ell, cut, rad, scl, shaded = jax.vmap(prep, in_axes=in_axes)(
        rep(points), rep(normals), rep(colors), rep(mask),
        (None if vrk_h is None else jnp.repeat(vrk_h, n_views, axis=0)),
        cams_f, lights_f,
    )

    tile_config = _tile_config(p, settings)
    occ, visible, rgbw, overflow = rasterize_views_pallas_lean(
        settings.image_size, settings.points_per_pixel, tile_config,
        pts_s, ell, cut, rad,
        settings.depth_merging_threshold, settings.radii_backward_scaler,
        scl, shaded,
    )
    rgba, fragments, visible = _package_lean(
        occ, visible, rgbw, overflow, settings, normalize_composite
    )
    unflat = lambda x: x.reshape((s_scenes, n_views) + x.shape[1:])
    return (
        unflat(rgba),
        jax.tree_util.tree_map(unflat, fragments),
        unflat(visible),
    )
