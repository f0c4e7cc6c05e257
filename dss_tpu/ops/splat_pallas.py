"""Tile-binned elliptical splat rasterizer — Pallas TPU kernels.

Replaces the reference's CUDA coarse/fine kernels (DSS/csrc/rasterize_points.cu:
coarse bitmask binning 293-432, fine per-pixel top-K 506-597) and the fast
occupancy backward (rasterize_points_backward.cu:30-322) with a TPU-native
design:

Forward
  1. **Binning (pure JAX, sort-based).**  Each splat's pixel-space AABB is
     expanded into (tile, splat) pairs under a static replication budget;
     pairs are lexicographically sorted by (tile, depth) with one
     `jax.lax.sort` — replacing the CUDA BitMask + atomicAdd allocation — and
     scattered into a dense (n_tiles, M) candidate table, depth-ascending
     within each tile.
  2. **Per-tile fragment kernel (Pallas).**  One grid step per tile.  The
     T×T pixel block tests candidates in VMEM chunks; because candidates are
     depth-sorted, the k-th surviving fragment of a pixel is exactly the
     candidate whose *acceptance rank* is k — rank = running count + exclusive
     prefix sum of the accept mask.  The top-K-by-depth selection with
     in-register bubble sort of the CUDA kernel becomes a rank-match
     accumulation, fully vectorized on the VPU with no sorting in the kernel.

Backward (occupancy → xy gradients; field d/‖d‖², see
dss_tpu/render/rasterizer.py for the semantics contract)
  - Candidates are re-binned with the *scaled* support radius; the kernel
    accumulates per-candidate gradients by reducing over the tile's pixels
    (no atomics — each (tile, candidate) pair owns its partial sum), and a
    JAX segment_sum scatters partials back to points.  This replaces the
    FRNN uniform-grid + atomicAdd design.

Static-shape caveat: each tile holds at most `bin_capacity` candidates and a
splat covers at most `max_tiles_x/y` tiles (the CUDA version has the same
kind of caps: kMaxPointsPerBin, num_bins < 22).  Overflow counts are
returned for diagnostics instead of silently lying.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = jnp.inf

# Channel layout of the per-candidate data passed to the forward kernel.
# _CH_ID carries the global splat id as f32 (exact for P < 2^24) so the
# kernel can emit global fragment ids directly — the alternative, mapping
# in-tile positions back through tile_ids afterwards, is a 10.5M-element
# gather that measured 210 ms/step at 512²×8 views (58% of the step).
(_CH_PX, _CH_PY, _CH_PZ, _CH_A, _CH_B, _CH_C, _CH_CUT, _CH_RX, _CH_RY,
 _CH_SC, _CH_R, _CH_G, _CH_B2, _CH_ID) = range(14)
N_CHANNELS = 14

# Reduced layout for the occupancy-backward kernel (rx/ry = UNSCALED radii
# for the outside-splat test; the scaled support only affects binning).
(_BCH_PX, _BCH_PY, _BCH_PZ, _BCH_RX, _BCH_RY) = range(5)
N_BWD_CHANNELS = 5


def _interpret_mode() -> bool:
    return os.environ.get("DSS_TPU_INTERPRET", "0") == "1"


def _tiles_per_step(n_tiles: int, cap: int = 1) -> int:
    """Tiles processed per Pallas grid step (largest divisor ≤ cap).

    Measured on v5e at 512²/tile 64/5k pts: G∈{1,2} identical (63.6 ms step),
    G=8 WORSE (67.4) — the sequential grid already pipelines block DMA, so
    per-step overhead is negligible and big unrolled steps only hurt.  Kept
    at 1; the mechanism remains for shapes where the grid gets very long."""
    g = min(cap, n_tiles)
    while n_tiles % g:
        g -= 1
    return g


def sorted_segment_sum(
    vals: jnp.ndarray, seg: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Segment sum as sort + cumsum + boundary gather.

    TPU scatter-adds serialize per-update; one `lax.sort` over the segment ids
    plus a cumsum is ~1.6× faster at the fragment counts this module produces
    (1.3M @ 512²) and scales with sort throughput, not update count.
    vals (N, C), seg (N,) int32 in [0, num_segments] (ids == num_segments act
    as a dump bucket and are dropped); returns (num_segments, C).

    Segment boundaries come from SENTINEL rows merged into the main sort, not
    searchsorted: one zero-valued row per segment id rides the sort (tiebroken
    to land before real rows of the same id), so after the cumsum the value at
    each sentinel position is exactly the prefix sum at that segment's start.
    Sentinel positions come from a cheap (flag, iota) partition sort.  The
    searchsorted alternative costs one ~(S+1)-row gather per bisection step
    (~17 steps × 0.3 ms at the 8×131k bench shape — gathers are row-bound);
    measured 12.9 → 9.6 ms per 8-view call by the swap.
    """
    n, c = vals.shape
    s1 = num_segments + 1
    keys = jnp.concatenate([seg, jnp.arange(s1, dtype=seg.dtype)])
    flag = jnp.concatenate(
        [jnp.ones((n,), jnp.int32), jnp.zeros((s1,), jnp.int32)]
    )
    vpad = jnp.concatenate([vals, jnp.zeros((s1, c), vals.dtype)])
    ops = (keys, flag) + tuple(vpad[:, ch] for ch in range(c))
    out = jax.lax.sort(ops, num_keys=2)
    sv = jnp.stack(out[2:], axis=1)
    ex = jnp.cumsum(sv, axis=0)  # inclusive; sentinels contribute zero
    pos = jax.lax.sort(
        (out[1], jnp.arange(n + s1, dtype=jnp.int32)), num_keys=1
    )[1][:s1]  # stable → sentinel positions in segment-id order
    exb = jnp.where((pos == 0)[:, None], 0.0, ex[jnp.maximum(pos - 1, 0)])
    return exb[1:] - exb[:-1]


def _segsum_matmul_kernel(seg_ref, vals_ref, out_ref, *, n_hi, c, terms):
    """Per-chunk scatter-as-matmul: out[lo, (c, hi)] += Σ_r 1[lo(r)]·v·1[hi(r)].

    The segment id splits as id = hi·128 + lo; two one-hot factors turn the
    scatter into A·Bᵀ — with A the (128, K) lo one-hot (exact in bf16) on
    the M side for full MXU row utilization, and the C channels folded into
    the N dim (C·n_hi columns, ONE dot per bf16 term).  Everything derives
    from ROW-layout inputs (ids (1, K), values (C, K)): both one-hot
    factors build K-on-lanes, the dot contracts both operands' lane dims
    (A·Bᵀ), and no relayout transposes appear in or around the kernel (the
    two-layout variant measured 3.3 ms/step of compare_select layout copies
    at the bench shape).  The f32 values ride as `terms` bf16 significand
    slices (8 bits each; 3 terms ≥ the f32 significand), so every MXU pass
    is a cheap bf16×bf16 with f32 accumulation.  The output block is
    revisited across the chunk grid axis (standard TPU reduction pattern)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    seg = seg_ref[0, 0, :][None, :]  # (1, K)
    k = seg.shape[1]
    at = (
        jax.lax.broadcasted_iota(jnp.int32, (128, k), 0) == seg % 128
    ).astype(jnp.bfloat16)
    hmask = (
        jax.lax.broadcasted_iota(jnp.int32, (n_hi, k), 0) == seg // 128
    ).astype(jnp.float32)
    # (c·n_hi, K) with (c, hi) row order — concat, not reshape: Mosaic
    # cannot shape-cast a (c, n_hi, k) stack flat.
    bv = jnp.concatenate(
        [hmask * vals_ref[0, ch, :][None, :] for ch in range(c)], axis=0
    )
    acc = jnp.zeros((128, c * n_hi), jnp.float32)
    for _ in range(terms):
        bt = bv.astype(jnp.bfloat16)
        bv = bv - bt.astype(jnp.float32)
        # Explicit transpose + plain dot: dot_general with a lane-contracted
        # rhs (A·Bᵀ dimension numbers) sends the remote Mosaic compile into
        # the weeds (>15 min, vs seconds for this form).
        acc += jax.lax.dot_general(
            at, bt.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] += acc


def segment_sum_views_matmul(
    vals: jnp.ndarray, seg: jnp.ndarray, num_segments: int,
    chunk: int = 4096, terms: int = 3,
) -> jnp.ndarray:
    """Batched segment sum as per-chunk one-hot matmuls on the MXU.

    vals (V, C, N) f32 — CHANNEL-MAJOR, so the per-channel rows arrive in
    the same row layout as the ids and no relayout copies are needed —
    and seg (V, N) int32 in [0, num_segments] (num_segments is the dump
    bucket, dropped); returns (V, num_segments, C).  Same contract as
    vmapped sorted_segment_sum (transposed input); replaces its sort+cumsum
    with MXU outer-product accumulation — profiling at the bench shape
    showed 6 sorts of the (8, 136k) slot array (~12 ms/step) plus their
    sentinel concat copies (~7 ms/step) dominating the non-kernel step
    time."""
    v, c, n = vals.shape
    n_hi = -(-(num_segments + 1) // 128)
    # Bound the kernel's VMEM: bv (c·n_hi, chunk) f32 + its bf16 term copy
    # + the (n_hi, chunk) hmask all scale with chunk·n_hi — beyond the bench
    # shape (~95 MB at c=3, n_hi≈1063, chunk=4096) a larger segment space
    # would blow the 100 MB limit and risk a pathological Mosaic compile.
    # Shrink chunk to keep those buffers at/below the proven footprint
    # (lane-aligned, floor 512; more grid steps, same math).
    per_col = n_hi * (6 * c + 4)
    chunk = min(chunk, max(512, (96 * 1024 * 1024 // per_col) // 128 * 128))
    npad = -(-n // chunk) * chunk
    if npad != n:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, npad - n)))
        seg = jnp.pad(seg, ((0, 0), (0, npad - n)),
                      constant_values=num_segments)
    out = pl.pallas_call(
        functools.partial(_segsum_matmul_kernel, n_hi=n_hi, c=c, terms=terms),
        grid=(v, npad // chunk),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda vi, i: (vi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, chunk), lambda vi, i: (vi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, c * n_hi),
                               lambda vi, i: (vi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, 128, c * n_hi), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret_mode(),
    )(seg.reshape(v, 1, npad), vals)
    # out[v, lo, c·n_hi + ...]: columns are (c, hi); flat id = hi·128 + lo.
    out = out.reshape(v, 128, c, n_hi).transpose(0, 3, 1, 2)
    return out.reshape(v, n_hi * 128, c)[:, :num_segments]


# ---------------------------------------------------------------------------
# Binning (pure JAX)
# ---------------------------------------------------------------------------


def ndc_to_pixel(x: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """Continuous pixel coordinate of an NDC value under the flipped
    convention: pix = (S·(1 − x) − 1)/2 (inverse of 1 − (2c+1)/S)."""
    return (image_size * (1.0 - x) - 1.0) * 0.5


class BinnedSplats(NamedTuple):
    tile_data: jnp.ndarray  # (n_tiles, N_CHANNELS, M) f32, depth-sorted
    tile_ids: jnp.ndarray  # (n_tiles, M) int32 original splat ids, -1 pad
    tile_counts: jnp.ndarray  # (n_tiles,) int32 candidates per tile
    overflow: jnp.ndarray  # () int32: candidates dropped by capacity


def bin_splats(
    pts: jnp.ndarray,
    ellipse: jnp.ndarray,
    cutoff: jnp.ndarray,
    radii: jnp.ndarray,
    image_size: int,
    tile_size: int,
    bin_capacity: int,
    max_tiles_x: int = 4,
    max_tiles_y: int = 4,
    extra_radius: jnp.ndarray | float = 0.0,
    sort_by_depth: bool = True,
    scaler: jnp.ndarray | None = None,
    features: jnp.ndarray | None = None,
    backward_channels: bool = False,
    pair_cap: int | None = None,
) -> BinnedSplats:
    """Build the per-tile candidate table.

    extra_radius: additional NDC support (used by the backward pass, where the
    search radius is the traced scaled median radius, not the splat radius).
    backward_channels: build the reduced 5-channel table for the occupancy
    backward (px, py, pz, UNSCALED rx/ry) instead of the 13-channel forward
    layout — the backward kernel never reads conic/scaler/rgb, so gathering
    them only burns HBM bandwidth.
    pair_cap: static bound on LIVE (tile, splat) pairs kept after the sort
    (default 4·P forward / 6·P backward); excess is dropped and counted in
    overflow.
    """
    sorted_id, starts, span_overflow = _sorted_pairs(
        pts, radii, image_size, tile_size,
        max_tiles_x, max_tiles_y, extra_radius, sort_by_depth,
    )
    p = pts.shape[0]
    n_tiles = (image_size // tile_size) ** 2
    n_pairs = p * max_tiles_x * max_tiles_y

    # Live-pair truncation: invalid pairs sort to the tail (tile key =
    # n_tiles), so the first `live` rows of the sorted array are the real
    # candidates.  The per-splat replication budget (rep = mx·my) makes
    # n_pairs = rep·P, but the number of LIVE pairs is ~coverage·P — a much
    # smaller static bound keeps every downstream gather proportional to
    # real work (profile: the 1M-slot gathers were 29 ms of an 80 ms step).
    # Truncated live pairs (only possible when every splat covers many
    # tiles AND the scene is dense) are counted in overflow.
    if pair_cap is None:
        # Backward: the scaled support disc can span ~3×3 tiles early in the
        # anneal (radii_backward_scaler=10) → live pairs approach 9·P; 10·P
        # covers that with margin at small P.  At large P the median radius
        # (and with it the support disc) shrinks with point spacing, while
        # the bound-sized channel gather grows — the 10·P bound measured
        # 56 ms/step at 100k — so dense clouds use 5·P.  Forward: splats
        # rarely span >2×2 tiles.  Truncation is reported through overflow
        # either way (and the train CLI warns on nonzero bin_overflow).
        if backward_channels:
            pair_cap = 10 * p if p <= 20000 else 5 * p
        else:
            # Dense clouds: splats shrink with spacing (1-2 px at 100k), so
            # ~1.5 live pairs/splat — 2·P is generous and halves the
            # 3.2M-row channel gather measured at 100k.
            pair_cap = 4 * p if p <= 20000 else 2 * p
    pair_cap = min(_round_up(pair_cap, 128), n_pairs)
    live_total = starts[n_tiles]
    trunc_overflow = jnp.maximum(live_total - pair_cap, 0)

    starts_t = jnp.minimum(starts, pair_cap)
    counts_full = starts_t[1:] - starts_t[:-1]
    counts = jnp.minimum(counts_full, bin_capacity).astype(jnp.int32)
    cap_overflow = jnp.sum(jnp.maximum(counts_full - bin_capacity, 0))
    overflow = cap_overflow + span_overflow + trunc_overflow

    # ONE channel gather in sorted-pair order (pair_cap rows), then the
    # per-tile tables are CONTIGUOUS slices of it — dynamic_slice +
    # dynamic_update_slice copies instead of 131k-slot random gathers
    # (TPU's gather unit moves ~170M rows/s; contiguous copies move at
    # memcpy speed).
    src, sentinel = _channel_matrix(
        pts, ellipse, cutoff, radii, extra_radius, scaler, features,
        backward_channels,
    )
    c = src.shape[1]
    sid = sorted_id[:pair_cap]
    sorted_chans = src[sid]  # (pair_cap, C) — the only random gather
    # Sentinel-pad the tail so per-tile slices never clamp into real data.
    sorted_chans = jnp.concatenate(
        [
            sorted_chans,
            jnp.broadcast_to(sentinel, (bin_capacity, c)),
        ],
        axis=0,
    ).T  # (C, pair_cap + cap)
    sid_pad = jnp.concatenate(
        [sid, jnp.full((bin_capacity,), -1, jnp.int32)]
    )

    slot_j = jnp.arange(bin_capacity, dtype=jnp.int32)[None, :]
    valid_slot = slot_j < counts[:, None]

    def build_tile(ti, tabs):
        ids_tab, ch_tab = tabs
        s0 = starts_t[ti]
        ids_sl = jax.lax.dynamic_slice(sid_pad, (s0,), (bin_capacity,))
        ch_sl = jax.lax.dynamic_slice(
            sorted_chans, (0, s0), (c, bin_capacity)
        )
        ids_tab = jax.lax.dynamic_update_slice(
            ids_tab, ids_sl[None], (ti, 0)
        )
        ch_tab = jax.lax.dynamic_update_slice(
            ch_tab, ch_sl[None], (ti, 0, 0)
        )
        return ids_tab, ch_tab

    ids_tab0 = jnp.full((n_tiles, bin_capacity), -1, jnp.int32)
    ch_tab0 = jnp.zeros((n_tiles, c, bin_capacity), jnp.float32)
    ids_tab, ch_tab = jax.lax.fori_loop(
        0, n_tiles, build_tile, (ids_tab0, ch_tab0)
    )
    tile_ids = jnp.where(valid_slot, ids_tab, -1)
    chans = jnp.where(
        valid_slot[:, None, :], ch_tab, sentinel[None, :, None]
    )
    return BinnedSplats(
        tile_data=chans,
        tile_ids=tile_ids,
        tile_counts=counts,
        overflow=overflow,
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sorted_pairs(
    pts, radii, image_size, tile_size, max_tiles_x, max_tiles_y,
    extra_radius, sort_by_depth,
):
    """Build + sort the (tile, splat) pair array.  Returns (sorted_id
    (P·rep,), starts (n_tiles+1,), span_overflow ()) — sorted by tile (and
    depth within tile when sort_by_depth)."""
    p = pts.shape[0]
    s = image_size
    nt = s // tile_size
    n_tiles = nt * nt

    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
    rx = radii[:, 0] + extra_radius
    ry = radii[:, 1] + extra_radius
    live = (rx > 0) & (pz >= 0.0)

    # Pixel-space AABB (x flipped: +ndc-x = left = small pixel col).
    cx_lo = ndc_to_pixel(px + rx, s)
    cx_hi = ndc_to_pixel(px - rx, s)
    cy_lo = ndc_to_pixel(py + ry, s)
    cy_hi = ndc_to_pixel(py - ry, s)

    tx_lo = jnp.clip(jnp.floor(cx_lo / tile_size).astype(jnp.int32), 0, nt - 1)
    tx_hi = jnp.clip(jnp.floor(cx_hi / tile_size).astype(jnp.int32), 0, nt - 1)
    ty_lo = jnp.clip(jnp.floor(cy_lo / tile_size).astype(jnp.int32), 0, nt - 1)
    ty_hi = jnp.clip(jnp.floor(cy_hi / tile_size).astype(jnp.int32), 0, nt - 1)
    # Entirely off-screen?
    offscreen = (
        (cx_hi < 0) | (cx_lo > s - 1) | (cy_hi < 0) | (cy_lo > s - 1)
    )
    live = live & ~offscreen

    # Replicate into up to rep tiles (static budget).
    d = jnp.arange(max_tiles_x, dtype=jnp.int32)
    e = jnp.arange(max_tiles_y, dtype=jnp.int32)
    tx = tx_lo[:, None] + d[None, :]  # (P, RX)
    ty = ty_lo[:, None] + e[None, :]  # (P, RY)
    vx = tx <= tx_hi[:, None]
    vy = ty <= ty_hi[:, None]
    tile = ty[:, None, :] * nt + tx[:, :, None]  # (P, RX, RY)
    valid = (vx[:, :, None] & vy[:, None, :]) & live[:, None, None]
    # Coverage overflow: splat spans more tiles than the budget.
    span_overflow = ((tx_hi - tx_lo + 1) > max_tiles_x) | (
        (ty_hi - ty_lo + 1) > max_tiles_y
    )
    tile_key = jnp.where(valid, tile, n_tiles).reshape(-1)  # (P*rep,)
    splat_id = jnp.broadcast_to(
        jnp.arange(p, dtype=jnp.int32)[:, None, None], (p, max_tiles_x, max_tiles_y)
    ).reshape(-1)

    if sort_by_depth:
        # Single fused u32 key: tile id in the high bits, 20-bit quantized
        # depth in the low bits — one sort_key_val instead of a 3-operand
        # lexicographic sort (the CUDA reference instead bubble-sorts per
        # pixel).  Quantization only permutes near-equal depths (ties are
        # arbitrary in the reference too).
        zq_bits = max(1, 30 - max(n_tiles - 1, 1).bit_length())
        zq_max = (1 << zq_bits) - 1
        z_all = jnp.broadcast_to(
            pz[:, None, None], (p, max_tiles_x, max_tiles_y)
        ).reshape(-1)
        z_lo = jnp.min(jnp.where(live, pz, jnp.inf))
        z_hi = jnp.max(jnp.where(live, pz, -jnp.inf))
        z_lo = jnp.where(jnp.isfinite(z_lo), z_lo, 0.0)
        z_hi = jnp.where(jnp.isfinite(z_hi), z_hi, 1.0)
        z_range = jnp.maximum(z_hi - z_lo, 1e-9)
        zq = jnp.clip(
            ((z_all - z_lo) / z_range * zq_max).astype(jnp.int32), 0, zq_max
        )
        fused = tile_key * (zq_max + 1) + zq
        _sorted_fused, sorted_id = jax.lax.sort_key_val(fused, splat_id)
        sorted_key = _sorted_fused // (zq_max + 1)
    else:
        sorted_key, sorted_id = jax.lax.sort_key_val(tile_key, splat_id)

    starts = jnp.searchsorted(
        sorted_key, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    )
    return (
        sorted_id,
        starts,
        jnp.sum(jnp.where(live & span_overflow, 1, 0)),
    )


def _channel_matrix(
    pts, ellipse, cutoff, radii, extra_radius, scaler, features,
    backward_channels,
):
    """(P, C) per-splat channel matrix + the padding sentinel row."""
    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
    zeros = jnp.zeros_like(cutoff)
    if backward_channels:
        src = jnp.stack([px, py, pz, radii[:, 0], radii[:, 1]], axis=1)
        sentinel = jnp.array([2.0, 2.0, -1.0, 0.0, 0.0], jnp.float32)
    else:
        src = jnp.stack(
            [
                px,
                py,
                pz,
                ellipse[:, 0],
                ellipse[:, 1],
                ellipse[:, 2],
                cutoff,
                radii[:, 0] + extra_radius,
                radii[:, 1] + extra_radius,
                scaler if scaler is not None else zeros,
                features[:, 0] if features is not None else zeros,
                features[:, 1] if features is not None else zeros,
                features[:, 2] if features is not None else zeros,
                jnp.arange(pts.shape[0], dtype=jnp.float32),
            ],
            axis=1,
        )
        sentinel = jnp.array(
            [2.0, 2.0, -1.0, 0.0, 0.0, 0.0, -INF, 0.0, 0.0, 0.0, 0.0, 0.0,
             0.0, -1.0],
            jnp.float32,
        )
    return src.astype(jnp.float32), sentinel


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _tile_local_frame(xf, yf, tx, ty, tile_size, image_size, mxu_quadric):
    """Per-tile setup for the quadric evaluation: tile-center NDC coords
    (x0, y0), tile-local pixel coords, and the monomial basis
    u = [x², xy, y², x, y, 1] (TT, 6).  Centering at the tile keeps every
    coordinate ≲ 0.6·tile width in NDC, so the f32 cancellation in the
    matmul formulation stays ~1e-5 of q (uncentered, |a|·x²·eps ≈ 4e-4
    would sit right at the golden tolerance)."""
    if not mxu_quadric:
        return None, None, None
    inv_s = 1.0 / image_size
    t = tile_size
    x0 = 1.0 - (2 * tx * t + t).astype(jnp.float32) * inv_s
    y0 = 1.0 - (2 * ty * t + t).astype(jnp.float32) * inv_s
    xl = xf - x0  # (TT, 1)
    yl = yf - y0
    u = jnp.concatenate(
        [xl * xl, xl * yl, yl * yl, xl, yl, jnp.ones_like(xl)], axis=1
    )  # (TT, 6)
    return x0, y0, u


def _chunk_q_accept(
    px, py, pz, a, b, c, cut, rx, ry, *, xf, yf, frame, mxu_quadric
):
    """q (TT, CM) and the acceptance mask for one candidate chunk.

    mxu_quadric=True evaluates q = u · C as ONE MXU matmul per chunk (the
    3DGS tensor-core formulation) with C built from the conic + the
    tile-local splat center (per-candidate cost only); the box test becomes
    interval compares against precomputed bounds.  This moves ~10 VPU
    ops/element onto the MXU — the fragment kernels run at the VPU roofline,
    so op-count reduction is the remaining lever (BENCHMARKS.md target #1).
    Semantics contract unchanged: reference CheckPixelInsidePoint
    (rasterize_points.cu:64-124) — pz ≥ 0, axis-aligned box, Q ≤ cutoff.
    """
    if not mxu_quadric:
        dx = xf - px  # (TT, CM)
        dy = yf - py
        q = a * dx * dx + b * dx * dy + c * dy * dy
        accept = (
            (pz >= 0.0)
            & (jnp.abs(dx) <= rx)
            & (jnp.abs(dy) <= ry)
            & (q <= cut)
        )
        return q, accept
    x0, y0, u = frame
    pxl = px - x0  # (1, CM) tile-local splat centers
    pyl = py - y0
    cmat = jnp.concatenate(
        [
            a,
            b,
            c,
            -(2.0 * a * pxl + b * pyl),
            -(b * pxl + 2.0 * c * pyl),
            a * pxl * pxl + b * pxl * pyl + c * pyl * pyl,
        ],
        axis=0,
    )  # (6, CM)
    # f32 MXU passes (HIGHEST): bf16 passes would put ~0.4 absolute error on
    # a q that is compared against cutoff ≈ 1.
    q = jax.lax.dot_general(
        u,
        cmat,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    xl = u[:, 3:4]
    yl = u[:, 4:5]
    accept = (
        (pz >= 0.0)
        & (xl >= pxl - rx)
        & (xl <= pxl + rx)
        & (yl >= pyl - ry)
        & (yl <= pyl + ry)
        & (q <= cut)
    )
    return q, accept


def _fwd_kernel(
    counts_ref,  # (n_tiles,) SMEM scalar-prefetch: candidates per tile
    data_ref,  # (1, C, M) VMEM
    dmt_ref,  # (1, 1) SMEM: depth merging threshold (inputs precede outputs)
    z_out,  # (1, K, TT)
    q_out,  # (1, K, TT)
    pos_out,  # (1, K, TT) f32 GLOBAL splat id of the fragment (−1 = empty)
    cnt_out,  # (1, 1, TT) accepted count
    vis_out,  # (1, 1, M) per-candidate visibility flag (slot < K AND survives
    #           the depth-merge truncation, matching reference visibility)
    rgb_out,  # (1, 4, TT): weighted rgb sums + weight sum (fused compositing)
    *,
    tile_size: int,
    image_size: int,
    n_tiles_x: int,
    points_per_pixel: int,
    chunk: int,
    m: int,
    mxu_quadric: bool = False,
):
    t = tile_size
    tt = t * t
    k = points_per_pixel
    g = pl.program_id(0)
    ty = g // n_tiles_x
    tx = g % n_tiles_x

    # Pixel NDC centers for this tile; pixel index p = row*T + col.
    lin = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    row = ty * t + lin // t
    col = tx * t + lin % t
    inv_s = 1.0 / image_size
    yf = 1.0 - (2.0 * row.astype(jnp.float32) + 1.0) * inv_s  # (TT, 1)
    xf = 1.0 - (2.0 * col.astype(jnp.float32) + 1.0) * inv_s  # (TT, 1)
    frame = _tile_local_frame(xf, yf, tx, ty, t, image_size, mxu_quadric)

    # dynamic trip count: only sweep chunks that actually hold candidates
    n_cand = jnp.minimum(counts_ref[g], m)
    n_chunks = (n_cand + chunk - 1) // chunk

    # Inclusive prefix sums along the candidate axis via a lower-triangular
    # matmul on the MXU (cumsum has no Pallas TPU lowering; this is faster
    # anyway): incl = accept_f32 @ tri, tri[j, k] = 1[j <= k].
    row_j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    # bf16 operands are exact here (both sides are {0,1}; accumulation stays
    # f32), and a bf16 MXU pass is ~6x cheaper than the f32 decomposition.
    tri = (row_j <= col_k).astype(jnp.bfloat16)

    def body(i, carry):
        fz, fq, fpos, frgb, cnt = carry
        sl = pl.ds(i * chunk, chunk)
        px = data_ref[0, _CH_PX, sl][None, :]
        py = data_ref[0, _CH_PY, sl][None, :]
        pz = data_ref[0, _CH_PZ, sl][None, :]
        a = data_ref[0, _CH_A, sl][None, :]
        b = data_ref[0, _CH_B, sl][None, :]
        c = data_ref[0, _CH_C, sl][None, :]
        cut = data_ref[0, _CH_CUT, sl][None, :]
        rx = data_ref[0, _CH_RX, sl][None, :]
        ry = data_ref[0, _CH_RY, sl][None, :]
        sc = data_ref[0, _CH_SC, sl][None, :]
        cr = data_ref[0, _CH_R, sl]  # (CM,)
        cg = data_ref[0, _CH_G, sl]
        cb = data_ref[0, _CH_B2, sl]
        idf = data_ref[0, _CH_ID, sl][None, :]

        q, accept = _chunk_q_accept(
            px, py, pz, a, b, c, cut, rx, ry,
            xf=xf, yf=yf, frame=frame, mxu_quadric=mxu_quadric,
        )
        accf = accept.astype(jnp.float32)
        incl = jnp.dot(accf.astype(jnp.bfloat16), tri,
                           preferred_element_type=jnp.float32)
        # rank (exclusive prefix + running count); exact in f32 for counts
        # far below 2^24
        slot = cnt[:, None] + incl - accf  # (TT, CM)
        zrow = jnp.where(accept, pz, 0.0)
        qrow = jnp.where(accept, q, 0.0)

        # fragment slot kk (static) gets exactly one accepted candidate per
        # pixel across the whole loop → accumulate rows of (K, TT).
        # (no scatter: Pallas TPU has no scatter-add lowering)
        dz, dq, dp = [], [], []
        for kk in range(k):
            self_f = accf * (slot == float(kk)).astype(jnp.float32)
            dz.append(jnp.sum(zrow * self_f, axis=1))
            dq.append(jnp.sum(qrow * self_f, axis=1))
            dp.append(jnp.sum((idf + 1.0) * self_f, axis=1))  # +1: 0 = empty
        # depth-merge-aware win flag: rank 0's z for each pixel is final after
        # this chunk's dz[0] lands (candidates are depth-sorted)
        z0_now = fz[0] + dz[0]  # (TT,)
        in_window = (zrow - z0_now[:, None]) <= dmt_ref[0, 0]
        wins = (
            accf
            * (slot < float(k)).astype(jnp.float32)
            * in_window.astype(jnp.float32)
        )
        # fused compositing: weights = exp(-Q/2)·scaler over depth-merge
        # survivors — ONE MXU matmul (TT, CM) @ (CM, 4) per chunk instead of
        # 3K+K per-slot masked reductions (the weight sum rides in column 3)
        w = jnp.exp(-0.5 * qrow) * sc * wins  # (TT, CM)
        cmat = jnp.concatenate(
            [cr[:, None], cg[:, None], cb[:, None], jnp.ones((chunk, 1), jnp.float32)],
            axis=1,
        )  # (CM, 4)
        frgb = frgb + jnp.dot(w, cmat, preferred_element_type=jnp.float32)
        fz = fz + jnp.stack(dz, axis=0)
        fq = fq + jnp.stack(dq, axis=0)
        fpos = fpos + jnp.stack(dp, axis=0)
        cnt = cnt + jnp.sum(accf, axis=1)
        # per-candidate visibility: won a fragment slot in any pixel
        vis_out[0, 0, sl] = jnp.max(wins, axis=0)
        return fz, fq, fpos, frgb, cnt

    # outputs written per-chunk must be cleared for the skipped chunks
    vis_out[0, 0, :] = jnp.zeros((m,), jnp.float32)

    init = (
        jnp.zeros((k, tt), jnp.float32),
        jnp.zeros((k, tt), jnp.float32),
        jnp.zeros((k, tt), jnp.float32),
        jnp.zeros((tt, 4), jnp.float32),
        jnp.zeros((tt,), jnp.float32),
    )
    fz, fq, fpos, frgb, cnt = jax.lax.fori_loop(0, n_chunks, body, init)

    filled = fpos > 0.0
    z_out[0] = jnp.where(filled, fz, -1.0)
    q_out[0] = jnp.where(filled, fq, -1.0)
    pos_out[0] = fpos - 1.0  # −1 = empty
    cnt_out[0] = cnt[None, :]
    rgb_out[0] = frgb.T  # (4, TT)


def _fwd_kernel_lean(
    counts_ref,  # (V·n_tiles,) SMEM scalar-prefetch: candidates per tile
    data_ref,  # (1, G, C, M) VMEM (one view's tile batch)
    dmt_ref,  # (1, 1) SMEM: depth merging threshold
    cnt_out,  # (1, G, 1, TT) accepted count (occupancy = cnt > 0)
    vis_out,  # (1, G, 1, M) per-candidate visibility flag
    rgb_out,  # (1, G, 4(+1), TT): weighted rgb sums + weight sum (+ Σw·z)
    *,
    tile_size: int,
    image_size: int,
    n_tiles_x: int,
    points_per_pixel: int,
    chunk: int,
    m: int,
    tiles_per_step: int,
    mxu_quadric: bool = False,
    with_depth: bool = False,
):
    """Training-path variant of _fwd_kernel: no per-fragment z/q/id buffers —
    nothing in the train step reads them (the composite is fused, the feature
    gradient recomputes weights from the candidate table, visibility is
    per-candidate).  Dropping the K-slot rank-match accumulation (3K masked
    (TT, CM) reductions per chunk) leaves accept-test + one tri matmul + one
    composite matmul per chunk; z₀ for the depth window is a running min.
    Processes `tiles_per_step` tiles per grid step to amortize the ~15 µs
    fixed per-step overhead.

    View-batched: grid is (V, n_tiles/G) — one pallas call renders the whole
    camera batch (vmap of the call would lower to an XLA while loop over
    views with per-view dynamic slices, ~5 ms/step of overhead at 8 views)."""
    t = tile_size
    tt = t * t
    k = points_per_pixel
    vi = pl.program_id(0)
    pid = pl.program_id(1)
    n_tiles = n_tiles_x * n_tiles_x

    lin = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    inv_s = 1.0 / image_size
    row_j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    # bf16 operands are exact here (both sides are {0,1}; accumulation stays
    # f32), and a bf16 MXU pass is ~6x cheaper than the f32 decomposition.
    tri = (row_j <= col_k).astype(jnp.bfloat16)

    # static unroll over the tile batch: gs is a Python int, so every ref
    # index below is static and the compiler pipelines the whole step
    for gs in range(tiles_per_step):
        g = pid * tiles_per_step + gs
        ty = g // n_tiles_x
        tx = g % n_tiles_x
        row = ty * t + lin // t
        col = tx * t + lin % t
        yf = 1.0 - (2.0 * row.astype(jnp.float32) + 1.0) * inv_s
        xf = 1.0 - (2.0 * col.astype(jnp.float32) + 1.0) * inv_s
        frame = _tile_local_frame(xf, yf, tx, ty, t, image_size, mxu_quadric)

        n_cand = jnp.minimum(counts_ref[vi * n_tiles + g], m)
        n_chunks = (n_cand + chunk - 1) // chunk

        def body(i, carry, gs=gs, xf=xf, yf=yf, frame=frame):
            z0, frgb, cnt = carry
            sl = pl.ds(i * chunk, chunk)
            px = data_ref[0, gs, _CH_PX, sl][None, :]
            py = data_ref[0, gs, _CH_PY, sl][None, :]
            pz = data_ref[0, gs, _CH_PZ, sl][None, :]
            a = data_ref[0, gs, _CH_A, sl][None, :]
            b = data_ref[0, gs, _CH_B, sl][None, :]
            c = data_ref[0, gs, _CH_C, sl][None, :]
            cut = data_ref[0, gs, _CH_CUT, sl][None, :]
            rx = data_ref[0, gs, _CH_RX, sl][None, :]
            ry = data_ref[0, gs, _CH_RY, sl][None, :]
            sc = data_ref[0, gs, _CH_SC, sl][None, :]
            cr = data_ref[0, gs, _CH_R, sl]  # (CM,)
            cg = data_ref[0, gs, _CH_G, sl]
            cb = data_ref[0, gs, _CH_B2, sl]

            q, accept = _chunk_q_accept(
                px, py, pz, a, b, c, cut, rx, ry,
                xf=xf, yf=yf, frame=frame, mxu_quadric=mxu_quadric,
            )
            accf = accept.astype(jnp.float32)
            incl = jnp.dot(accf.astype(jnp.bfloat16), tri,
                           preferred_element_type=jnp.float32)
            slot = cnt[:, None] + incl - accf  # (TT, CM)
            # z₀ = depth of the first accepted candidate (depth-sorted) —
            # final for any pixel that accepted in this or an earlier chunk
            z0 = jnp.minimum(
                z0, jnp.min(jnp.where(accept, pz, jnp.inf), axis=1)
            )
            in_window = (pz - z0[:, None]) <= dmt_ref[0, 0]
            wins = (
                accf
                * (slot < float(k)).astype(jnp.float32)
                * in_window.astype(jnp.float32)
            )
            w = jnp.exp(-0.5 * jnp.where(accept, q, 0.0)) * sc * wins
            cols = [cr[:, None], cg[:, None], cb[:, None],
                    jnp.ones((chunk, 1), jnp.float32)]
            if with_depth:
                # weighted-depth column: channel 4 accumulates Σw·z so the
                # wrapper can form depth = Σwz/Σw without fragment buffers
                cols.append(pz[0][:, None])
            cmat = jnp.concatenate(cols, axis=1)  # (CM, 4(+1))
            frgb = frgb + jnp.dot(w, cmat, preferred_element_type=jnp.float32)
            cnt = cnt + jnp.sum(accf, axis=1)
            vis_out[0, gs, 0, sl] = jnp.max(wins, axis=0)
            return z0, frgb, cnt

        vis_out[0, gs, 0, :] = jnp.zeros((m,), jnp.float32)
        init = (
            jnp.full((tt,), jnp.inf, jnp.float32),
            jnp.zeros((tt, 5 if with_depth else 4), jnp.float32),
            jnp.zeros((tt,), jnp.float32),
        )
        _, frgb, cnt = jax.lax.fori_loop(0, n_chunks, body, init)
        cnt_out[0, gs] = cnt[None, :]
        rgb_out[0, gs] = frgb.T  # (4, TT)


def rasterize_forward_views_lean(
    pts: "jnp.ndarray",  # (V, P, 3)
    ellipse,  # (V, P, 3)
    cutoff,  # (V, P)
    radii,  # (V, P, 2)
    depth_merging_threshold,
    image_size: int,
    points_per_pixel: int,
    tile_size: int = 64,
    bin_capacity: int = 512,
    chunk: int = 128,
    max_tiles_xy: int = 4,
    scaler=None,  # (V, P)
    features=None,  # (V, P, 3)
    pair_cap: int | None = None,
    mxu_quadric: bool = False,
    tiled_out: bool = False,
    matmul_scatter: bool = False,
    with_depth: bool = False,
):
    """View-batched lean forward: per-view binning (vmapped jnp) + ONE
    pallas call with grid (V, n_tiles/G).  Same per-view math as the
    single-view path (parity-tested).  Returns (occ (V,S,S), visible (V,P),
    rgbw (V,S,S,4), overflow (V,), binned); with tiled_out, occ is
    (V, n_tiles, tt) and rgbw is (V, n_tiles, 4, tt) in the kernel's native
    tile order (see tile_images/untile_images).  with_depth appends a fifth
    rgbw channel carrying Σw·z (weighted view-space depth sum)."""
    s = image_size
    t = tile_size
    assert s % t == 0, "image_size must be a multiple of tile_size"
    nt = s // t
    n_tiles = nt * nt
    tt = t * t
    v, p = pts.shape[:2]

    binned = jax.vmap(
        lambda pt, el, cu, ra, sc, fe: bin_splats(
            pt, el, cu, ra, s, t, bin_capacity,
            max_tiles_x=max_tiles_xy, max_tiles_y=max_tiles_xy,
            scaler=sc, features=fe, pair_cap=pair_cap,
        )
    )(pts, ellipse, cutoff, radii, scaler, features)

    co = 5 if with_depth else 4
    g_batch = _tiles_per_step(n_tiles)
    kern = functools.partial(
        _fwd_kernel_lean,
        tile_size=t,
        image_size=s,
        n_tiles_x=nt,
        points_per_pixel=points_per_pixel,
        chunk=chunk,
        m=bin_capacity,
        tiles_per_step=g_batch,
        mxu_quadric=mxu_quadric,
        with_depth=with_depth,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(v, n_tiles // g_batch),
        in_specs=[
            pl.BlockSpec(
                (1, g_batch, N_CHANNELS, bin_capacity),
                lambda vi, i, counts: (vi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g_batch, 1, tt), lambda vi, i, counts: (vi, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_batch, 1, bin_capacity), lambda vi, i, counts: (vi, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_batch, co, tt), lambda vi, i, counts: (vi, i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    cnt_t, vis_t, rgb_t = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((v, n_tiles, 1, tt), jnp.float32),
            jax.ShapeDtypeStruct((v, n_tiles, 1, bin_capacity), jnp.float32),
            jax.ShapeDtypeStruct((v, n_tiles, co, tt), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(
        binned.tile_counts.reshape(-1),
        binned.tile_data,
        jnp.asarray(depth_merging_threshold, jnp.float32).reshape(1, 1),
    )

    ids = binned.tile_ids.reshape(v, -1)
    seg = jnp.where(ids >= 0, ids, p)
    if matmul_scatter:
        vis = segment_sum_views_matmul(
            vis_t.reshape(v, 1, -1), seg, p
        )[..., 0]
    else:
        vis = jax.vmap(
            lambda vf, sg: sorted_segment_sum(vf[:, None], sg, p)[:, 0]
        )(vis_t.reshape(v, -1), seg)
    visible = vis > 0.0
    if tiled_out:
        # Kernel-native tiled layout (V, n_tiles, [ch,] tt): the squeeze is
        # free and rgb_t passes through untouched — the (nt, t, nt, t)
        # untile transposes (and the matching re-tile of the cotangents in
        # the backward) disappear entirely.
        occ = (cnt_t[:, :, 0, :] > 0).astype(jnp.float32)
        return occ, visible, rgb_t, binned.overflow, binned

    def untile(x, ch):  # (V, n_tiles, ch, tt) -> (V, S, S, ch)
        x = x.reshape(v, nt, nt, ch, t, t)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
        return x.reshape(v, s, s, ch)

    occ = (untile(cnt_t, 1)[..., 0] > 0).astype(jnp.float32)
    rgbw = untile(rgb_t, co)
    return occ, visible, rgbw, binned.overflow, binned


def rasterize_forward_pallas_lean(
    pts: "jnp.ndarray",
    ellipse,
    cutoff,
    radii,
    depth_merging_threshold,
    image_size: int,
    points_per_pixel: int,
    tile_size: int = 64,
    bin_capacity: int = 512,
    chunk: int = 128,
    max_tiles_xy: int = 4,
    scaler=None,
    features=None,
    pair_cap: int | None = None,
    mxu_quadric: bool = False,
    with_depth: bool = False,
):
    """Lean forward, single view: wraps the view-batched kernel with V=1.
    Returns (occ (S,S), visible (P,), rgbw (S,S,4), overflow (), binned)."""
    p = pts.shape[0]
    occ, visible, rgbw, overflow, binned = rasterize_forward_views_lean(
        pts[None], ellipse[None], cutoff[None], radii[None],
        depth_merging_threshold, image_size, points_per_pixel,
        tile_size=tile_size, bin_capacity=bin_capacity, chunk=chunk,
        max_tiles_xy=max_tiles_xy, pair_cap=pair_cap,
        mxu_quadric=mxu_quadric, with_depth=with_depth,
        scaler=(jnp.zeros((p,), jnp.float32) if scaler is None else scaler)[None],
        features=(jnp.zeros((p, 3), jnp.float32) if features is None
                  else features)[None],
    )
    squeeze = jax.tree_util.tree_map(lambda x: x[0], binned)
    return occ[0], visible[0], rgbw[0], overflow[0], squeeze


def rasterize_forward_pallas(
    pts: jnp.ndarray,
    ellipse: jnp.ndarray,
    cutoff: jnp.ndarray,
    radii: jnp.ndarray,
    depth_merging_threshold,
    image_size: int,
    points_per_pixel: int,
    tile_size: int = 32,
    bin_capacity: int = 512,
    chunk: int = 128,
    max_tiles_xy: int = 4,
    scaler: jnp.ndarray | None = None,
    with_extras: bool = False,
    features: jnp.ndarray | None = None,
    with_binned: bool = False,
    pair_cap: int | None = None,
    mxu_quadric: bool = False,
):
    """Forward rasterization (one view) via tile binning + Pallas fragment
    kernel.  Returns (idx, zbuf, qvalue, occupancy) with the same semantics as
    dss_tpu.render.rasterizer._rasterize_rows; with_extras additionally
    returns (frag_scaler (S,S,K), visible (P,), rgbw (S,S,4), overflow ())
    computed in-kernel — this saves the big per-fragment gathers and the
    1.3M-element visibility segment_sum of the unfused path."""
    s = image_size
    t = tile_size
    assert s % t == 0, "image_size must be a multiple of tile_size"
    nt = s // t
    n_tiles = nt * nt
    k = points_per_pixel
    tt = t * t

    binned = bin_splats(
        pts, ellipse, cutoff, radii, s, t, bin_capacity,
        max_tiles_x=max_tiles_xy, max_tiles_y=max_tiles_xy,
        scaler=scaler, features=features, pair_cap=pair_cap,
    )

    kern = functools.partial(
        _fwd_kernel,
        tile_size=t,
        image_size=s,
        n_tiles_x=nt,
        points_per_pixel=k,
        chunk=chunk,
        m=bin_capacity,
        mxu_quadric=mxu_quadric,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, N_CHANNELS, bin_capacity),
                lambda i, counts: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, tt), lambda i, counts: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tt), lambda i, counts: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tt), lambda i, counts: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tt), lambda i, counts: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bin_capacity), lambda i, counts: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tt), lambda i, counts: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    z_t, q_t, pos_t, cnt_t, vis_t, rgb_t = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, k, tt), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, k, tt), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, k, tt), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, tt), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, bin_capacity), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 4, tt), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(
        binned.tile_counts,
        binned.tile_data,
        jnp.asarray(depth_merging_threshold, jnp.float32).reshape(1, 1),
    )

    # Un-tile to (S, S, K) image layout.
    def untile(x, ch):  # (n_tiles, ch, tt) → (S, S, ch)
        x = x.reshape(nt, nt, ch, t, t)
        x = jnp.transpose(x, (0, 3, 1, 4, 2))  # (nty, t, ntx, t, ch)
        return x.reshape(s, s, ch)

    zbuf = untile(z_t, k)
    qv = untile(q_t, k)
    cnt = untile(cnt_t, 1)[..., 0]

    # The kernel already emitted GLOBAL splat ids (−1 = empty) — no
    # position→id gather (10.5M-element gathers measured 210 ms/step).
    idx = untile(pos_t, k).astype(jnp.int32)
    valid = idx >= 0

    # Depth-merge truncation (candidates were depth-sorted → zbuf ascending).
    keep = valid & (zbuf - zbuf[..., :1] <= depth_merging_threshold)
    idx = jnp.where(keep, idx, -1)
    zbuf = jnp.where(keep, zbuf, -1.0)
    qv = jnp.where(keep, qv, -1.0)
    occ = (cnt > 0).astype(jnp.float32)
    if not with_extras:
        return idx, zbuf, qv, occ

    # per-fragment scaler is no longer materialized by the kernel: nothing on
    # the training path reads it (the composite is fused; the feature gradient
    # recomputes weights from the candidate table), and the gather that would
    # rebuild it is exactly the 1.3M-fragment pattern this module avoids.
    frag_scaler = None
    # candidate visibility flags → per-point over (n_tiles·M) candidates
    # instead of S·S·K fragments; the flags are 0/1 so "any" = sorted sum > 0
    # (scatter-max serializes like scatter-add).
    p = pts.shape[0]
    ids = binned.tile_ids.reshape(-1)
    seg = jnp.where(ids >= 0, ids, p)
    vis = sorted_segment_sum(vis_t.reshape(-1, 1), seg, p)[:, 0]
    visible = vis > 0.0
    rgbw = untile(rgb_t, 4)  # (S, S, 4): weighted rgb sums + weight sum
    out = (idx, zbuf, qv, occ, frag_scaler, visible, rgbw, binned.overflow)
    if with_binned:
        return out + (binned,)
    return out


# ---------------------------------------------------------------------------
# Backward (features through the fused composite) kernel
# ---------------------------------------------------------------------------


def _feat_bwd_kernel(
    counts_ref,  # (V·n_tiles,) SMEM scalar-prefetch: candidates per tile
    data_ref,  # (1, G, C, M) VMEM: the forward candidate table (depth-sorted)
    grad_ref,  # (1, G, TT, 4) VMEM — or (1, G, 4, TT) when grad_ch_first
    dmt_ref,  # (1, 1) SMEM: depth merging threshold
    gf_out,  # (1, G, 4, M): per-candidate sum_pix w*grad_rgb (rows 0..2)
    *,
    tile_size: int,
    image_size: int,
    n_tiles_x: int,
    points_per_pixel: int,
    chunk: int,
    m: int,
    tiles_per_step: int,
    mxu_quadric: bool = False,
    grad_ch_first: bool = False,
):
    """Feature gradient of the fused composite: rgb_out[pix,c] = sum_j w_j*c_j
    with w treated as locally constant (reference semantics), so
    gfeat[j,c] = sum_pix w[pix,j]*grad_rgb[pix,c] — ONE MXU matmul per chunk
    over the candidate table instead of a 1.3M-fragment segment sum (the
    fragment formulation measured ~65 ms/step at 512²×8 views).

    Recomputes accept/slot/window exactly as the forward kernel (candidates
    are depth-sorted; z₀ per pixel is a running min over accepted depths).
    View-batched: grid (V, n_tiles/G), one call per camera batch."""
    t = tile_size
    tt = t * t
    k = points_per_pixel
    vi = pl.program_id(0)
    pid = pl.program_id(1)
    n_tiles = n_tiles_x * n_tiles_x

    lin = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    inv_s = 1.0 / image_size
    row_j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    # bf16 operands are exact here (both sides are {0,1}; accumulation stays
    # f32), and a bf16 MXU pass is ~6x cheaper than the f32 decomposition.
    tri = (row_j <= col_k).astype(jnp.bfloat16)

    for gs in range(tiles_per_step):
        g = pid * tiles_per_step + gs
        ty = g // n_tiles_x
        tx = g % n_tiles_x
        row = ty * t + lin // t
        col = tx * t + lin % t
        yf = 1.0 - (2.0 * row.astype(jnp.float32) + 1.0) * inv_s
        xf = 1.0 - (2.0 * col.astype(jnp.float32) + 1.0) * inv_s

        n_cand = jnp.minimum(counts_ref[vi * n_tiles + g], m)
        n_chunks = (n_cand + chunk - 1) // chunk
        gf_out[0, gs, :, :] = jnp.zeros((4, m), jnp.float32)
        # (4, TT) either way; the ch-first (tiled_io) block needs no .T
        grad_t = grad_ref[0, gs] if grad_ch_first else grad_ref[0, gs].T
        frame = _tile_local_frame(xf, yf, tx, ty, t, image_size, mxu_quadric)

        def body(i, carry, gs=gs, xf=xf, yf=yf, grad_t=grad_t, frame=frame):
            z0, cnt = carry
            sl = pl.ds(i * chunk, chunk)
            px = data_ref[0, gs, _CH_PX, sl][None, :]
            py = data_ref[0, gs, _CH_PY, sl][None, :]
            pz = data_ref[0, gs, _CH_PZ, sl][None, :]
            a = data_ref[0, gs, _CH_A, sl][None, :]
            b = data_ref[0, gs, _CH_B, sl][None, :]
            c = data_ref[0, gs, _CH_C, sl][None, :]
            cut = data_ref[0, gs, _CH_CUT, sl][None, :]
            rx = data_ref[0, gs, _CH_RX, sl][None, :]
            ry = data_ref[0, gs, _CH_RY, sl][None, :]
            sc = data_ref[0, gs, _CH_SC, sl][None, :]

            q, accept = _chunk_q_accept(
                px, py, pz, a, b, c, cut, rx, ry,
                xf=xf, yf=yf, frame=frame, mxu_quadric=mxu_quadric,
            )
            accf = accept.astype(jnp.float32)
            incl = jnp.dot(accf.astype(jnp.bfloat16), tri,
                           preferred_element_type=jnp.float32)
            slot = cnt[:, None] + incl - accf
            z0 = jnp.minimum(
                z0, jnp.min(jnp.where(accept, pz, jnp.inf), axis=1)
            )
            in_window = (pz - z0[:, None]) <= dmt_ref[0, 0]
            wins = (
                accf
                * (slot < float(k)).astype(jnp.float32)
                * in_window.astype(jnp.float32)
            )
            w = jnp.exp(-0.5 * jnp.where(accept, q, 0.0)) * sc * wins
            # (4, TT) @ (TT, CM) on the MXU; rows 0..2 are the rgb grads
            gf_out[0, gs, :, sl] = jnp.dot(
                grad_t, w, preferred_element_type=jnp.float32
            )
            cnt = cnt + jnp.sum(accf, axis=1)
            return z0, cnt

        jax.lax.fori_loop(
            0,
            n_chunks,
            body,
            (jnp.full((tt,), jnp.inf, jnp.float32),
             jnp.zeros((tt,), jnp.float32)),
        )


def feat_backward_views(
    binned: BinnedSplats,  # view-batched leaves (V, ...)
    grad_rgbw: jnp.ndarray,  # (V, S, S, 4) — or (V, n_tiles, 4, tt) tiled
    depth_merging_threshold,
    p: int,
    image_size: int,
    points_per_pixel: int,
    tile_size: int,
    bin_capacity: int,
    chunk: int = 128,
    mxu_quadric: bool = False,
    grad_tiled: bool = False,
    matmul_scatter: bool = False,
    with_depth: bool = False,
) -> jnp.ndarray:
    """Per-point feature gradient (V, P, 3) from the saved forward tables.

    with_depth: the caller passes the Σw·z cotangent as grad row 3 (in place
    of the Σw cotangent, whose per-candidate image only reaches the detached
    weights); the kernel's row-3 output Σ_pix grad·w is then the z gradient,
    and the return is (V, P, 4) with the z grads in column 3."""
    s = image_size
    t = tile_size
    nt = s // t
    n_tiles = nt * nt
    tt = t * t
    v = grad_rgbw.shape[0]

    if grad_tiled:
        # Cotangent already in the kernel's tile order and channel-first
        # layout — pass straight through, no re-tile transpose.
        g_tiles = grad_rgbw
        g_spec = lambda G: pl.BlockSpec(
            (1, G, 4, tt), lambda vi, i, counts: (vi, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        g_tiles = (
            grad_rgbw.reshape(v, nt, t, nt, t, 4)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(v, n_tiles, tt, 4)
        )
        g_spec = lambda G: pl.BlockSpec(
            (1, G, tt, 4), lambda vi, i, counts: (vi, i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    g_batch = _tiles_per_step(n_tiles)
    kern = functools.partial(
        _feat_bwd_kernel,
        tile_size=t,
        image_size=s,
        n_tiles_x=nt,
        points_per_pixel=points_per_pixel,
        chunk=chunk,
        m=bin_capacity,
        tiles_per_step=g_batch,
        mxu_quadric=mxu_quadric,
        grad_ch_first=grad_tiled,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(v, n_tiles // g_batch),
        in_specs=[
            pl.BlockSpec(
                (1, g_batch, N_CHANNELS, bin_capacity),
                lambda vi, i, counts: (vi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            g_spec(g_batch),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, g_batch, 4, bin_capacity),
                lambda vi, i, counts: (vi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    (gf_t,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((v, n_tiles, 4, bin_capacity), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(
        binned.tile_counts.reshape(-1),
        binned.tile_data,
        g_tiles,
        jnp.asarray(depth_merging_threshold, jnp.float32).reshape(1, 1),
    )
    ids = binned.tile_ids.reshape(v, -1)
    seg = jnp.where(ids >= 0, ids, p)
    nch = 4 if with_depth else 3
    if matmul_scatter:
        # Channel-major without a transpose: each channel of the kernel's
        # (V, n_tiles, 4, M) output flattens to a (V, N) row directly.
        partials = jnp.stack(
            [gf_t[:, :, ch, :].reshape(v, -1) for ch in range(nch)], axis=1
        )
        return segment_sum_views_matmul(partials, seg, p)
    partials = gf_t[:, :, :nch, :].transpose(0, 1, 3, 2).reshape(v, -1, nch)
    return jax.vmap(lambda pa, sg: sorted_segment_sum(pa, sg, p))(
        partials, seg
    )


def feat_backward_pallas(
    binned: BinnedSplats,
    grad_rgbw: jnp.ndarray,  # (S, S, 4)
    depth_merging_threshold,
    p: int,
    image_size: int,
    points_per_pixel: int,
    tile_size: int,
    bin_capacity: int,
    chunk: int = 128,
    mxu_quadric: bool = False,
    with_depth: bool = False,
) -> jnp.ndarray:
    """Single-view wrapper over feat_backward_views."""
    batched = jax.tree_util.tree_map(lambda x: x[None], binned)
    return feat_backward_views(
        batched, grad_rgbw[None], depth_merging_threshold, p,
        image_size, points_per_pixel, tile_size, bin_capacity, chunk,
        mxu_quadric=mxu_quadric, with_depth=with_depth,
    )[0]


def _bwd_kernel(
    counts_ref,  # (V·n_tiles,) SMEM scalar-prefetch: candidates per tile
    data_ref,  # (1, G, C, M): candidate channels (rx/ry = UNSCALED radii)
    grad_ref,  # (1, G, TT_pad, 1): per-pixel grad_occ per tile
    misc_ref,  # (V, 1): per-view cur_r² (SMEM)
    gx_out,  # (1, G, 1, M)
    gy_out,  # (1, G, 1, M)
    *,
    tile_size: int,
    image_size: int,
    n_tiles_x: int,
    chunk: int,
    m: int,
    tiles_per_step: int,
):
    """Occupancy-gradient kernel (field d/‖d‖² with the grad>0∧outside-splat
    rule); view-batched: grid (V, n_tiles/G)."""
    t = tile_size
    tt = t * t
    vi = pl.program_id(0)
    pid = pl.program_id(1)
    n_tiles = n_tiles_x * n_tiles_x

    lin = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    inv_s = 1.0 / image_size
    cur_r2 = misc_ref[vi, 0]

    for gs in range(tiles_per_step):
        g = pid * tiles_per_step + gs
        ty = g // n_tiles_x
        tx = g % n_tiles_x
        row = ty * t + lin // t
        col = tx * t + lin % t
        yf = 1.0 - (2.0 * row.astype(jnp.float32) + 1.0) * inv_s
        xf = 1.0 - (2.0 * col.astype(jnp.float32) + 1.0) * inv_s
        gpix = grad_ref[0, gs, :tt, :]  # (TT, 1)

        n_cand = jnp.minimum(counts_ref[vi * n_tiles + g], m)
        n_chunks = (n_cand + chunk - 1) // chunk
        gx_out[0, gs, 0, :] = jnp.zeros((m,), jnp.float32)
        gy_out[0, gs, 0, :] = jnp.zeros((m,), jnp.float32)

        def body(i, _, gs=gs, xf=xf, yf=yf, gpix=gpix):
            sl = pl.ds(i * chunk, chunk)
            px = data_ref[0, gs, _BCH_PX, sl][None, :]
            py = data_ref[0, gs, _BCH_PY, sl][None, :]
            pz = data_ref[0, gs, _BCH_PZ, sl][None, :]
            rx = data_ref[0, gs, _BCH_RX, sl][None, :]
            ry = data_ref[0, gs, _BCH_RY, sl][None, :]

            dx = xf - px  # (TT, CM)
            dy = yf - py
            dist2 = dx * dx + dy * dy
            pt_ok = (
                (pz >= 0.0) & (jnp.abs(px) <= 1.0) & (jnp.abs(py) <= 1.0)
            )
            inside_support = dist2 <= cur_r2
            outside_splat = (jnp.abs(dx) > rx) | (jnp.abs(dy) > ry)
            contribute = (
                inside_support
                & pt_ok
                & (gpix != 0.0)
                & ~((gpix > 0.0) & outside_splat)
            )
            w = jnp.where(contribute, gpix / jnp.maximum(dist2, 1e-10), 0.0)
            # chunks cover disjoint candidate ranges → write straight to the
            # output refs (no loop-carried buffer, no scatter)
            gx_out[0, gs, 0, sl] = jnp.sum(w * dx, axis=0)
            gy_out[0, gs, 0, sl] = jnp.sum(w * dy, axis=0)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)


def masked_median(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of vals[mask] via ONE ascending sort (invalid → +inf pushes to
    the tail) + two dynamic gathers — nanmedian's full nan-aware reduction
    costs an extra pass per view.  Returns 0 when nothing is valid."""
    v = jnp.where(mask, vals, jnp.inf)
    sv = jnp.sort(v)
    n = jnp.sum(mask.astype(jnp.int32))
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    med = 0.5 * (sv[lo] + sv[hi])
    return jnp.where(n > 0, med, 0.0)


def bin_for_occ_backward(
    pts: jnp.ndarray,
    radii: jnp.ndarray,
    visible: jnp.ndarray,
    radii_backward_scaler,
    image_size: int,
    tile_size: int,
    bin_capacity: int,
    max_tiles_xy: int,
    pair_cap: int | None = None,
) -> Tuple[BinnedSplats, jnp.ndarray]:
    """Support-binning for the occupancy backward.  Depends only on FORWARD
    quantities (positions, radii, visibility, the annealed scaler) — so the
    custom-VJP forward builds it once, keeps it as a residual, and its
    overflow count is observable at runtime (the gradient-only backward path
    could never report it).  Returns (binned, cur_r²)."""
    p = pts.shape[0]

    # Search radius = median of visible splat radii, both axes pooled, ×
    # annealed scaler (reference rasterizer.py:888; must match the spec
    # _occ_backward's nanmedian over the (P, 2) pool).
    cur_r = (
        masked_median(radii.reshape(-1), jnp.repeat(visible, 2))
        * radii_backward_scaler
    )
    cur_r = jnp.where(jnp.isfinite(cur_r), cur_r, 0.0)
    cur_r2 = cur_r * cur_r

    # Candidates: visible points only, support circle = cur_r around the
    # point — bin with per-splat extra radius so every contributing
    # (pixel, point) pair lands in some tile's list.  Unscaled radii ride
    # along for the outside-splat test.  Invisible points are excluded by a
    # pz = −1 sentinel (extra_radius would otherwise make them "live").
    radii_for_bin = jnp.where(visible[:, None], radii, 0.0)
    pts_for_bin = jnp.where(
        visible[:, None], pts, jnp.array([2.0, 2.0, -1.0], pts.dtype)
    )
    binned = bin_splats(
        pts_for_bin,
        jnp.zeros((p, 3), jnp.float32),
        jnp.zeros((p,), jnp.float32),
        radii_for_bin,
        image_size,
        tile_size,
        bin_capacity,
        max_tiles_x=max_tiles_xy,
        max_tiles_y=max_tiles_xy,
        extra_radius=cur_r,
        sort_by_depth=False,
        backward_channels=True,  # 5-ch table stores the UNSCALED radii;
        # padding gets pz = −1 so pt_ok rejects it
        pair_cap=pair_cap,
    )
    return binned, cur_r2


def occ_backward_pallas(
    pts: jnp.ndarray,
    radii: jnp.ndarray,
    visible: jnp.ndarray,
    grad_occ: jnp.ndarray,
    radii_backward_scaler,
    image_size: int,
    tile_size: int = 32,
    bin_capacity: int = 1024,
    chunk: int = 128,
    max_tiles_xy: int = 8,
) -> jnp.ndarray:
    """Occupancy xy-gradient via support-binned Pallas reduction.  Semantics
    contract: dss_tpu.render.rasterizer._occ_backward (the executable spec)."""
    binned, cur_r2 = bin_for_occ_backward(
        pts, radii, visible, radii_backward_scaler,
        image_size, tile_size, bin_capacity, max_tiles_xy,
    )
    return occ_backward_from_binned(
        binned, cur_r2, grad_occ, pts.shape[0],
        image_size, tile_size, bin_capacity, chunk,
    )


def occ_backward_views_from_binned(
    binned: BinnedSplats,  # view-batched leaves (V, ...)
    cur_r2: jnp.ndarray,  # (V,)
    grad_occ: jnp.ndarray,  # (V, S, S) — or (V, n_tiles, tt) tiled
    p: int,
    image_size: int,
    tile_size: int,
    bin_capacity: int,
    chunk: int = 128,
    tiles_per_step: int = 1,
    grad_tiled: bool = False,
    matmul_scatter: bool = False,
) -> jnp.ndarray:
    """Occ-backward kernel over prebuilt per-view support tables; returns
    per-view xy gradients (V, P, 2)."""
    s = image_size
    t = tile_size
    nt = s // t
    n_tiles = nt * nt
    tt = t * t
    v = grad_occ.shape[0]

    if grad_tiled:
        # Already in tile order — the trailing unit axis is a free reshape.
        g_tiles = grad_occ.reshape(v, n_tiles, tt, 1)
    else:
        g_tiles = (
            grad_occ.reshape(v, nt, t, nt, t)
            .transpose(0, 1, 3, 2, 4)
            .reshape(v, n_tiles, tt, 1)
        )

    g_batch = _tiles_per_step(n_tiles, tiles_per_step)
    kern = functools.partial(
        _bwd_kernel,
        tile_size=t,
        image_size=s,
        n_tiles_x=nt,
        chunk=chunk,
        m=bin_capacity,
        tiles_per_step=g_batch,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(v, n_tiles // g_batch),
        in_specs=[
            pl.BlockSpec(
                (1, g_batch, N_BWD_CHANNELS, bin_capacity),
                lambda vi, i, counts: (vi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, g_batch, tt, 1), lambda vi, i, counts: (vi, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g_batch, 1, bin_capacity), lambda vi, i, counts: (vi, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_batch, 1, bin_capacity), lambda vi, i, counts: (vi, i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    gx_t, gy_t = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((v, n_tiles, 1, bin_capacity), jnp.float32),
            jax.ShapeDtypeStruct((v, n_tiles, 1, bin_capacity), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(binned.tile_counts.reshape(-1), binned.tile_data, g_tiles,
      jnp.asarray(cur_r2, jnp.float32).reshape(v, 1))

    # Scatter per-(view, tile, candidate) partials back to points (one
    # 2-channel sorted segment sum per view instead of scatter-adds).
    ids = binned.tile_ids.reshape(v, -1)
    seg = jnp.where(ids >= 0, ids, p)
    if matmul_scatter:
        partials = jnp.stack(
            [gx_t.reshape(v, -1), gy_t.reshape(v, -1)], axis=1
        )
        return segment_sum_views_matmul(partials, seg, p)
    partials = jnp.stack(
        [gx_t.reshape(v, -1), gy_t.reshape(v, -1)], axis=2
    )
    return jax.vmap(lambda pa, sg: sorted_segment_sum(pa, sg, p))(
        partials, seg
    )


def occ_backward_from_binned(
    binned: BinnedSplats,
    cur_r2: jnp.ndarray,
    grad_occ: jnp.ndarray,
    p: int,
    image_size: int,
    tile_size: int,
    bin_capacity: int,
    chunk: int = 128,
) -> jnp.ndarray:
    """Single-view wrapper over occ_backward_views_from_binned."""
    batched = jax.tree_util.tree_map(lambda x: x[None], binned)
    return occ_backward_views_from_binned(
        batched, jnp.asarray(cur_r2, jnp.float32).reshape(1), grad_occ[None],
        p, image_size, tile_size, bin_capacity, chunk,
    )[0]


# ---------------------------------------------------------------------------
# Differentiable entry point (same contract as
# dss_tpu.render.rasterizer.rasterize_points)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def rasterize_points_pallas(
    image_size: int,
    points_per_pixel: int,
    tile_config: Tuple[int, int, int, int],  # (tile, bin_cap, chunk, max_tiles)
    pts_screen: jnp.ndarray,
    ellipse_params: jnp.ndarray,
    cutoff: jnp.ndarray,
    radii: jnp.ndarray,
    depth_merging_threshold,
    radii_backward_scaler,
    scaler=None,
    features=None,
):
    """Pallas-backed drop-in for rasterize_points (one view); same semantics,
    gradients only to pts_screen (occupancy field + zbuf scatter) and, when
    `features` is given, to features through the fused composite.

    Returns (idx, zbuf, qvalue, occupancy, frag_scaler, visible, rgbw,
    overflow) where rgbw (S, S, 4) carries the weighted rgb sums + weight sum
    computed in-kernel (weights = exp(-Q/2)·scaler over depth-merge survivors,
    treated as locally constant per the reference semantics,
    rasterizer.py:562-565) and overflow () int32 counts the candidates
    dropped by the static tile/capacity budgets across the forward AND the
    occ-backward binning — nonzero means fragments or silhouette gradients
    were lost and the budgets need raising.
    """
    out, _binned_fwd, _binned_bwd, _cur_r2 = _rasterize_with_bwd_table(
        image_size, points_per_pixel, tile_config,
        pts_screen, ellipse_params, cutoff, radii,
        depth_merging_threshold, radii_backward_scaler, scaler, features,
    )
    return out


class TileCfg(NamedTuple):
    """tile_config normalized to its full 11 entries; missing trailing
    entries (the plain 4-tuples used by tests and older callers) default to
    -1 = auto."""

    tile: int
    cap: int
    chunk: int
    max_tiles: int
    max_tiles_bwd: int
    pair_cap_fwd: int
    pair_cap_bwd: int
    # >0 = MXU quadric, else the elementwise q (the production default —
    # the quadric measured slower on v5e).
    mxu_quadric: int
    # >0 = the view-batched lean entry exchanges images in the kernels'
    # native tiled layout (see rasterize_views_pallas_lean).
    tiled_io: int
    # >0 = per-point gradient/visibility scatters run as MXU one-hot
    # matmuls (segment_sum_views_matmul) instead of sort+cumsum.
    matmul_scatter: int
    # >0 = the lean compositor carries a weighted-depth column (Σw·z as
    # rgbw channel 4); gradients reach point z through the feature-backward
    # matmul's spare row (see rasterize_views_pallas_lean).
    depth_channel: int


def _tile_cfg(tile_config) -> TileCfg:
    tc = tuple(tile_config)
    return TileCfg(*(tc + (-1,) * (11 - len(tc)))[:11])


def _bwd_tile_budget(tile_config, p=None):
    t, cap, chunk, mt, mt_bwd, _pcf, pcb = _tile_cfg(tile_config)[:7]
    # Support AABB side = 2·(radius + scaled-median) px: ~70 px at the
    # initial scaler, spanning ≤ 3 tiles of 64 — a 4-tile budget covers it
    # with margin (36-slot budgets doubled the pair-sort cost at 100k pts).
    # Dense clouds need less: median radius (and with it the support disc)
    # shrinks with point spacing (~22 px AABB at 100k, ≤ 2 tiles), while the
    # P·rep pair arrays feed every sort — rep 16 → 4 at large P cuts the two
    # 1.6M-pair sorts 4×.  Span overflow is reported (and the train CLI
    # warns) if a scene violates the smaller budget.
    # Capacity must absorb the support-disc replication: central tiles of a
    # concentrated scene see most visible points (measured 6.3k dropped/view
    # on the yoga6 flagship at cap 512 — lost silhouette gradients).  The
    # kernel's trip count is dynamic (counts_ref), so extra capacity costs
    # only table build + block DMA.  bin_splats reports any residual
    # overflow.
    if mt_bwd <= 0:  # auto; an explicit value (ADVICE r2) is used verbatim
        mt_bwd = max(mt, 4) if (p is None or p <= 20000) else min(mt, 2)
    cap_bwd = max(cap, 2048)
    if p is not None and 6000 < p <= 20000:
        # Concentrated mid-size clouds: busiest-tile backward occupancy
        # measured 0.56·P early-anneal (scripts/diag_overflow.py, E20 10k
        # cloud — the 2048 floor dropped 27.8k pairs/iter there); 0.75·P
        # covers it with margin.  P <= 6k fits the 2048 floor; P > 20k uses
        # the dense-cloud rule (radii shrink with spacing).
        cap_bwd = max(cap_bwd, (-(-(3 * p) // 4) + 127) // 128 * 128)
    return t, cap_bwd, chunk, mt_bwd, (pcb if pcb > 0 else None)


def _rasterize_with_bwd_table(image_size, points_per_pixel, tile_config,
                              pts_screen, ellipse_params, cutoff, radii,
                              dmt, radii_backward_scaler, scaler, features):
    t, cap, chunk, mt, _mtb, pcf, _pcb, mxq = _tile_cfg(tile_config)[:8]
    p = pts_screen.shape[0]
    (idx, zbuf, qv, occ, frag_scaler, visible, rgbw, fwd_overflow,
     binned_fwd) = rasterize_forward_pallas(
        pts_screen, ellipse_params, cutoff, radii,
        dmt, image_size, points_per_pixel,
        tile_size=t, bin_capacity=cap, chunk=chunk, max_tiles_xy=mt,
        scaler=scaler, with_extras=True, features=features, with_binned=True,
        pair_cap=(pcf if pcf > 0 else None), mxu_quadric=(mxq > 0),
    )
    # The occ-backward candidate table depends only on forward quantities —
    # build it here so (a) its overflow is part of the observable output and
    # (b) the backward pass skips the bin entirely.
    bt, bcap, _, bmt, bpc = _bwd_tile_budget(tile_config, p)
    binned_bwd, cur_r2 = bin_for_occ_backward(
        pts_screen, radii, visible, radii_backward_scaler,
        image_size, bt, bcap, bmt, pair_cap=bpc,
    )
    overflow = (fwd_overflow + binned_bwd.overflow).astype(jnp.int32)
    out = (idx, zbuf, qv, occ, frag_scaler, visible, rgbw, overflow)
    return out, binned_fwd, binned_bwd, cur_r2


def _pallas_fwd(image_size, points_per_pixel, tile_config, pts_screen,
                ellipse_params, cutoff, radii, dmt, radii_backward_scaler,
                scaler=None, features=None):
    out, binned_fwd, binned_bwd, cur_r2 = _rasterize_with_bwd_table(
        image_size, points_per_pixel, tile_config,
        pts_screen, ellipse_params, cutoff, radii, dmt, radii_backward_scaler,
        scaler, features,
    )
    # residuals: idx for the zbuf scatter, the forward candidate table for
    # the feature-gradient kernel, the prebuilt occ-backward candidate table
    return out, (pts_screen, out[0], binned_fwd, binned_bwd, cur_r2, dmt)


def _pallas_bwd(image_size, points_per_pixel, tile_config, residuals, grads):
    from dss_tpu.render.rasterizer import _zbuf_backward

    (pts_screen, idx, binned_fwd, binned_bwd, cur_r2, dmt) = residuals
    (_, grad_zbuf, _grad_q, grad_occ, _grad_sc, _grad_vis, grad_rgbw,
     _grad_of) = grads
    p = pts_screen.shape[0]
    t, cap, chunk = tile_config[:3]
    mxq = _tile_cfg(tile_config).mxu_quadric
    bt, bcap, _, _, _ = _bwd_tile_budget(tile_config, p)

    grad_xy = occ_backward_from_binned(
        binned_bwd, cur_r2, grad_occ, p,
        image_size, tile_size=bt, bin_capacity=bcap, chunk=chunk,
    )
    # zbuf grads are usually materialized zeros (no depth loss in the default
    # workloads) — custom_vjp can't see that statically, but a runtime cond
    # skips the (S·S·K)-fragment segment_sum for the cost of one reduction.
    grad_z = jax.lax.cond(
        jnp.any(grad_zbuf != 0.0),
        lambda: _zbuf_backward(idx, grad_zbuf, p),
        lambda: jnp.zeros((p,), pts_screen.dtype),
    )
    grad_pts = jnp.concatenate([grad_xy, grad_z[:, None]], axis=-1)

    # feature gradient through the fused composite (weights locally constant
    # per reference semantics): per-candidate Wᵀ·grad_rgb matmul over the
    # saved forward table + a 32k-candidate segment sum — replaces the
    # 1.3M-fragment formulation (measured ~65 ms/step at 512²×8 views).
    grad_features = feat_backward_pallas(
        binned_fwd, grad_rgbw, dmt, p, image_size, points_per_pixel,
        tile_size=t, bin_capacity=cap, chunk=chunk, mxu_quadric=(mxq > 0),
    )

    return (
        grad_pts,
        jnp.zeros((p, 3), pts_screen.dtype),
        jnp.zeros((p,), pts_screen.dtype),
        jnp.zeros((p, 2), pts_screen.dtype),
        jnp.zeros(()),
        jnp.zeros(()),
        jnp.zeros((p,), pts_screen.dtype),
        grad_features,
    )


rasterize_points_pallas.defvjp(_pallas_fwd, _pallas_bwd)


# ---------------------------------------------------------------------------
# Lean differentiable entry point (training path: no fragment buffers)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def rasterize_points_pallas_lean(
    image_size: int,
    points_per_pixel: int,
    tile_config: Tuple[int, int, int, int],
    pts_screen: jnp.ndarray,
    ellipse_params: jnp.ndarray,
    cutoff: jnp.ndarray,
    radii: jnp.ndarray,
    depth_merging_threshold,
    radii_backward_scaler,
    scaler=None,
    features=None,
):
    """Training-path rasterization: returns only what the train step consumes
    — (occupancy (S,S), visible (P,), rgbw (S,S,4), overflow ()).  Identical
    math to rasterize_points_pallas for those outputs (parity-tested); skips
    the per-fragment z/q/id buffers, their untiling, and the zbuf-grad path
    (no depth losses in the lean contract — use the full entry point for
    those)."""
    out, _bf, _bb, _cr2 = _rasterize_lean_with_tables(
        image_size, points_per_pixel, tile_config,
        pts_screen, ellipse_params, cutoff, radii,
        depth_merging_threshold, radii_backward_scaler, scaler, features,
    )
    return out


def _rasterize_lean_with_tables(image_size, points_per_pixel, tile_config,
                                pts_screen, ellipse_params, cutoff, radii,
                                dmt, radii_backward_scaler, scaler, features):
    cfg = _tile_cfg(tile_config)
    t, cap, chunk, mt, _mtb, pcf, _pcb, mxq = cfg[:8]
    p = pts_screen.shape[0]
    occ, visible, rgbw, fwd_overflow, binned_fwd = (
        rasterize_forward_pallas_lean(
            pts_screen, ellipse_params, cutoff, radii,
            dmt, image_size, points_per_pixel,
            tile_size=t, bin_capacity=cap, chunk=chunk, max_tiles_xy=mt,
            scaler=scaler, features=features,
            pair_cap=(pcf if pcf > 0 else None), mxu_quadric=(mxq > 0),
            with_depth=(cfg.depth_channel > 0),
        )
    )
    bt, bcap, _, bmt, bpc = _bwd_tile_budget(tile_config, p)
    binned_bwd, cur_r2 = bin_for_occ_backward(
        pts_screen, radii, visible, radii_backward_scaler,
        image_size, bt, bcap, bmt, pair_cap=bpc,
    )
    overflow = (fwd_overflow + binned_bwd.overflow).astype(jnp.int32)
    out = (occ, visible, rgbw, overflow)
    return out, binned_fwd, binned_bwd, cur_r2


def _pallas_lean_fwd(image_size, points_per_pixel, tile_config, pts_screen,
                     ellipse_params, cutoff, radii, dmt,
                     radii_backward_scaler, scaler=None, features=None):
    out, binned_fwd, binned_bwd, cur_r2 = _rasterize_lean_with_tables(
        image_size, points_per_pixel, tile_config,
        pts_screen, ellipse_params, cutoff, radii, dmt,
        radii_backward_scaler, scaler, features,
    )
    return out, (pts_screen, binned_fwd, binned_bwd, cur_r2, dmt)


def _pallas_lean_bwd(image_size, points_per_pixel, tile_config, residuals,
                     grads):
    (pts_screen, binned_fwd, binned_bwd, cur_r2, dmt) = residuals
    (grad_occ, _grad_vis, grad_rgbw, _grad_of) = grads
    p = pts_screen.shape[0]
    t, cap, chunk = tile_config[:3]
    cfg = _tile_cfg(tile_config)
    mxq = cfg.mxu_quadric
    with_depth = cfg.depth_channel > 0
    bt, bcap, _, _, _ = _bwd_tile_budget(tile_config, p)

    grad_xy = occ_backward_from_binned(
        binned_bwd, cur_r2, grad_occ, p,
        image_size, tile_size=bt, bin_capacity=bcap, chunk=chunk,
    )
    if with_depth:
        # rows [0..2] rgb cotangent + row 3 = Σw·z cotangent (see
        # _views_lean_bwd for the spare-row reuse rationale)
        g_kernel = jnp.concatenate(
            [grad_rgbw[..., :3], grad_rgbw[..., 4:5]], axis=-1
        )
    else:
        g_kernel = grad_rgbw
    grad_features = feat_backward_pallas(
        binned_fwd, g_kernel, dmt, p, image_size, points_per_pixel,
        tile_size=t, bin_capacity=cap, chunk=chunk, mxu_quadric=(mxq > 0),
        with_depth=with_depth,
    )
    if with_depth:
        grad_z = grad_features[..., 3:4]
        grad_features = grad_features[..., :3]
    else:
        grad_z = jnp.zeros((p, 1), pts_screen.dtype)
    grad_pts = jnp.concatenate([grad_xy, grad_z], axis=-1)
    return (
        grad_pts,
        jnp.zeros((p, 3), pts_screen.dtype),
        jnp.zeros((p,), pts_screen.dtype),
        jnp.zeros((p, 2), pts_screen.dtype),
        jnp.zeros(()),
        jnp.zeros(()),
        jnp.zeros((p,), pts_screen.dtype),
        grad_features,
    )


rasterize_points_pallas_lean.defvjp(_pallas_lean_fwd, _pallas_lean_bwd)


# ---------------------------------------------------------------------------
# View-batched lean entry point (the training/bench hot path)
# ---------------------------------------------------------------------------


def tile_images(img: "jnp.ndarray", tile_size: int) -> "jnp.ndarray":
    """(V, S, S) → (V, n_tiles, tt) or (V, S, S, C) → (V, n_tiles, C, tt):
    the kernels' native tiled layout (channel-first inside a tile so the
    minor dimension stays the lane-efficient tt).  Used to pre-tile loss
    targets ONCE at dataset upload when RasterSettings.tiled_io is on —
    after that, images never leave tile order on the hot path."""
    t = tile_size
    if img.ndim == 3:
        v, s, _ = img.shape
        nt = s // t
        x = img.reshape(v, nt, t, nt, t).transpose(0, 1, 3, 2, 4)
        return x.reshape(v, nt * nt, t * t)
    v, s, _, c = img.shape
    nt = s // t
    x = img.reshape(v, nt, t, nt, t, c).transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(v, nt * nt, c, t * t)


def untile_images(img_t: "jnp.ndarray", image_size: int) -> "jnp.ndarray":
    """Inverse of tile_images: (V, n_tiles, tt) → (V, S, S) or
    (V, n_tiles, C, tt) → (V, S, S, C).  Off the hot path (validation,
    visualization)."""
    s = image_size
    if img_t.ndim == 3:
        v, n_tiles, tt = img_t.shape
        nt = int(round(n_tiles ** 0.5))
        t = s // nt
        x = img_t.reshape(v, nt, nt, t, t).transpose(0, 1, 3, 2, 4)
        return x.reshape(v, s, s)
    v, n_tiles, c, tt = img_t.shape
    nt = int(round(n_tiles ** 0.5))
    t = s // nt
    x = img_t.reshape(v, nt, nt, c, t, t).transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(v, s, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def rasterize_views_pallas_lean(
    image_size: int,
    points_per_pixel: int,
    tile_config: Tuple[int, int, int, int],
    pts_screen: jnp.ndarray,  # (V, P, 3)
    ellipse_params: jnp.ndarray,  # (V, P, 3)
    cutoff: jnp.ndarray,  # (V, P)
    radii: jnp.ndarray,  # (V, P, 2)
    depth_merging_threshold,
    radii_backward_scaler,
    scaler: jnp.ndarray,  # (V, P)
    features: jnp.ndarray,  # (V, P, 3)
):
    """View-batched training-path rasterization: the camera batch renders in
    ONE pallas call per kernel with grid (V, n_tiles/G) — vmap of the
    single-view entry instead lowers to an XLA while loop over views with
    per-view dynamic slices (profiled ~5 ms/step of overhead at 8 views).
    Per-view math is identical to rasterize_points_pallas_lean
    (parity-tested); gradients reach pts_screen (occupancy field) and
    features (fused-composite weights treated locally constant).

    Returns (occ (V,S,S), visible (V,P), rgbw (V,S,S,4), overflow (V,)).
    With tile_config[8] (tiled_io) > 0, occ/rgbw are returned — and their
    cotangents consumed — in the kernels' native tiled layout
    ((V, n_tiles, tt) / (V, n_tiles, 4, tt)): the untile transposes and the
    backward's re-tile of grad_occ/grad_rgbw disappear entirely (measured
    ~3 ms/step of pure relayout at the 512²×8-view bench shape)."""
    out, _res = _views_lean_fwd_impl(
        image_size, points_per_pixel, tile_config,
        pts_screen, ellipse_params, cutoff, radii,
        depth_merging_threshold, radii_backward_scaler, scaler, features,
    )
    return out


def _views_lean_fwd_impl(image_size, points_per_pixel, tile_config,
                         pts_screen, ellipse_params, cutoff, radii,
                         dmt, radii_backward_scaler, scaler, features):
    cfg = _tile_cfg(tile_config)
    t, cap, chunk, mt, _mtb, pcf, _pcb, mxq, tio, mmsv = cfg[:10]
    mms = mmsv > 0
    p = pts_screen.shape[1]
    occ, visible, rgbw, fwd_overflow, binned_fwd = (
        rasterize_forward_views_lean(
            pts_screen, ellipse_params, cutoff, radii,
            dmt, image_size, points_per_pixel,
            tile_size=t, bin_capacity=cap, chunk=chunk, max_tiles_xy=mt,
            scaler=scaler, features=features,
            pair_cap=(pcf if pcf > 0 else None), mxu_quadric=(mxq > 0),
            tiled_out=(tio > 0), matmul_scatter=mms,
            with_depth=(cfg.depth_channel > 0),
        )
    )
    bt, bcap, _, bmt, bpc = _bwd_tile_budget(tile_config, p)

    def bin_bwd_one(pts_v, radii_v, vis_v):
        return bin_for_occ_backward(
            pts_v, radii_v, vis_v, radii_backward_scaler,
            image_size, bt, bcap, bmt, pair_cap=bpc,
        )

    binned_bwd, cur_r2 = jax.vmap(bin_bwd_one)(pts_screen, radii, visible)
    overflow = (fwd_overflow + binned_bwd.overflow).astype(jnp.int32)
    out = (occ, visible, rgbw, overflow)
    return out, (pts_screen, binned_fwd, binned_bwd, cur_r2, dmt)


def _views_lean_fwd(image_size, points_per_pixel, tile_config, pts_screen,
                    ellipse_params, cutoff, radii, dmt,
                    radii_backward_scaler, scaler, features):
    out, res = _views_lean_fwd_impl(
        image_size, points_per_pixel, tile_config,
        pts_screen, ellipse_params, cutoff, radii, dmt,
        radii_backward_scaler, scaler, features,
    )
    return out, res


def _views_lean_bwd(image_size, points_per_pixel, tile_config, residuals,
                    grads):
    (pts_screen, binned_fwd, binned_bwd, cur_r2, dmt) = residuals
    (grad_occ, _grad_vis, grad_rgbw, _grad_of) = grads
    v, p = pts_screen.shape[:2]
    t, cap, chunk = tile_config[:3]
    mxq, tio, mmsv, dch = _tile_cfg(tile_config)[7:11]
    mms = mmsv > 0
    with_depth = dch > 0
    bt, bcap, _, _, _ = _bwd_tile_budget(tile_config, p)
    # tiled cotangents arrive in forward-tile order; the occ-backward table
    # uses the same tile size (only capacity/replication budgets differ)
    assert not (tio > 0) or bt == t

    grad_xy = occ_backward_views_from_binned(
        binned_bwd, cur_r2, grad_occ, p, image_size,
        tile_size=bt, bin_capacity=bcap, chunk=chunk,
        grad_tiled=(tio > 0), matmul_scatter=mms,
    )
    if with_depth:
        # The feature-backward kernel's grad input is fixed at 4 rows; its
        # row-3 output (Σ_pix grad·w, the Σw cotangent's per-candidate
        # image) is discarded in rgb-only mode because w is treated locally
        # constant.  Reuse that spare row for the depth-sum channel: rows
        # [0..2] = rgb cotangent, row 3 = Σw·z cotangent, whose per-
        # candidate image Σ_pix grad_zsum·w IS the z gradient (d(Σwz)/dz_j
        # = w_j — the reference's zbuf-scatter semantics,
        # rasterize_points.cu:823-885, generalized from top-1 to the merge
        # window).  The Σw cotangent (channel 3) is dropped — its gradient
        # flows only to the detached weights.
        if tio > 0:
            g_kernel = jnp.concatenate(
                [grad_rgbw[:, :, :3, :], grad_rgbw[:, :, 4:5, :]], axis=2
            )
        else:
            g_kernel = jnp.concatenate(
                [grad_rgbw[..., :3], grad_rgbw[..., 4:5]], axis=-1
            )
    else:
        g_kernel = grad_rgbw
    grad_features = feat_backward_views(
        binned_fwd, g_kernel, dmt, p, image_size, points_per_pixel,
        tile_size=t, bin_capacity=cap, chunk=chunk, mxu_quadric=(mxq > 0),
        grad_tiled=(tio > 0), matmul_scatter=mms,
        with_depth=with_depth,
    )
    if with_depth:
        grad_z = grad_features[..., 3:4]
        grad_features = grad_features[..., :3]
    else:
        grad_z = jnp.zeros((v, p, 1), pts_screen.dtype)
    grad_pts = jnp.concatenate([grad_xy, grad_z], axis=-1)
    return (
        grad_pts,
        jnp.zeros((v, p, 3), pts_screen.dtype),
        jnp.zeros((v, p), pts_screen.dtype),
        jnp.zeros((v, p, 2), pts_screen.dtype),
        jnp.zeros(()),
        jnp.zeros(()),
        jnp.zeros((v, p), pts_screen.dtype),
        grad_features,
    )


rasterize_views_pallas_lean.defvjp(_views_lean_fwd, _views_lean_bwd)
