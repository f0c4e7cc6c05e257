"""k-nearest-neighbor search, TPU-native.

Replaces the reference's pytorch3d `knn_points` and the FRNN CUDA submodule
(fixed-radius grid search, see SURVEY.md §2.9).  Two paths:

- `knn_points`: masked brute force, chunked over queries.  Distance matrices
  are big batched matmuls -> MXU-friendly; right choice up to a few 10k points.
- `grid_knn_points`: uniform-grid accelerated kNN: cell-id sort
  (`jax.lax.sort_key_val` replaces FRNN's counting sort + prefix_sum CUDA
  kernels) + bounded 3x3x3 cell neighborhood gather.  O(P * bucket) instead of
  O(P^2); static shapes throughout.

Invalid results are padded with idx=-1 and dist=inf.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

INF = jnp.inf


def _sq_dists(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """(Q, 3) x (P, 3) -> (Q, P) squared distances via the matmul expansion
    (keeps the FLOPs on the MXU)."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)  # (Q, 1)
    rr = jnp.sum(r * r, axis=-1)[None, :]  # (1, P)
    # HIGHEST: default matmul precision drops to bf16 passes (TPU and XLA:CPU),
    # which is far too coarse for nearest-neighbor distance ordering.
    cross = jnp.dot(q, r.T, precision=jax.lax.Precision.HIGHEST)  # (Q, P)  MXU
    d = qq + rr - 2.0 * cross
    return jnp.maximum(d, 0.0)


@partial(jax.jit, static_argnames=("k", "exclude_self", "query_chunk",
                                   "approx", "recall_target"))
def knn_points(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    query_mask: Optional[jnp.ndarray] = None,
    ref_mask: Optional[jnp.ndarray] = None,
    k: int = 8,
    exclude_self: bool = False,
    query_chunk: int = 4096,
    approx: bool = False,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked brute-force kNN.

    Args:
      query: (Q, 3); ref: (P, 3).
      query_mask/ref_mask: validity masks; invalid refs never matched.
      exclude_self: drop the zero-distance self match (ref is query).
      approx: select neighbors with `lax.approx_min_k` (the TPU PartialReduce
        custom call) instead of `lax.top_k`.  On TPU, top_k lowers to a FULL
        bitonic sort of every P-wide distance row — the multi-scene profile
        showed 3.5 s/step of (4, 4096, 25000) sorts, 87% of the step; the
        partial reduce is a single pass at `recall_target` expected recall.
        On CPU XLA falls back to the exact top-k (verified bitwise), so
        test parity is unaffected.

        The PartialReduce keeps per-SEGMENT winners, so its recall guarantee
        assumes the minima are spread uniformly over the reduced axis.  Point
        clouds violate that badly: mesh-sampled / fibonacci orderings place
        spatial neighbors at ADJACENT indices, so a query's true k
        nearest all land in one or two segments and collide (measured
        all-k row agreement at k=11: 0.005 at P=25k, ~0 at P=100k —
        bench_knn r4).  Fix: shuffle the reference axis with a fixed
        pseudo-random permutation before the reduce and map indices back.
        The permutation is a compile-time constant (fixed key), the extra
        cost is one (P,3) gather + one (Q,k) index remap.
    Returns:
      (sq_dists (Q, k), idx (Q, k) int32) — ascending; invalid slots inf/-1.
    """
    qn = query.shape[0]
    pn = ref.shape[0]
    if query_mask is None:
        query_mask = jnp.ones((qn,), bool)
    if ref_mask is None:
        ref_mask = jnp.ones((pn,), bool)

    k_eff = min(k + (1 if exclude_self else 0), pn)

    if approx:
        # De-correlate index order from spatial order (see docstring): a
        # fixed-key permutation of the reference axis, constant-folded by
        # XLA.  Selection happens in permuted space; indices map back below.
        perm = jax.random.permutation(jax.random.PRNGKey(0x5eed), pn)
        ref = ref[perm]
        ref_mask = ref_mask[perm]
        ref_ids = perm  # permuted-slot -> original index
    else:
        ref_ids = jnp.arange(pn)

    def chunk_fn(args):
        q, qmask, qidx = args
        d = _sq_dists(q, ref)
        d = jnp.where(ref_mask[None, :], d, INF)
        if exclude_self:
            same = qidx[:, None] == ref_ids[None, :]
            d = jnp.where(same, INF, d)
        if approx:
            dists, slot = jax.lax.approx_min_k(
                d, k_eff, recall_target=recall_target
            )
            idx = ref_ids[slot]
        else:
            neg_top, idx = jax.lax.top_k(-d, k_eff)
            dists = -neg_top
        idx = jnp.where(jnp.isinf(dists), -1, idx)
        if k_eff < k:
            pad = k - k_eff
            dists = jnp.pad(dists, ((0, 0), (0, pad)), constant_values=INF)
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        else:
            dists = dists[:, :k]
            idx = idx[:, :k]
        dists = jnp.where(qmask[:, None], dists, INF)
        idx = jnp.where(qmask[:, None], idx, -1)
        return dists, idx

    if qn <= query_chunk:
        return chunk_fn((query, query_mask, jnp.arange(qn)))

    # Pad to a multiple of the chunk and scan.
    pad = (-qn) % query_chunk
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    mpad = jnp.pad(query_mask, (0, pad))
    ipad = jnp.pad(jnp.arange(qn), (0, pad), constant_values=-1)
    nchunks = (qn + pad) // query_chunk
    qc = qpad.reshape(nchunks, query_chunk, 3)
    mc = mpad.reshape(nchunks, query_chunk)
    ic = ipad.reshape(nchunks, query_chunk)
    dists, idx = jax.lax.map(chunk_fn, (qc, mc, ic))
    dists = dists.reshape(-1, k)[:qn]
    idx = idx.reshape(-1, k)[:qn]
    return dists, idx


def masked_gather(
    values: jnp.ndarray, idx: jnp.ndarray, fill: float = 0.0
) -> jnp.ndarray:
    """Gather (P, C) rows by (..., K) indices; idx<0 -> fill (reference
    `frnn.frnn_gather` / gather_with_neg_idx semantics,
    DSS/utils/__init__.py:172-215)."""
    safe = jnp.maximum(idx, 0)
    out = values[safe]
    return jnp.where((idx >= 0)[..., None], out, fill)


# ---------------------------------------------------------------------------
# Grid-accelerated kNN (FRNN equivalent).
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("k", "exclude_self", "grid_res", "bucket_size"),
)
def grid_knn_points(
    points: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    k: int = 8,
    exclude_self: bool = False,
    grid_res: int = 16,
    bucket_size: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform-grid kNN (self-query): sort by cell id, gather the 27-cell
    neighborhood (bounded `bucket_size` candidates per cell), top-k.

    Candidates beyond `bucket_size` per cell are dropped (static-shape bound;
    the FRNN reference bounds work per cell the same way via its grid
    resolution cap).  Results are exact when occupancy per cell <= bucket_size
    and the kNN radius <= one cell.
    """
    p = points.shape[0]
    if mask is None:
        mask = jnp.ones((p,), bool)

    big = jnp.float32(1e30)
    pts = jnp.where(mask[:, None], points, big)
    lo = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    extent = jnp.maximum(jnp.max(hi - lo), 1e-6)
    cell = extent / grid_res

    ijk = jnp.clip(((points - lo) / cell).astype(jnp.int32), 0, grid_res - 1)
    cell_id = (ijk[:, 0] * grid_res + ijk[:, 1]) * grid_res + ijk[:, 2]
    cell_id = jnp.where(mask, cell_id, grid_res**3)  # invalid -> sentinel cell

    order = jnp.argsort(cell_id)
    sorted_cid = cell_id[order]

    n_cells = grid_res**3
    # Start offset of each cell in the sorted order.
    starts = jnp.searchsorted(sorted_cid, jnp.arange(n_cells + 1))

    # Dense per-cell candidate table (n_cells, bucket_size): slot (c, j) reads
    # sorted position starts[c]+j — a gather from the sorted order (TPU
    # scatters serialize; same pattern as ops/splat_pallas.bin_splats).
    counts = starts[1:] - starts[:-1]
    slot_src = starts[:-1, None] + jnp.arange(bucket_size)[None, :]
    valid_slot = jnp.arange(bucket_size)[None, :] < counts[:, None]
    safe_src = jnp.clip(slot_src, 0, p - 1)
    table = jnp.where(valid_slot, order[safe_src].astype(jnp.int32), -1)

    # 27-neighborhood candidate gather, chunked over queries.  Distances are
    # accumulated per coordinate — gathering (C, 27·bucket) planes keeps the
    # lane dimension wide; a (P, 27·bucket, 3) gather would pad the trailing
    # 3 to 128 lanes under TPU tiling (measured: 88 GB requested at P=100k).
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"),
        axis=-1,
    ).reshape(27, 3)
    n_cand = 27 * bucket_size
    k_eff = min(k, n_cand)
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]

    def chunk_fn(args):
        q_ijk, q_pts, q_mask, q_idx = args
        nbr_ijk = q_ijk[:, None, :] + offs[None, :, :]  # (C, 27, 3)
        inb = jnp.all((nbr_ijk >= 0) & (nbr_ijk < grid_res), axis=-1)
        nbr_cid = (
            nbr_ijk[..., 0] * grid_res + nbr_ijk[..., 1]
        ) * grid_res + nbr_ijk[..., 2]
        nbr_cid = jnp.where(inb, nbr_cid, 0)
        cand = table[nbr_cid]  # (C, 27, bucket)
        cand = jnp.where(inb[..., None], cand, -1).reshape(-1, n_cand)
        safe = jnp.maximum(cand, 0)
        d = jnp.zeros(cand.shape, points.dtype)
        for coord in (px, py, pz):
            dc = coord[safe] - coord[q_idx][:, None]
            d = d + dc * dc
        d = jnp.where(cand >= 0, d, INF)
        if exclude_self:
            d = jnp.where(cand == q_idx[:, None], INF, d)
        neg_top, sl = jax.lax.top_k(-d, k_eff)
        dists = -neg_top
        idx = jnp.take_along_axis(cand, sl, axis=1)
        idx = jnp.where(jnp.isinf(dists), -1, idx)
        dists = jnp.where(q_mask[:, None], dists, INF)
        idx = jnp.where(q_mask[:, None], idx, -1)
        return dists, idx

    query_chunk = 4096
    if p <= query_chunk:
        dists, idx = chunk_fn((ijk, pts, mask, jnp.arange(p)))
    else:
        pad = (-p) % query_chunk
        nchunks = (p + pad) // query_chunk
        ij_c = jnp.pad(ijk, ((0, pad), (0, 0))).reshape(nchunks, query_chunk, 3)
        pt_c = jnp.pad(pts, ((0, pad), (0, 0))).reshape(nchunks, query_chunk, 3)
        m_c = jnp.pad(mask, (0, pad)).reshape(nchunks, query_chunk)
        # padded queries index point 0 (masked out by m_c)
        i_c = jnp.pad(jnp.arange(p), (0, pad)).reshape(nchunks, query_chunk)
        dists, idx = jax.lax.map(chunk_fn, (ij_c, pt_c, m_c, i_c))
        dists = dists.reshape(-1, k_eff)[:p]
        idx = idx.reshape(-1, k_eff)[:p]
    if k_eff < k:
        dists = jnp.pad(dists, ((0, 0), (0, k - k_eff)), constant_values=INF)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return dists, idx
