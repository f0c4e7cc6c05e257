"""Surface reconstruction: point cloud → triangle mesh.

Reference capability: Generator.generate_mesh (DSS/models/point_modeling.py:
269-279) runs screened Poisson reconstruction through pymeshlab (host-side,
out of jit).  pymeshlab does not exist in this environment, so meshing is
done natively: an MLS signed-distance field from the oriented point cloud
(the same local-plane field the projection loss uses, losses.py:372-389),
sampled on a regular grid with jit/vmap, then contoured with marching
tetrahedra (6-tet cube split — small exact case table, unlike marching
cubes' 256-entry table).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dss_tpu.geometry.knn import knn_points, masked_gather
from dss_tpu.utils.mathutil import eps_denom, normalize


def mls_signed_distance(
    queries: jnp.ndarray,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    k: int = 8,
    bandwidth_scale: float = 2.0,
) -> jnp.ndarray:
    """Signed distance of (Q, 3) queries to the MLS surface of an oriented
    cloud: f(q) = Σ w nᵢ·(q − xᵢ) / Σ w with Gaussian weights over the kNN."""
    d2, idx = knn_points(queries, points, None, mask, k=k)
    valid = (idx >= 0).astype(queries.dtype)
    d2 = jnp.where(valid > 0, d2, 0.0)
    nn = masked_gather(points, idx)
    nnn = masked_gather(normalize(normals), idx)
    # bandwidth from the local spacing (distance to nearest neighbor)
    h2 = eps_denom(d2[:, :1]) * bandwidth_scale
    w = jnp.exp(-d2 / h2) * valid
    fx = jnp.sum((queries[:, None, :] - nn) * nnn, axis=-1)
    f = jnp.sum(w * fx, axis=-1) / eps_denom(jnp.sum(w, axis=-1))
    # clamp far-field to the plain nearest distance so empty space stays empty
    near = jnp.sqrt(jnp.maximum(d2[:, 0], 0.0))
    return jnp.where(near > 3.0 * jnp.sqrt(h2[:, 0]), near, f)


@partial(jax.jit, static_argnames=("resolution", "k", "chunk"))
def sample_sdf_grid(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    resolution: int = 64,
    k: int = 8,
    chunk: int = 16384,
) -> jnp.ndarray:
    """(R, R, R) SDF samples of the MLS field over the [lo, hi] box."""
    r = resolution
    axes = [jnp.linspace(lo[i], hi[i], r) for i in range(3)]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    n = grid.shape[0]
    pad = (-n) % chunk
    gp = jnp.pad(grid, ((0, pad), (0, 0)))
    blocks = gp.reshape(-1, chunk, 3)
    f = jax.lax.map(
        lambda q: mls_signed_distance(q, points, normals, mask, k=k), blocks
    )
    return f.reshape(-1)[:n].reshape(r, r, r)


# 6-tetrahedra decomposition of the unit cube (corner ids 0..7, bit i = axis).
_CUBE_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]]
)
_TETS = np.array(
    [[0, 5, 1, 3], [0, 5, 3, 7], [0, 7, 3, 2],
     [0, 7, 2, 6], [0, 6, 2, 4], [6, 0, 4, 5]]
)
# Wait — keep a standard consistent 6-tet split around the 0-7 diagonal:
_TETS = np.array(
    [[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
     [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]]
)


def marching_tetrahedra(
    sdf: np.ndarray, lo: np.ndarray, hi: np.ndarray, level: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Contour an (R, R, R) scalar grid at `level` via marching tetrahedra.

    Host-side numpy (meshing is an offline artifact step, like the
    reference's pymeshlab call).  Returns (verts (V, 3), faces (F, 3)).
    """
    sdf = np.asarray(sdf)
    r = sdf.shape[0]
    spacing = (np.asarray(hi) - np.asarray(lo)) / (r - 1)

    # corner values/positions for every cube: (Ncube, 8)
    base = np.stack(
        np.meshgrid(np.arange(r - 1), np.arange(r - 1), np.arange(r - 1),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    corner_idx = base[:, None, :] + _CUBE_CORNERS[None, :, :]  # (N, 8, 3)
    vals = sdf[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]
    pos = corner_idx * spacing + np.asarray(lo)

    tris = []
    for tet in _TETS:
        v = vals[:, tet]  # (N, 4)
        p = pos[:, tet]  # (N, 4, 3)
        inside = v < level  # (N, 4)
        code = (
            inside[:, 0].astype(np.int32)
            | (inside[:, 1] << 1)
            | (inside[:, 2] << 2)
            | (inside[:, 3] << 3)
        )

        def interp(sel, a, b):
            va, vb = v[sel, a], v[sel, b]
            t = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
            t = np.clip(t, 0.0, 1.0)[:, None]
            return p[sel, a] * (1 - t) + p[sel, b] * t

        # one-corner-inside cases (and complements) → 1 triangle; two-inside
        # cases → 2 triangles.  Edge orderings chosen for consistent winding
        # (outward = toward positive sdf).
        single = {
            1: (0, (1, 2, 3)), 2: (1, (0, 3, 2)), 4: (2, (0, 1, 3)),
            8: (3, (0, 2, 1)),
            14: (0, (1, 3, 2)), 13: (1, (0, 2, 3)), 11: (2, (0, 3, 1)),
            7: (3, (0, 1, 2)),
        }
        for c, (apex, others) in single.items():
            sel = np.nonzero(code == c)[0]
            if len(sel) == 0:
                continue
            e0 = interp(sel, apex, others[0])
            e1 = interp(sel, apex, others[1])
            e2 = interp(sel, apex, others[2])
            tris.append(np.stack([e0, e1, e2], axis=1))

        double = {
            3: ((0, 1), (2, 3)), 5: ((0, 2), (3, 1)), 9: ((0, 3), (1, 2)),
            6: ((1, 2), (0, 3)), 10: ((1, 3), (2, 0)), 12: ((2, 3), (0, 1)),
        }
        for c, ((a, b), (x, y)) in double.items():
            sel = np.nonzero(code == c)[0]
            if len(sel) == 0:
                continue
            ax = interp(sel, a, x)
            ay = interp(sel, a, y)
            bx = interp(sel, b, x)
            by = interp(sel, b, y)
            tris.append(np.stack([ax, ay, bx], axis=1))
            tris.append(np.stack([bx, ay, by], axis=1))

    if not tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tri_pts = np.concatenate(tris, axis=0)  # (F, 3, 3)

    # weld duplicate vertices
    flat = tri_pts.reshape(-1, 3)
    key = np.round(flat / (spacing.min() * 1e-4)).astype(np.int64)
    _, uniq_idx, inv = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    verts = flat[uniq_idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[good]


def generate_mesh_from_points(
    points: np.ndarray,
    normals: np.ndarray,
    mask: Optional[np.ndarray] = None,
    resolution: int = 64,
    k: int = 8,
    padding: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Point cloud + normals → watertight-ish triangle mesh via MLS SDF +
    marching tetrahedra (Generator.generate_mesh equivalent)."""
    import jax.numpy as jnp

    pts = np.asarray(points, np.float32)
    valid = pts if mask is None else pts[np.asarray(mask)]
    lo = valid.min(0) - padding
    hi = valid.max(0) + padding
    sdf = np.asarray(
        sample_sdf_grid(
            jnp.asarray(pts),
            jnp.asarray(normals, dtype=jnp.float32),
            None if mask is None else jnp.asarray(mask),
            jnp.asarray(lo),
            jnp.asarray(hi),
            resolution=resolution,
            k=k,
        )
    )
    return marching_tetrahedra(sdf, lo, hi, 0.0)


def poisson_indicator_grid(
    points: np.ndarray,
    normals: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    resolution: int = 128,
    smooth_cells: float = 1.5,
) -> np.ndarray:
    """Poisson surface reconstruction on a regular grid (Kazhdan's original
    formulation: the indicator's gradient equals the smoothed oriented-normal
    field, so solve ∇²χ = ∇·V spectrally with an FFT — the regular-grid
    variant of the screened-Poisson step the reference runs through pymeshlab,
    Generator.generate_mesh, point_modeling.py:269-279).

    Returns an (R, R, R) field, higher inside the surface.
    """
    r = resolution
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    spacing = (hi - lo) / (r - 1)

    # Trilinear splat of unit normals into the vector grid V.
    p = (np.asarray(points, np.float64) - lo) / spacing  # grid coords
    n = np.asarray(normals, np.float64)
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    i0 = np.clip(np.floor(p).astype(np.int64), 0, r - 2)
    f = np.clip(p - i0, 0.0, 1.0)
    v = np.zeros((r, r, r, 3), np.float64)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                np.add.at(
                    v,
                    (i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz),
                    w[:, None] * n,
                )

    # Spectral solve: χ̂ = i k·V̂ / |k|² with Gaussian pre-smoothing (the
    # splatted field is a sum of deltas; smoothing plays the role of the
    # Poisson octree's B-spline basis).
    k = [np.fft.fftfreq(r, d=spacing[a]) * 2.0 * np.pi for a in range(3)]
    kx, ky, kz = np.meshgrid(*k, indexing="ij")
    k2 = kx * kx + ky * ky + kz * kz
    sig = smooth_cells * spacing.mean()
    gauss = np.exp(-0.5 * sig * sig * k2)
    vh = [np.fft.fftn(v[..., a]) * gauss for a in range(3)]
    div_h = 1j * (kx * vh[0] + ky * vh[1] + kz * vh[2])
    with np.errstate(divide="ignore", invalid="ignore"):
        chi_h = np.where(k2 > 0, div_h / (-k2), 0.0)
    chi = np.real(np.fft.ifftn(chi_h))

    # Outward normals ⇒ ∇χ ≈ −V inside-positive; fix the sign so the field is
    # higher inside (sample at the splat points vs the global mean).
    at_pts = chi[
        np.clip(np.round(p[:, 0]).astype(int), 0, r - 1),
        np.clip(np.round(p[:, 1]).astype(int), 0, r - 1),
        np.clip(np.round(p[:, 2]).astype(int), 0, r - 1),
    ]
    # points sit ON the surface: inside values are more extreme than the mean
    interior_sign = -1.0 if at_pts.mean() < chi.mean() else 1.0
    return interior_sign * chi


def poisson_mesh_from_points(
    points: np.ndarray,
    normals: np.ndarray,
    mask: Optional[np.ndarray] = None,
    resolution: int = 128,
    padding: float = 0.15,
    smooth_cells: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Point cloud + outward normals → mesh via FFT Poisson reconstruction +
    marching tetrahedra.  The iso level is the median indicator value at the
    input points (they lie on the surface by definition)."""
    pts = np.asarray(points, np.float32)
    nrm = np.asarray(normals, np.float32)
    if mask is not None:
        keep = np.asarray(mask)
        pts, nrm = pts[keep], nrm[keep]
    lo = pts.min(0) - padding * (pts.max(0) - pts.min(0)).max()
    hi = pts.max(0) + padding * (pts.max(0) - pts.min(0)).max()
    # cubic voxels: expand the box to a cube (FFT wavenumbers stay isotropic)
    size = (hi - lo).max()
    center = (hi + lo) / 2
    lo, hi = center - size / 2, center + size / 2

    chi = poisson_indicator_grid(
        pts, nrm, lo, hi, resolution=resolution, smooth_cells=smooth_cells
    )
    r = resolution
    spacing = (hi - lo) / (r - 1)
    p = (pts - lo) / spacing
    at_pts = chi[
        np.clip(np.round(p[:, 0]).astype(int), 0, r - 1),
        np.clip(np.round(p[:, 1]).astype(int), 0, r - 1),
        np.clip(np.round(p[:, 2]).astype(int), 0, r - 1),
    ]
    iso = float(np.median(at_pts))
    # marching_tetrahedra treats "< level" as inside; chi is inside-positive
    return marching_tetrahedra(-chi, lo, hi, level=-iso)
