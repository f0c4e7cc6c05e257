"""Debug visualization: gradient quivers, point-cloud scatters, render grids.

Reference: DSS/misc/visualize.py — plot_2D_quiver (432-589, NDC-projected
points + negative-gradient arrows over the GT mask, grouped by gradient
source), plot_3D_quiver (234-430), animate_points (23-232).  The reference
uses plotly HTML; this environment ships matplotlib, so figures are saved as
PNGs (same information: per-source gradient fields over the image).  All
functions are host-side — call them on fetched numpy arrays.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def ndc_to_pixel_np(xy: np.ndarray, image_size: int) -> np.ndarray:
    """NDC xy → pixel (col, row) under the flipped +X-left/+Y-up convention."""
    s = image_size
    col = (s * (1.0 - xy[..., 0]) - 1.0) * 0.5
    row = (s * (1.0 - xy[..., 1]) - 1.0) * 0.5
    return np.stack([col, row], axis=-1)


def plot_2d_quiver(
    pts_ndc: np.ndarray,
    grads_ndc: Dict[str, np.ndarray],
    mask_img: Optional[np.ndarray],
    path: str,
    image_size: int = 256,
    n_arrows: int = 400,
) -> str:
    """Negative-gradient arrows at projected point locations over the GT mask
    (reference plot_2D_quiver, visualize.py:432-589)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(7, 7))
    if mask_img is not None:
        ax.imshow(np.asarray(mask_img), cmap="gray", alpha=0.6)
    pix = ndc_to_pixel_np(np.asarray(pts_ndc)[:, :2], image_size)
    step = max(1, len(pix) // n_arrows)
    colors = ["tab:red", "tab:blue", "tab:green", "tab:orange", "tab:purple"]
    for i, (name, g) in enumerate(grads_ndc.items()):
        gp = ndc_to_pixel_np(-np.asarray(g)[:, :2] + np.asarray(pts_ndc)[:, :2], image_size) - pix
        ax.quiver(
            pix[::step, 0], pix[::step, 1], gp[::step, 0], gp[::step, 1],
            angles="xy", scale_units="xy", scale=1.0,
            color=colors[i % len(colors)], width=0.002, label=name,
        )
    ax.scatter(pix[::step, 0], pix[::step, 1], s=1, c="k")
    ax.set_xlim(0, image_size)
    ax.set_ylim(image_size, 0)
    ax.legend()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_3d_quiver(
    pts_world: np.ndarray,
    grads_world: Dict[str, np.ndarray],
    path: str,
    n_arrows: int = 300,
) -> str:
    """World-space gradient cones (reference plot_3D_quiver,
    visualize.py:234-430) as a matplotlib 3D quiver."""
    plt = _mpl()
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    p = np.asarray(pts_world)
    step = max(1, len(p) // n_arrows)
    colors = ["tab:red", "tab:blue", "tab:green", "tab:orange"]
    ax.scatter(p[::step, 0], p[::step, 1], p[::step, 2], s=1, c="k")
    for i, (name, g) in enumerate(grads_world.items()):
        g = -np.asarray(g)
        scale = 0.2 / max(np.abs(g).max(), 1e-12)
        ax.quiver(
            p[::step, 0], p[::step, 1], p[::step, 2],
            g[::step, 0] * scale, g[::step, 1] * scale, g[::step, 2] * scale,
            color=colors[i % len(colors)], label=name, linewidth=0.5,
        )
    ax.legend()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def save_image_grid(images: np.ndarray, path: str, ncols: int = 4) -> str:
    """Rendered view batch (V, H, W, C) → one PNG grid (reference visualize
    logging, trainer.py:378-440)."""
    plt = _mpl()
    images = np.asarray(images)
    v = images.shape[0]
    ncols = min(ncols, v)
    nrows = (v + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 3 * nrows), squeeze=False)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        ax.axis("off")
        if i < v:
            im = np.clip(images[i], 0.0, 1.0)
            if im.shape[-1] == 1:
                ax.imshow(im[..., 0], cmap="gray")
            else:
                ax.imshow(im[..., :3])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_iso_surface(
    sdf_fn, path: str, bound: float = 1.2, resolution: int = 48, level: float = 0.0
) -> str:
    """Mesh the SDF level set (marching tetrahedra) and render a 3D preview
    (reference plot_iso_surface, visualize.py:617)."""
    import jax.numpy as jnp

    from dss_tpu.geometry.meshing import marching_tetrahedra

    lin = np.linspace(-bound, bound, resolution)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    sdf = np.asarray(sdf_fn(jnp.asarray(grid))).reshape(resolution, resolution, resolution)
    verts, faces = marching_tetrahedra(sdf, np.full(3, -bound), np.full(3, bound), level)

    plt = _mpl()
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    if len(faces):
        tri = verts[faces]
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        coll = Poly3DCollection(tri[:: max(1, len(tri) // 4000)], alpha=0.6)
        coll.set_edgecolor("none")
        ax.add_collection3d(coll)
        ax.set_xlim(-bound, bound); ax.set_ylim(-bound, bound); ax.set_zlim(-bound, bound)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_cuts(sdf_fn, path: str, bound: float = 1.2, resolution: int = 96) -> str:
    """Axis-aligned SDF cross-sections with the zero level set highlighted
    (reference plot_cuts, visualize.py:668)."""
    import jax.numpy as jnp

    plt = _mpl()
    lin = np.linspace(-bound, bound, resolution)
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    for axis, ax in enumerate(axes):
        a, b = np.meshgrid(lin, lin, indexing="ij")
        pts = np.zeros((resolution * resolution, 3), np.float32)
        other = [i for i in range(3) if i != axis]
        pts[:, other[0]] = a.reshape(-1)
        pts[:, other[1]] = b.reshape(-1)
        f = np.asarray(sdf_fn(jnp.asarray(pts))).reshape(resolution, resolution)
        im = ax.contourf(lin, lin, f.T, levels=20, cmap="RdBu")
        ax.contour(lin, lin, f.T, levels=[0.0], colors="k", linewidths=2)
        ax.set_title(f"cut {'xyz'[axis]} = 0")
        fig.colorbar(im, ax=ax)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path
