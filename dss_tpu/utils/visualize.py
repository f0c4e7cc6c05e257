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
