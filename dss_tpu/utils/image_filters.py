"""Image-space filters for the "geometry processing via image filters"
application: L0 gradient smoothing, (fast) guided filter, box filter, SLIC
superpixel quantization.

Reference: DSS/misc/imageFilters.py — box (13-36), gf color guided filter
(39-107), SuperPixel/SLIC (110-131), L0Smooth FFT solver (134-181).  These
drive the learn_image_filter workflow: optimize point positions so rendered
images match filtered renders.

TPU-first: box/guided/L0 are pure jnp (fft2/cumsum — jit and grad-able, so
the *filtered target* can even be produced inside the training jit).  SLIC is
a native numpy implementation (host-side, data-dependent clustering; skimage
is unavailable in this environment).  The guided filter solves the 3×3
per-pixel systems batched with jnp.linalg.solve instead of the reference's
Python double loop (gf:87-97).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def box_filter(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """O(1) sliding box sum of radius r over the first two axes (reference
    box, imageFilters.py:13-36)."""

    def one_axis(x, axis):
        n = x.shape[axis]
        cum = jnp.cumsum(x, axis=axis)
        take = lambda a, b: jax.lax.slice_in_dim(cum, a, b, axis=axis)
        head = take(r, 2 * r + 1)
        mid = take(2 * r + 1, n) - take(0, n - 2 * r - 1)
        last = take(n - 1, n)
        reps = [1] * x.ndim
        reps[axis] = r
        tail = jnp.tile(last, reps) - take(n - 2 * r - 1, n - r - 1)
        return jnp.concatenate([head, mid, tail], axis=axis)

    return one_axis(one_axis(img, 0), 1)


def guided_filter(
    guide: jnp.ndarray, src: jnp.ndarray, r: int, eps: float
) -> jnp.ndarray:
    """Color guided filter (He et al.): guide (H, W, 3), src (H, W) →
    (H, W) (reference gf, imageFilters.py:39-107)."""
    h, w = src.shape[:2]
    n = box_filter(jnp.ones((h, w), src.dtype), r)

    mean_i = box_filter(guide, r) / n[..., None]  # (H, W, 3)
    mean_p = box_filter(src, r) / n
    mean_ip = box_filter(guide * src[..., None], r) / n[..., None]
    cov_ip = mean_ip - mean_i * mean_p[..., None]  # (H, W, 3)

    # (H, W, 3, 3) covariance of the guide per window
    ii = box_filter(guide[..., :, None] * guide[..., None, :], r) / n[..., None, None]
    var_i = ii - mean_i[..., :, None] * mean_i[..., None, :]

    a = jnp.linalg.solve(
        var_i + eps * jnp.eye(3, dtype=src.dtype), cov_ip[..., None]
    )[..., 0]
    b = mean_p - jnp.sum(a * mean_i, axis=-1)
    mean_a = box_filter(a, r) / n[..., None]
    mean_b = box_filter(b, r) / n
    return jnp.sum(mean_a * guide, axis=-1) + mean_b


@partial(jax.jit, static_argnames=("num_iter",))
def l0_smooth(img: jnp.ndarray, lmd: float = 0.05, num_iter: int = 40) -> jnp.ndarray:
    """L0 gradient minimization (Xu et al. 2011) via the half-quadratic FFT
    solver (reference L0Smooth, imageFilters.py:134-181).  img (H, W, C)."""
    h, w = img.shape[:2]
    img3 = img if img.ndim == 3 else img[..., None]
    c = img3.shape[-1]

    fi = jnp.fft.fft2(img3, axes=(0, 1))
    dx = jnp.zeros((h, w)).at[h // 2, w // 2 - 1].set(-1.0).at[h // 2, w // 2].set(1.0)
    dy = jnp.zeros((h, w)).at[h // 2 - 1, w // 2].set(-1.0).at[h // 2, w // 2].set(1.0)
    fdx = jnp.fft.fft2(dx)
    fdy = jnp.fft.fft2(dy)
    denom2 = (jnp.conj(fdx) * fdx + jnp.conj(fdy) * fdy).real[..., None]

    beta0, beta_rate, beta_max = 0.1, 2.0, 1e5

    def step(i, s):
        beta = beta0 * beta_rate**i
        active = beta <= beta_max
        hp = jnp.roll(s, -1, axis=1) - s
        vp = jnp.roll(s, -1, axis=0) - s
        zero = jnp.sum(hp**2 + vp**2, axis=-1, keepdims=True) < lmd / beta
        hp = jnp.where(zero, 0.0, hp)
        vp = jnp.where(zero, 0.0, vp)
        hv = jnp.roll(hp, 1, axis=1) - hp + jnp.roll(vp, 1, axis=0) - vp
        new_s = jnp.real(
            jnp.fft.ifft2(
                (fi + beta * jnp.fft.fft2(hv, axes=(0, 1))) / (1.0 + beta * denom2),
                axes=(0, 1),
            )
        )
        return jnp.where(active, new_s, s)

    s = jax.lax.fori_loop(0, num_iter, step, img3)
    return s if img.ndim == 3 else s[..., 0]


def slic_segments(
    img: np.ndarray,
    n_segments: int = 150,
    compactness: float = 20.0,
    n_iter: int = 5,
) -> np.ndarray:
    """Native SLIC superpixels (Achanta et al. 2012): local k-means in
    (color, xy) space with distance D = d_color + (m/S)·d_xy.  numpy
    implementation (skimage is not available in this environment; the
    reference calls skimage.segmentation.slic, imageFilters.py:110-131).
    Returns (H, W) int labels."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    s = max(int(np.sqrt(h * w / n_segments)), 1)
    ys = np.arange(s // 2, h, s)
    xs = np.arange(s // 2, w, s)
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    cy = cy.reshape(-1).astype(np.float32)
    cx = cx.reshape(-1).astype(np.float32)
    k = len(cy)
    ccol = img[cy.astype(int), cx.astype(int)]  # (K, C)

    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    labels = np.zeros((h, w), np.int32)
    inv_s2 = (compactness / s) ** 2

    for _ in range(n_iter):
        best = np.full((h, w), np.inf, np.float32)
        for ki in range(k):
            y0 = max(int(cy[ki]) - 2 * s, 0)
            y1 = min(int(cy[ki]) + 2 * s, h)
            x0 = max(int(cx[ki]) - 2 * s, 0)
            x1 = min(int(cx[ki]) + 2 * s, w)
            patch = img[y0:y1, x0:x1]
            d_col = np.sum((patch - ccol[ki]) ** 2, axis=-1)
            d_xy = (yy[y0:y1, x0:x1] - cy[ki]) ** 2 + (xx[y0:y1, x0:x1] - cx[ki]) ** 2
            d = d_col + inv_s2 * d_xy
            better = d < best[y0:y1, x0:x1]
            best[y0:y1, x0:x1] = np.where(better, d, best[y0:y1, x0:x1])
            labels[y0:y1, x0:x1] = np.where(better, ki, labels[y0:y1, x0:x1])
        # update centers
        for ki in range(k):
            m = labels == ki
            if m.any():
                cy[ki] = yy[m].mean()
                cx[ki] = xx[m].mean()
                ccol[ki] = img[m].mean(axis=0)
    return labels


def superpixel(img: np.ndarray, compactness: float = 20.0, n_segments: int = 150) -> np.ndarray:
    """SLIC superpixel quantization → per-segment mean color (reference
    SuperPixel, imageFilters.py:110-131; label2rgb kind='avg')."""
    img = np.asarray(img, np.float32)
    labels = slic_segments(img, n_segments=n_segments, compactness=compactness)
    out = np.zeros_like(img)
    for ki in np.unique(labels):
        m = labels == ki
        out[m] = img[m].mean(axis=0)
    return out.astype(np.float32)
