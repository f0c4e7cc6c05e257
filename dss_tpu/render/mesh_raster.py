"""Minimal flat-shaded mesh rasterizer (pure JAX) for GT data generation.

Replaces the pytorch3d MeshRasterizer + HardFlatShader used by the reference's
data-generation CLI (scripts/create_mvr_data_from_mesh.py:148-161, 207-209).
Z-buffer rasterization with barycentric inside tests, per-face flat shading
with the same multi-light model as dss_tpu.render.lighting, same NDC/pixel
conventions as the splat rasterizer.  Offline tool — simplicity over speed
(row-chunked pixel×face sweep, fine for ≤50k faces at ≤512²).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dss_tpu.geometry.cameras import FoVPerspectiveCameras
from dss_tpu.render.lighting import Lights, apply_lighting
from dss_tpu.render.rasterizer import pixel_ndc_coords
from dss_tpu.utils.mathutil import eps_denom, normalize


def rasterize_mesh(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    camera: FoVPerspectiveCameras,
    image_size: int,
    row_chunk: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Z-buffer rasterize one view.

    Returns (face_idx (S, S) int32 (−1 empty), zbuf (S, S), bary (S, S, 3)).
    """
    s = image_size
    pts_screen = camera.transform_points_screen(verts)[0]  # (V, 3) ndc x, y, view z
    tri = pts_screen[faces]  # (F, 3, 3)
    ax, ay, az = tri[:, 0, 0], tri[:, 0, 1], tri[:, 0, 2]
    bx, by, bz = tri[:, 1, 0], tri[:, 1, 1], tri[:, 1, 2]
    cx, cy, cz = tri[:, 2, 0], tri[:, 2, 1], tri[:, 2, 2]
    # signed area (for barycentric denominators)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    denom = eps_denom(area)
    front_ok = (az > 0) & (bz > 0) & (cz > 0)

    xf, yf = pixel_ndc_coords(s)
    if s % row_chunk != 0:
        row_chunk = 1
    n_blocks = s // row_chunk
    y_blocks = yf.reshape(n_blocks, row_chunk)

    def row_block(yb):  # (R,)
        px = xf[None, :, None]  # (1, S, 1)
        py = yb[:, None, None]  # (R, 1, 1)
        w0 = ((bx - px) * (cy - py) - (by - py) * (cx - px)) / denom
        w1 = ((cx - px) * (ay - py) - (cy - py) * (ax - px)) / denom
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & front_ok
        z = w0 * az + w1 * bz + w2 * cz  # (R, S, F)
        z = jnp.where(inside, z, jnp.inf)
        fid = jnp.argmin(z, axis=-1)  # (R, S)
        zmin = jnp.take_along_axis(z, fid[..., None], axis=-1)[..., 0]
        hit = jnp.isfinite(zmin)
        bary = jnp.stack(
            [
                jnp.take_along_axis(w0, fid[..., None], -1)[..., 0],
                jnp.take_along_axis(w1, fid[..., None], -1)[..., 0],
                jnp.take_along_axis(w2, fid[..., None], -1)[..., 0],
            ],
            axis=-1,
        )
        return (
            jnp.where(hit, fid, -1).astype(jnp.int32),
            jnp.where(hit, zmin, -1.0),
            jnp.where(hit[..., None], bary, 0.0),
        )

    fid, zbuf, bary = jax.lax.map(row_block, y_blocks)
    return fid.reshape(s, s), zbuf.reshape(s, s), bary.reshape(s, s, 3)


def render_mesh_flat(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    camera: FoVPerspectiveCameras,
    lights: Optional[Lights],
    image_size: int,
    base_color: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    shininess: float = 64.0,
    return_zbuf: bool = False,
) -> jnp.ndarray:
    """Flat-shaded RGBA render (HardFlatShader equivalent): one color per
    face from its centroid/normal under the multi-light model.

    return_zbuf=True additionally returns the view-space depth (S, S), -1
    where empty — used by the data-gen CLI's dense-depth product (reference
    create_mvr_data_from_mesh.py:216-240 reads fragments.zbuf)."""
    fid, zbuf, _ = rasterize_mesh(verts, faces, camera, image_size)
    tri = verts[faces]
    centroids = jnp.mean(tri, axis=1)
    fnormals = normalize(
        jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    )
    # flip normals toward the camera
    campos = camera.camera_position()[0]
    to_cam = normalize(campos[None, :] - centroids)
    sgn = jnp.where(jnp.sum(fnormals * to_cam, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    fnormals = fnormals * sgn

    base = jnp.broadcast_to(jnp.asarray(base_color, jnp.float32), centroids.shape)
    if lights is not None:
        ambient, diffuse, specular = apply_lighting(
            centroids, fnormals, lights, campos, shininess
        )
        face_rgb = base * (ambient[None, :] + diffuse) + specular
    else:
        face_rgb = base

    hit = fid >= 0
    rgb = jnp.where(hit[..., None], face_rgb[jnp.maximum(fid, 0)], 1.0)
    rgba = jnp.concatenate(
        [jnp.clip(rgb, 0.0, 1.0), hit[..., None].astype(jnp.float32)], axis=-1
    )
    if return_zbuf:
        return rgba, zbuf
    return rgba
