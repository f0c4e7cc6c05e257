"""Implicit-surface (SDF) ray rendering: sphere tracing + ray/primitive
intersections.

Reference capability: DSS/utils/__init__.py ray helpers (cube/sphere ray
intersections, 343-486) feeding the implicit-surface eval path
(`Generator.raytrace_images`, bit-rotted in the reference — SURVEY.md §3.2).
This is the working TPU-native version: camera rays, bounding-sphere clip,
fixed-step sphere tracing under lax.fori_loop, normals by SDF gradient.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from dss_tpu.geometry.cameras import FoVPerspectiveCameras
from dss_tpu.render.lighting import Lights, shade_points
from dss_tpu.render.rasterizer import pixel_ndc_coords
from dss_tpu.utils.mathutil import normalize


def camera_rays(
    camera: FoVPerspectiveCameras, image_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel world rays under the splat NDC convention (+X left, +Y up,
    pixel centers (2i+1)/S − 1).  Returns (origins (S,S,3), dirs (S,S,3))."""
    s = image_size
    xf, yf = pixel_ndc_coords(s)
    tanhalf = jnp.tan(jnp.deg2rad(camera.fov[0]) / 2.0)
    # view-space direction for ndc (x, y) at depth 1: ndc_x = x_v/(z·a·tan),
    # invert the FoV projection (cameras.projection_matrix)
    xv = xf[None, :] * tanhalf * camera.aspect_ratio[0]
    yv = yf[:, None] * tanhalf
    d_view = jnp.stack(
        [jnp.broadcast_to(xv, (s, s)), jnp.broadcast_to(yv, (s, s)), jnp.ones((s, s))],
        axis=-1,
    )
    # view→world for directions: d_world = d_view @ R⁻¹ = d_view @ Rᵀ
    r = camera.R[0]
    d_world = normalize(d_view @ r.T)
    origin = camera.camera_position()[0]
    return jnp.broadcast_to(origin, (s, s, 3)), d_world


def ray_sphere_intersect(
    origins: jnp.ndarray, dirs: jnp.ndarray, center: jnp.ndarray, radius: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(t_near, t_far, hit) of rays with a sphere (reference ray-sphere
    helpers, DSS/utils/__init__.py:343-486)."""
    oc = origins - center
    b = jnp.sum(oc * dirs, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius**2
    disc = b * b - c
    hit = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    return -b - sq, -b + sq, hit


def ray_box_intersect(
    origins: jnp.ndarray, dirs: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab test: (t_near, t_far, hit) of rays with an AABB."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    t0 = (lo - origins) * inv
    t1 = (hi - origins) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return tmin, tmax, tmax >= jnp.maximum(tmin, 0.0)


def sphere_trace(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    n_steps: int = 64,
    eps: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration sphere tracing.  sdf_fn maps (N, 3) → (N,).
    Returns (t (..., ), hit (...,) bool)."""
    shape = t_near.shape
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    t = jnp.maximum(t_near.reshape(-1), 0.0)
    t_far_f = t_far.reshape(-1)

    def body(_, carry):
        t, done = carry
        p = o + t[:, None] * d
        f = sdf_fn(p)
        done = done | (jnp.abs(f) < eps) | (t > t_far_f)
        t = jnp.where(done, t, t + f)
        return t, done

    t, hit = jax.lax.fori_loop(
        0, n_steps, body, (t, jnp.zeros(t.shape, bool))
    )
    p = o + t[:, None] * d
    hit = (jnp.abs(sdf_fn(p)) < 10 * eps) & (t <= t_far_f)
    return t.reshape(shape), hit.reshape(shape)


def render_sdf(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    camera: FoVPerspectiveCameras,
    image_size: int,
    lights: Optional[Lights] = None,
    bound_radius: float = 1.5,
    base_color=(0.8, 0.8, 0.8),
    n_steps: int = 64,
) -> jnp.ndarray:
    """Render the SDF zero-set to RGBA via sphere tracing (the working
    replacement for the reference's bit-rotted raytrace_images)."""
    origins, dirs = camera_rays(camera, image_size)
    t0, t1, hit0 = ray_sphere_intersect(
        origins, dirs, jnp.zeros(3), bound_radius
    )
    t, hit = sphere_trace(sdf_fn, origins, dirs, t0, jnp.where(hit0, t1, -1.0), n_steps)
    p = (origins + t[..., None] * dirs).reshape(-1, 3)
    grad = jax.vmap(jax.grad(lambda q: sdf_fn(q[None])[0]))(p)
    normals = normalize(grad)
    rgb_base = jnp.broadcast_to(jnp.asarray(base_color, jnp.float32), p.shape)
    if lights is not None:
        rgb = shade_points(p, normals, rgb_base, lights, camera.camera_position()[0])
    else:
        # simple headlight shading
        view = normalize(camera.camera_position()[0][None, :] - p)
        rgb = rgb_base * jnp.abs(jnp.sum(normals * view, -1, keepdims=True))
    s = image_size
    rgb = rgb.reshape(s, s, 3)
    alpha = hit.astype(jnp.float32)[..., None]
    return jnp.concatenate([jnp.clip(rgb, 0, 1) * alpha, alpha], axis=-1)
