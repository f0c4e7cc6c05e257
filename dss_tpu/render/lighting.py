"""Multi-light Lambert/Phong shading (functional, per view).

Reference: DSS/core/lighting.py — `diffuse` (10-78), `specular` (81-173),
`DirectionalLights` (176-231), `PointLights` (234-302).  Each light container
holds L lights for ONE view ((L, 3) arrays); batch over views with vmap, which
replaces the reference's gather_props packed broadcasting.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
from flax import struct

from dss_tpu.utils.mathutil import normalize


@struct.dataclass
class DirectionalLights:
    """L directional lights: colors + directions (toward the light), (L, 3)."""

    ambient_color: jnp.ndarray
    diffuse_color: jnp.ndarray
    specular_color: jnp.ndarray
    direction: jnp.ndarray

    @classmethod
    def create(cls, ambient_color=(0.5, 0.5, 0.5), diffuse_color=(0.3, 0.3, 0.3),
               specular_color=(0.2, 0.2, 0.2), direction=(0.0, 1.0, 0.0)):
        as2d = lambda v: jnp.atleast_2d(jnp.asarray(v, jnp.float32))
        return cls(as2d(ambient_color), as2d(diffuse_color), as2d(specular_color),
                   as2d(direction))

    def light_directions(self, points: jnp.ndarray) -> jnp.ndarray:
        """(P, L, 3) unit directions toward each light at each point."""
        d = normalize(self.direction, eps=1e-6)
        return jnp.broadcast_to(d[None], (points.shape[0],) + d.shape)


@struct.dataclass
class PointLights:
    """L point lights: colors + world locations, (L, 3)."""

    ambient_color: jnp.ndarray
    diffuse_color: jnp.ndarray
    specular_color: jnp.ndarray
    location: jnp.ndarray

    @classmethod
    def create(cls, ambient_color=(0.5, 0.5, 0.5), diffuse_color=(0.3, 0.3, 0.3),
               specular_color=(0.2, 0.2, 0.2), location=(0.0, 1.0, 0.0)):
        as2d = lambda v: jnp.atleast_2d(jnp.asarray(v, jnp.float32))
        return cls(as2d(ambient_color), as2d(diffuse_color), as2d(specular_color),
                   as2d(location))

    def light_directions(self, points: jnp.ndarray) -> jnp.ndarray:
        """(P, L, 3): direction from each point toward each light
        (reference PointLights.diffuse, lighting.py:266-276)."""
        return normalize(self.location[None, :, :] - points[:, None, :], eps=1e-6)


Lights = Union[DirectionalLights, PointLights]


def apply_lighting(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    lights: Lights,
    camera_position: jnp.ndarray,
    shininess: float = 64.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point (ambient (3,), diffuse (P, 3), specular (P, 3)) for one view
    (reference texture.py:25-62 + lighting.py diffuse/specular)."""
    n = normalize(normals, eps=1e-6)
    d = lights.light_directions(points)  # (P, L, 3) unit, toward light

    cos = jnp.einsum("pi,pli->pl", n, d)
    angle = jnp.maximum(cos, 0.0)
    diffuse = jnp.einsum("li,pl->pi", lights.diffuse_color, angle)

    # Phong specular (lighting.py:81-173): reflect = -d + 2 cos n; alpha =
    # relu(view_dir . reflect) gated by cos > 0.
    view_dir = normalize(camera_position[None, :] - points, eps=1e-6)  # (P, 3)
    reflect = -d + 2.0 * cos[..., None] * n[:, None, :]
    alpha = jnp.maximum(jnp.einsum("pi,pli->pl", view_dir, reflect), 0.0)
    alpha = alpha * (cos > 0.0)
    specular = jnp.einsum("li,pl->pi", lights.specular_color, alpha**shininess)

    ambient = jnp.sum(jnp.atleast_2d(lights.ambient_color), axis=0)  # (3,)
    return ambient, diffuse, specular


def shade_points(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    rgb: jnp.ndarray,
    lights: Lights,
    camera_position: jnp.ndarray,
    shininess: float = 64.0,
) -> jnp.ndarray:
    """LightingTexture: shaded = rgb·(ambient + diffuse) + specular
    (reference DSS/core/texture.py:74-127)."""
    ambient, diffuse, specular = apply_lighting(
        points, normals, lights, camera_position, shininess
    )
    return rgb * (ambient[None, :] + diffuse) + specular
