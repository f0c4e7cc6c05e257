"""Point texture functions: fixed lighting shading or neural texture.

Reference: DSS/core/texture.py — `LightingTexture` (74-127, the default
shading path implemented by dss_tpu.render.lighting.shade_points) and
`NeuralTexture` (130-162): a decoder MLP over (normals, points [, encoded
view dirs]) producing per-point rgb features.

A texture is a callable (points, normals, camera) → (P, 3) colors, passed to
the renderer as `texture_fn` — each vmapped view evaluates it with its own
camera (replacing the reference's gather_props packed broadcasting).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp

from dss_tpu.models.decoders import neural_texture_features
from dss_tpu.render.lighting import Lights, shade_points

TextureFn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]


def make_lighting_texture(
    lights: Lights, albedo: Optional[jnp.ndarray] = None, shininess: float = 64.0
) -> TextureFn:
    """LightingTexture with fixed lights: rgb·(ambient+diffuse)+specular."""

    def fn(points, normals, camera):
        rgb = albedo if albedo is not None else jnp.ones_like(points)
        return shade_points(
            points, normals, rgb, lights, camera.camera_position()[0], shininess
        )

    return fn


def make_neural_texture(
    decoder_apply: Callable[..., dict],
    decoder_params,
    view_dependent: bool = True,
    view_freqs: int = 4,
) -> TextureFn:
    """NeuralTexture: colors = decoder(normals ‖ points [‖ PE(view_dir)]).rgb
    (reference texture.py:130-162)."""

    def fn(points, normals, camera):
        cam_pos = camera.camera_position()[0] if view_dependent else None
        x = neural_texture_features(points, normals, cam_pos, view_freqs)
        out = decoder_apply(decoder_params, x)
        return out["rgb"]

    return fn
