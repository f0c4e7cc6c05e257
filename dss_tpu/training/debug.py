"""Per-source gradient debugging.

Reference: the global debug registry (DSS/__init__.py:22-52 DebuggingTensor,
hooks in point_modeling.py:152-161 and losses.py:348-370) collects world-space
gradients per source ('position', 'repel', 'proj', mask grads) and
Trainer.debug (trainer.py:456-579) renders them as quiver plots.

In JAX gradients are explicit — no registry or hooks needed: each loss term's
gradient field is one `jax.grad` call.  `collect_gradient_fields` evaluates
them in a single jit and `dump_debug_quivers` writes the 2D/3D quiver PNGs.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dss_tpu.geometry.cameras import FoVPerspectiveCameras
from dss_tpu.geometry.pointclouds import PointFilters
from dss_tpu.models.point_model import PointModelParams, point_model_forward
from dss_tpu.render.ewa import RasterSettings
from dss_tpu.training.losses import dr_loss, projection_loss, repulsion_loss
from dss_tpu.utils.mathutil import normalize


def collect_gradient_fields(
    params: PointModelParams,
    filters: PointFilters,
    cameras: FoVPerspectiveCameras,
    lights,
    settings: RasterSettings,
    img: jnp.ndarray,
    mask_img: jnp.ndarray,
    cfg=None,
) -> Dict[str, jnp.ndarray]:
    """World-space point-gradient field per loss source:
    {'position': dr-loss grad, 'proj': ..., 'repel': ...} each (P, 3)."""
    from dss_tpu.training.trainer import TrainConfig

    cfg = cfg or TrainConfig(lambda_proj=1.0, lambda_repel=1.0)

    def dr_term(points):
        p = params.replace(points=points)
        out, _ = point_model_forward(
            p, filters, cameras, lights, settings, mask_img=mask_img
        )
        total, _parts = dr_loss(
            img, out["img_pred"], mask_img, out["mask_img_pred"],
            cfg.lambda_rgb, cfg.lambda_silhouette,
        )
        return total

    def proj_term(points):
        return projection_loss(
            points, normalize(params.normals), filters.activation,
            visibility=filters.visibility,
            reliable=filters.visibility & filters.inmask,
            knn_k=cfg.knn_k, filter_scale=cfg.filter_scale,
            sharpness_sigma=cfg.sharpness_sigma,
        )

    def repel_term(points):
        return repulsion_loss(
            points, normalize(params.normals), filters.activation,
            reliable=filters.visibility & filters.inmask,
            knn_k=cfg.knn_k, filter_scale=cfg.filter_scale,
            sharpness_sigma=cfg.sharpness_sigma,
        )

    return {
        "position": jax.grad(dr_term)(params.points),
        "proj": jax.grad(proj_term)(params.points),
        "repel": jax.grad(repel_term)(params.points),
    }


def dump_debug_quivers(
    params: PointModelParams,
    grads: Dict[str, jnp.ndarray],
    cameras: FoVPerspectiveCameras,
    mask_img: Optional[jnp.ndarray],
    out_dir: str,
    it: int,
    image_size: int = 256,
) -> None:
    """Write 2D (NDC, per view 0) and 3D quiver PNGs (reference
    Trainer.debug, trainer.py:456-579)."""
    from dss_tpu.utils.visualize import plot_2d_quiver, plot_3d_quiver

    os.makedirs(out_dir, exist_ok=True)
    cam0 = jax.tree_util.tree_map(lambda x: x[:1], cameras)
    pts_ndc = np.asarray(cam0.transform_points_screen(params.points)[0])

    # project world grads to NDC xy via the camera jacobian direction only
    # (visual diagnostic, matching the reference's NDC quiver)
    grads_ndc = {}
    for name, g in grads.items():
        shifted = np.asarray(
            cam0.transform_points_screen(params.points + 1e-2 * g)[0]
        )
        grads_ndc[name] = (shifted - pts_ndc)[:, :2] * 1e2
    m0 = None if mask_img is None else np.asarray(mask_img[0])
    plot_2d_quiver(
        pts_ndc, grads_ndc, m0,
        os.path.join(out_dir, f"debug_2d_{it:06d}.png"), image_size,
    )
    plot_3d_quiver(
        np.asarray(params.points),
        {k: np.asarray(v) for k, v in grads.items()},
        os.path.join(out_dir, f"debug_3d_{it:06d}.png"),
    )
