"""Artifact generation from a trained point model: meshes, point clouds,
rendered image sets.

Reference: DSS/models/point_modeling.py `Generator` (248-348) —
generate_mesh via pymeshlab screened Poisson (269-279; here: FFT-grid
Poisson reconstruction by default, MLS + marching tetrahedra as the
alternative, see dss_tpu.geometry.meshing), generate_pointclouds with
colormapped features (284-326), generate_images (335-348).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from dss_tpu.data.io import save_ply
from dss_tpu.geometry.cameras import FoVPerspectiveCameras
from dss_tpu.geometry.meshing import (
    generate_mesh_from_points,
    poisson_mesh_from_points,
)
from dss_tpu.geometry.pointclouds import PointFilters
from dss_tpu.models.point_model import PointModelParams, render_model
from dss_tpu.render.ewa import RasterSettings
from dss_tpu.utils.mathutil import normalize


class Generator:
    def __init__(self, settings: RasterSettings, mesh_resolution: int = 96,
                 mesh_method: str = "poisson"):
        self.settings = settings
        self.mesh_resolution = mesh_resolution
        self.mesh_method = mesh_method  # "poisson" (reference default) | "mls"

    def generate_mesh(
        self, params: PointModelParams, filters: Optional[PointFilters] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Point cloud → triangle mesh (reference generate_mesh,
        point_modeling.py:269-279, runs screened Poisson via pymeshlab;
        here: FFT Poisson reconstruction — see geometry.meshing — with the
        MLS+marching-tetrahedra field as the alternative)."""
        mask = None if filters is None else np.asarray(filters.activation)
        if self.mesh_method == "poisson":
            return poisson_mesh_from_points(
                np.asarray(params.points),
                np.asarray(normalize(params.normals)),
                mask=mask,
                resolution=max(self.mesh_resolution, 96),
            )
        return generate_mesh_from_points(
            np.asarray(params.points),
            np.asarray(normalize(params.normals)),
            mask=mask,
            resolution=self.mesh_resolution,
        )

    def generate_pointclouds(
        self,
        params: PointModelParams,
        filters: Optional[PointFilters],
        path: str,
        colormap_by: Optional[str] = None,
    ) -> str:
        """Write the active cloud as ply, optionally colormapping a scalar
        per-point feature (reference generate_pointclouds,
        point_modeling.py:284-326)."""
        active = (
            np.ones(params.points.shape[0], bool)
            if filters is None
            else np.asarray(filters.activation)
        )
        pts = np.asarray(params.points)[active]
        normals = np.asarray(normalize(params.normals))[active]
        colors = np.clip(np.asarray(params.colors), 0, 1)[active]
        if colormap_by == "height":
            h = (pts[:, 1] - pts[:, 1].min()) / max(np.ptp(pts[:, 1]), 1e-9)
            colors = np.stack([h, 0.4 * np.ones_like(h), 1.0 - h], axis=-1)
        save_ply(path, pts, normals=normals, colors=colors)
        return path

    def generate_images(
        self,
        params: PointModelParams,
        filters: PointFilters,
        cameras: FoVPerspectiveCameras,
        lights,
        out_dir: str,
        prefix: str = "render",
    ) -> list:
        """Render all views to pngs (reference generate_images,
        point_modeling.py:335-348)."""
        import imageio.v2 as imageio

        os.makedirs(out_dir, exist_ok=True)
        rgba = np.asarray(
            jax.jit(
                lambda p: render_model(p, filters, cameras, lights, self.settings)
            )(params)
        )
        paths = []
        for i in range(rgba.shape[0]):
            rgb = np.clip(rgba[i, ..., :3], 0, 1)
            a = rgba[i, ..., 3:4]
            img = (255 * (rgb * a + (1 - a))).astype(np.uint8)
            path = os.path.join(out_dir, f"{prefix}_{i:03d}.png")
            imageio.imwrite(path, img)
            paths.append(path)
        return paths

    def generate_mesh_ply(self, params, filters, path: str) -> str:
        verts, faces = self.generate_mesh(params, filters)
        save_ply(path, verts, faces=faces)
        return path
