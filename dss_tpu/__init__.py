"""dss_tpu — TPU-native differentiable surface splatting.

A brand-new JAX/XLA/Pallas framework with the capabilities of yifita/DSS
(Differentiable Surface Splatting, Yifan et al. 2019): point clouds rendered as
screen-space EWA elliptical Gaussian splats with hand-defined gradients from
silhouette/occupancy, depth and shaded color back to point positions, normals
and colors, driving inverse-rendering workloads (multi-view shape deformation,
point-cloud denoising, image-filter-driven geometry editing).

Everything in the compute path is functional JAX: jit/vmap for per-point math,
tile-binned Pallas TPU kernels for the hot rasterization forward/backward, and
pjit/shard_map over a device mesh for scale-out.
"""

__version__ = "0.1.0"

from dss_tpu.geometry.pointclouds import PointClouds, PointFilters
from dss_tpu.geometry.cameras import FoVPerspectiveCameras, look_at_view_transform

__all__ = [
    "PointClouds",
    "PointFilters",
    "FoVPerspectiveCameras",
    "look_at_view_transform",
]
