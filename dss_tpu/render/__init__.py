from dss_tpu.render.ewa import RasterSettings, SplatInfo, prepare_splats
from dss_tpu.render.rasterizer import Fragments, rasterize_points, clip_grad_norm
from dss_tpu.render.compositor import weighted_sum, norm_weighted_sum
from dss_tpu.render.lighting import DirectionalLights, PointLights, shade_points
from dss_tpu.render.renderer import render_single_view, render_views

__all__ = [
    "RasterSettings",
    "SplatInfo",
    "prepare_splats",
    "Fragments",
    "rasterize_points",
    "clip_grad_norm",
    "weighted_sum",
    "norm_weighted_sum",
    "DirectionalLights",
    "PointLights",
    "shade_points",
    "render_single_view",
    "render_views",
]
from dss_tpu.render.texture import make_lighting_texture, make_neural_texture
from dss_tpu.render.mesh_raster import rasterize_mesh, render_mesh_flat
__all__ += [
    "make_lighting_texture",
    "make_neural_texture",
    "rasterize_mesh",
    "render_mesh_flat",
]
