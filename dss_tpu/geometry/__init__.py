from dss_tpu.geometry.cameras import (
    FoVPerspectiveCameras,
    cameras_from_matrix,
    look_at_view_transform,
    sample_random_cameras,
)
from dss_tpu.geometry.knn import grid_knn_points, knn_points, masked_gather
from dss_tpu.geometry.normals import (
    estimate_local_coord_frames,
    estimate_normals,
    refine_normals,
)
from dss_tpu.geometry.pointclouds import PointClouds, PointFilters
from dss_tpu.geometry.shapes import ico_sphere, sample_points_from_mesh
