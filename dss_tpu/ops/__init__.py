from dss_tpu.ops.splat_pallas import (
    bin_splats,
    occ_backward_pallas,
    rasterize_forward_pallas,
    rasterize_points_pallas,
)
