from dss_tpu.models.point_model import (
    PointModelParams,
    point_model_forward,
    prune_dead_points,
    render_model,
)
from dss_tpu.models.generator import Generator
