from dss_tpu.training.trainer import (
    AnnealSchedule,
    TrainConfig,
    TrainState,
    chamfer_distance,
    create_train_state,
    make_optimizer,
    make_train_step,
    psnr,
)
from dss_tpu.training.checkpoint import CheckpointIO
