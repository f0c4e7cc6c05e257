from dss_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_views,
)
