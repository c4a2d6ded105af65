from feature3dgs_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    rasterize_tile_sharded,
    sharded_train_step,
    stack_cameras,
)
from feature3dgs_tpu.parallel.trainer import DistributedTrainer  # noqa: F401
