from dsen2_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_params,
)
from dsen2_tpu.parallel.train_step import make_eval_step, make_train_step

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_params",
    "make_eval_step",
    "make_train_step",
]
