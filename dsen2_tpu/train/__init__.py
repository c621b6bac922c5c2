from dsen2_tpu.train.callbacks import BestCheckpoint, LossLogger, ReduceLROnPlateau
from dsen2_tpu.train.loop import TrainState, fit
from dsen2_tpu.train.losses import mae, mse
from dsen2_tpu.train.nadam import NadamKerasState, nadam_keras

__all__ = [
    "BestCheckpoint",
    "LossLogger",
    "ReduceLROnPlateau",
    "TrainState",
    "fit",
    "mae",
    "mse",
    "NadamKerasState",
    "nadam_keras",
]
