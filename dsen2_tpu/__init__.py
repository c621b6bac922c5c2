"""dsen2_tpu — a TPU-native Sentinel-2 super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild with the full capability surface of the
reference DSen2 stack (ACMEAtronOmatic/DSen2): the DSen2/VDSen2 residual CNN
family (2x and 6x heads), halo-patch tiled inference over arbitrarily large
rasters, the Wald-protocol training data pipeline, a Keras-2-faithful Nadam
training loop, Keras-HDF5 weight parity, SAFE-tile ingestion and GeoTIFF
output — redesigned TPU-first (NHWC + MXU matmul resampling + shard_map data
parallelism over a device mesh) rather than translated.
"""

__version__ = "0.1.0"

from dsen2_tpu.core import (
    SCALE,
    InferConfig,
    ModelConfig,
    TrainConfig,
    dsen2_2x,
    dsen2_6x,
)
from dsen2_tpu.infer.api import dsen2_20, dsen2_60

__all__ = [
    "SCALE",
    "InferConfig",
    "ModelConfig",
    "TrainConfig",
    "dsen2_2x",
    "dsen2_6x",
    "dsen2_20",
    "dsen2_60",
]
