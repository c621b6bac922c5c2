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


def _enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a stable directory so
    library/CLI processes reuse each other's compiled pipelines (first
    compile of a tile geometry is minutes on TPU; warm processes skip it).
    Opt out with DSEN2_TPU_COMPILE_CACHE="" ; an explicit JAX setting
    (env var or prior jax.config.update) is respected. The default path is
    per-user (uid-suffixed under the temp dir): a fixed world-shared /tmp
    path would collide between users and deserialize another user's
    cached executables."""
    import os
    import tempfile

    uid = os.getuid() if hasattr(os, "getuid") else "u"  # no getuid on Windows
    default = os.path.join(tempfile.gettempdir(), f"dsen2_jax_cache_{uid}")
    cache_dir = os.environ.get("DSEN2_TPU_COMPILE_CACHE", default)
    if not cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", cache_dir)


_enable_persistent_compile_cache()

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
