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

    The default lives NEXT TO THE PACKAGE (<repo>/.jax_cache) rather than
    under the temp dir: /tmp is wiped between harness sessions, which made
    every benchmark/CLI invocation a full cold compile (the measured r02
    warmup was 187 s of which ~150 s was compilation). A repo-local cache
    survives as long as the checkout does. Falls back to a per-uid tempdir
    path when the package directory is not writable (system installs).
    On a checkout shared by several users, point DSEN2_TPU_COMPILE_CACHE
    at per-user directories — JAX degrades unreadable entries to cache
    misses with a warning, but cross-user reuse of compiled executables is
    not a supported configuration; to keep that configuration from arising
    implicitly, the repo-local default additionally requires the checkout
    (and any existing cache dir) to be OWNED by the current uid —
    deserializing executables another user wrote is an integrity risk, and
    a group/world-writable shared checkout falls back to the per-uid
    tempdir path instead. Opt out with DSEN2_TPU_COMPILE_CACHE="";
    an explicit JAX setting (env var or prior jax.config.update) is
    respected."""
    import os
    import tempfile

    repo_default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    uid = os.getuid() if hasattr(os, "getuid") else "u"  # no getuid on Windows
    tmp_default = os.path.join(tempfile.gettempdir(), f"dsen2_jax_cache_{uid}")

    def _private_to_me(path: str) -> bool:
        """Owned by the current uid AND not writable by group/others —
        entries another user could write would be deserialized as compiled
        executables."""
        if not hasattr(os, "getuid"):
            return True  # no POSIX ownership on Windows; writability governs
        try:
            st = os.stat(path)
        except OSError:
            return False
        return st.st_uid == os.getuid() and not (st.st_mode & 0o022)

    use_repo = (
        os.access(os.path.dirname(repo_default), os.W_OK)
        and _private_to_me(os.path.dirname(repo_default))
        and (not os.path.exists(repo_default) or _private_to_me(repo_default))
    )
    default = repo_default if use_repo else tmp_default
    cache_dir = os.environ.get("DSEN2_TPU_COMPILE_CACHE", default)
    if not cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache medium-sized compiles too: the tiled pipelines are many
        # seconds each, and sub-second helpers are cheap to store.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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
