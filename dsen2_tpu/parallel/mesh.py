"""Device mesh construction and sharding helpers.

The workload is patch-parallel: every patch carries its own halo, so the
natural mapping is data parallelism over the patch/batch axis with params
replicated (SURVEY.md §2.4). A second 'model' axis is supported for the
VDSen2-scale variant (shards conv feature dims; XLA inserts the
all-gathers/reduce-scatters over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_params"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    need = data * model
    if need > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {need} devices, have {len(devices)}")
    devices = devices[:need]
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard array axis `axis` over the data mesh axis, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, model_parallel: bool = False):
    """Place params on the mesh: replicated for DP; with model_parallel, conv
    kernels shard their output-feature dim over the 'model' axis (a simple
    Megatron-style split; biases follow their kernel)."""
    if not model_parallel or mesh.shape[MODEL_AXIS] == 1:
        return jax.device_put(params, replicated(mesh))

    def spec_for(path: str, ndim: int):
        # kernels: [..., in, out] -> shard 'out'; stacked block kernels are
        # [L, 3, 3, in, out]. biases: [..., out] -> shard last.
        spec = [None] * ndim
        spec[-1] = MODEL_AXIS
        return NamedSharding(mesh, P(*spec))

    out = {}
    for top, sub in params.items():
        out[top] = {
            k: jax.device_put(v, spec_for(k, np.ndim(v))) for k, v in sub.items()
        }
    return out
