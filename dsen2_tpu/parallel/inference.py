"""Multi-tile batched inference across the device mesh.

BASELINE config #5: "VDSen2 batched multi-tile inference across a v5e-8
mesh". Tiles are independent, and every patch carries its own halo, so the
natural mesh mapping is tile-level data parallelism under shard_map: the
tile batch shards over the 'data' axis, each device runs the full fused
pipeline (pad -> gather -> upsample -> CNN -> mosaic) on its local tiles,
and the only collective is the implicit result layout — ZERO communication
during compute (SURVEY.md §5.7's design win, preserved across chips)."""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from dsen2_tpu.core.config import InferConfig, ModelConfig, dsen2_2x, dsen2_6x
from dsen2_tpu.infer.api import _prepare_schedule, sr_tile
from dsen2_tpu.ops.tiling import PatchGrid
from dsen2_tpu.parallel.mesh import DATA_AXIS

__all__ = ["sr_tiles_sharded", "dsen2_20_tiles", "dsen2_60_tiles"]


def sr_tiles_sharded(
    params,
    tile_inputs: Sequence[np.ndarray],  # finest first, each [N, H_r, W_r, C_r]
    lr_factor: int,
    cfg: ModelConfig,
    infer_cfg: InferConfig,
    mesh: Mesh,
) -> np.ndarray:
    """Super-resolve a batch of tiles sharded over the mesh 'data' axis.
    N must divide by the data-axis size. Returns [N, H, W, C_out]."""
    n = tile_inputs[0].shape[0]
    ndev = mesh.shape[DATA_AXIS]
    if n % ndev:
        raise ValueError(f"tile batch {n} must divide the data axis {ndev}")

    h10, w10 = tile_inputs[0].shape[1:3]
    p_hr, b_hr = infer_cfg.patch_size, infer_cfg.border
    g_coarse = PatchGrid(
        tile_inputs[-1].shape[1], tile_inputs[-1].shape[2],
        p_hr // lr_factor, b_hr // lr_factor,
    )
    factors = [lr_factor // (h10 // r.shape[1]) for r in tile_inputs]
    grids = tuple(g_coarse.scaled(f) for f in factors)
    interior = p_hr - 2 * b_hr
    batch = min(infer_cfg.batch_size, grids[0].num_patches)
    starts, positions, _ = _prepare_schedule(grids, (h10, w10), interior, batch)
    starts_j = jnp.asarray(starts)
    positions_j = jnp.asarray(positions)

    n_in = len(tile_inputs)
    fn = _sharded_pipeline(mesh, n_in, cfg, infer_cfg, grids, (h10, w10))
    tiles_dev = tuple(
        jax.device_put(
            jnp.asarray(t, jnp.float32), NamedSharding(mesh, P(DATA_AXIS))
        )
        for t in tile_inputs
    )
    return np.asarray(fn(params, starts_j, positions_j, *tiles_dev))


@functools.lru_cache(maxsize=32)
def _sharded_pipeline(mesh, n_in, cfg, infer_cfg, grids, out_hw):
    """Build (and cache) the jitted shard_map pipeline for one geometry —
    repeated fleet calls with the same shapes reuse the compiled program
    instead of retracing per invocation."""
    in_specs = (P(), P(), P()) + (P(DATA_AXIS),) * n_in
    out_spec = P(DATA_AXIS)

    def per_shard(params, starts, positions, *local_tiles):
        def one(tile_tuple):
            return sr_tile(
                params, tile_tuple, starts, positions,
                cfg=cfg, infer_cfg=infer_cfg, grids=grids, out_hw=out_hw,
            )

        return jax.lax.map(one, tuple(local_tiles))

    return jax.jit(
        shard_map(per_shard, mesh=mesh, in_specs=in_specs, out_specs=out_spec)
    )


def dsen2_20_tiles(
    d10s: np.ndarray, d20s: np.ndarray, mesh: Mesh,
    deep: bool = False, params=None, infer_cfg: Optional[InferConfig] = None,
) -> np.ndarray:
    """Batched 2x super-resolution: d10s [N,H,W,4], d20s [N,H/2,W/2,6] ->
    [N,H,W,6], tiles sharded over the mesh."""
    cfg = dsen2_2x(deep)
    infer_cfg = infer_cfg or InferConfig(patch_size=128, border=8)
    if params is None:
        from dsen2_tpu.weights import default_params

        params = default_params(cfg, run_60=False, deep=deep)
    return sr_tiles_sharded(params, [d10s, d20s], 2, cfg, infer_cfg, mesh)


def dsen2_60_tiles(
    d10s: np.ndarray, d20s: np.ndarray, d60s: np.ndarray, mesh: Mesh,
    deep: bool = False, params=None, infer_cfg: Optional[InferConfig] = None,
) -> np.ndarray:
    """Batched 6x super-resolution across the mesh."""
    cfg = dsen2_6x(deep)
    infer_cfg = infer_cfg or InferConfig(patch_size=192, border=12)
    if params is None:
        from dsen2_tpu.weights import default_params

        params = default_params(cfg, run_60=True, deep=deep)
    return sr_tiles_sharded(params, [d10s, d20s, d60s], 6, cfg, infer_cfg, mesh)
