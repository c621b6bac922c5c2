"""Mesh-parallel inference: multi-tile fleets AND single-tile band sharding.

BASELINE config #5: "VDSen2 batched multi-tile inference across a v5e-8
mesh". Tiles are independent, and every patch carries its own halo, so the
natural mesh mapping is tile-level data parallelism under shard_map: the
tile batch shards over the 'data' axis, each device runs the full fused
pipeline (pad -> gather -> upsample -> CNN -> mosaic) on its local tiles,
and the only collective is the implicit result layout — ZERO communication
during compute (SURVEY.md §5.7's design win, preserved across chips).

sr_tile_sharded extends the same zero-communication property to ONE tile:
the patch grid's rows split into contiguous bands (the banded engine's row
decomposition, infer/engine.py), one band per device — each device receives
only its input window (+halo) and mosaics its own disjoint output band, so
a single 10980^2 tile scales across chips with no collective during
compute. Bands are write-disjoint because the edge-flush row is merged into
the preceding band, as in the banded engine. Bit-identical to the
single-device pipeline when the per-chunk batch shape coincides (verified
in tests); when the per-shard patch count forces a smaller chunk, XLA tiles
the convs differently and results agree to f32 reduction-order tolerance
(~1.5e-4 relative, same class of variation as any batch-size change)."""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dsen2_tpu.core.config import InferConfig, ModelConfig, dsen2_2x, dsen2_6x
from dsen2_tpu.infer.api import (
    _pad_to_multiple,
    _prepare_schedule,
    build_grids,
    sr_tile,
    staging_dtype,
)
from dsen2_tpu.ops.tiling import PatchGrid, recompose_positions
from dsen2_tpu.parallel.mesh import DATA_AXIS


def _stack_dtype(t):
    """Staging dtype for a tile stack WITHOUT forcing a device round trip:
    device/ndarray stacks answer via .dtype; anything else (e.g. a plain
    list of uint16 arrays) is probed through its elements so compact
    staging is never silently lost to a float32 fallback."""
    dt = getattr(t, "dtype", None)
    if dt is None:
        elem = t[0] if len(t) else np.float32
        dt = getattr(elem, "dtype", np.dtype(np.float32))
    return staging_dtype(dt)

__all__ = [
    "sr_tiles_sharded",
    "sr_tile_sharded",
    "dsen2_20_tiles",
    "dsen2_60_tiles",
    "plan_shard_bands",
]


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
    grids = build_grids([r.shape[1:] for r in tile_inputs], lr_factor, infer_cfg)
    interior = p_hr - 2 * b_hr
    batch = min(infer_cfg.batch_size, grids[0].num_patches)
    starts, positions, _ = _prepare_schedule(grids, (h10, w10), interior, batch)
    starts_j = jnp.asarray(starts)
    positions_j = jnp.asarray(positions)

    n_in = len(tile_inputs)
    fn = _sharded_pipeline(mesh, n_in, cfg, infer_cfg, grids, (h10, w10))
    # Compact dtypes ship unconverted; the pipeline casts on device
    # (infer.api.staging_dtype contract — half the h2d bytes for uint16).
    # Read .dtype without np.asarray: a device-resident stack must not pay
    # a d2h round trip just to learn its dtype.
    tiles_dev = tuple(
        jax.device_put(
            jnp.asarray(t, _stack_dtype(t)),
            NamedSharding(mesh, P(DATA_AXIS)),
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


def plan_shard_bands(ny: int, interior: int, out_h: int, ndev: int) -> List[Tuple[int, int]]:
    """Assign the ny patch-grid rows to ndev contiguous bands, balanced to
    within one row. The final edge-flush row (present iff ny*interior >
    out_h) always shares a band with the row before it, so bands write
    DISJOINT output-row ranges: band (r0, r1) owns [r0*interior,
    r1*interior), the last non-empty band owns through out_h. Trailing
    bands may be empty (r0 == r1) when ny < ndev."""
    base, rem = divmod(ny, ndev)
    rows = [base + (1 if s < rem else 0) for s in range(ndev)]
    has_flush = ny * interior > out_h
    if has_flush and ny >= 2:
        # find the band holding the last row; if it holds ONLY that row,
        # steal one from the previous non-empty band
        bounds = np.cumsum([0] + rows)
        last = next(s for s in range(ndev) if bounds[s] < ny <= bounds[s + 1])
        if rows[last] == 1 and last > 0:
            rows[last - 1] -= 1
            rows[last] += 1
    bounds = np.cumsum([0] + rows)
    return [(int(bounds[s]), int(bounds[s + 1])) for s in range(ndev)]


def sr_tile_sharded(
    params,
    rasters: Sequence[np.ndarray],  # finest first, HWC numpy
    lr_factor: int,
    cfg: ModelConfig,
    infer_cfg: InferConfig,
    mesh: Mesh,
    device_result: bool = False,
):
    """Super-resolve ONE tile with its patch grid sharded over the mesh
    'data' axis: device s computes grid-row band s of the output mosaic
    from only its own input window (pre-padded halo included), zero
    communication during compute. Returns the [H, W, C_out] host mosaic
    (numerics vs single-device: see module docstring).

    device_result=True instead returns (result, band_meta) with NO host
    readback: result is the sharded [ndev, band_h_max, W, C_out] device
    array and band_meta a list of (y0, band_h) per shard (band_h 0 marks
    an empty shard whose duplicated output must be discarded). The
    device-resident mesh ensemble consumes this to fold shard bands into
    an on-device accumulator and read back ONCE."""
    from dsen2_tpu.infer.api import _validate_inputs

    _validate_inputs(rasters, lr_factor, cfg, infer_cfg)
    ndev = mesh.shape[DATA_AXIS]
    h10, w10 = rasters[0].shape[:2]
    p_hr, b_hr = infer_cfg.patch_size, infer_cfg.border
    grids = build_grids([r.shape for r in rasters], lr_factor, infer_cfg)
    interior = p_hr - 2 * b_hr

    ny = len(grids[0].starts_i)
    nx = len(grids[0].starts_j)
    bands = plan_shard_bands(ny, interior, h10, ndev)
    kmax = max(r1 - r0 for r0, r1 in bands)

    # Per-row schedules on the full grid (padded coords / output coords).
    starts_rows = [
        g.flat_starts().reshape(ny, nx, 2) for g in grids
    ]  # list per input of [ny, nx, 2]
    pos_rows = recompose_positions((h10, w10), interior).reshape(ny, nx, 2)

    # Host-pad each raster once; each shard ships only its window. Compact
    # dtypes (the uint16 L1C source) stay unconverted through pad + window
    # assembly and are cast to compute_dtype on device inside the pipeline
    # (infer.api.staging_dtype contract — half the h2d bytes).
    padded = [
        np.pad(np.asarray(r, staging_dtype(np.asarray(r).dtype)),
               ((g.border, g.border), (g.border, g.border), (0, 0)),
               mode="symmetric")
        for r, g in zip(rasters, grids)
    ]

    band_meta: List[Tuple[int, int]] = []  # (y0, band_h) per shard; h 0 = skip
    shard_starts, shard_pos = [], []
    win_rows: List[List[Tuple[int, int]]] = [[] for _ in grids]  # per input per shard
    for s, (r0, r1) in enumerate(bands):
        if r0 == r1:
            # Empty shard: duplicate a NON-empty band's work and discard the
            # output. bands[0] itself can be empty (the edge-flush rebalance
            # can zero a leading band, e.g. ny==2 on >=2 devices), so pick
            # the first band that actually has rows.
            r0, r1 = next(b for b in bands if b[0] != b[1])
        y0 = r0 * interior
        last_band = r1 == ny
        band_h = (h10 - y0) if last_band else (r1 - r0) * interior
        band_meta.append((y0, band_h if bands[s][0] != bands[s][1] else 0))

        take = list(range(r0, r1)) + [r1 - 1] * (kmax - (r1 - r0))
        pos = pos_rows[take].copy()
        pos[:, :, 0] -= y0
        shard_pos.append(pos.reshape(-1, 2))
        per_input = []
        for i, (srows, g) in enumerate(zip(starts_rows, grids)):
            st = srows[take].copy()
            w0 = int(srows[r0, 0, 0])
            w1 = int(srows[r1 - 1, 0, 0]) + g.patch
            st[:, :, 0] -= w0
            per_input.append(st.reshape(-1, 2))
            win_rows[i].append((w0, w1))
        shard_starts.append(np.stack(per_input, axis=1))  # [kmax*nx, n_in, 2]

    band_h_max = max(h for _, h in band_meta if h) if any(h for _, h in band_meta) else interior
    # empty shards replicate a non-empty band, so their positions stay
    # within band_h_max
    n_patches = kmax * nx
    batch = min(infer_cfg.batch_size, n_patches)

    def chunked(a):
        a = _pad_to_multiple(a, batch)
        return a.reshape(a.shape[0] // batch, batch, *a.shape[1:])

    starts_arr = np.stack([chunked(s) for s in shard_starts])  # [ndev, nb, B, n_in, 2]
    pos_arr = np.stack([chunked(p) for p in shard_pos])  # [ndev, nb, B, 2]

    windows = []
    for i, g in enumerate(grids):
        hmax = max(w1 - w0 for w0, w1 in win_rows[i])
        wpad = padded[i].shape[1]
        c = padded[i].shape[2]
        win = np.zeros((ndev, hmax, wpad, c), padded[i].dtype)
        for s, (w0, w1) in enumerate(win_rows[i]):
            win[s, : w1 - w0] = padded[i][w0:w1]
        windows.append(win)

    fn = _sharded_tile_pipeline(
        mesh, len(rasters), cfg, infer_cfg, grids, (band_h_max, w10)
    )
    shard = NamedSharding(mesh, P(DATA_AXIS))
    result = fn(
        params,
        jax.device_put(jnp.asarray(starts_arr), shard),
        jax.device_put(jnp.asarray(pos_arr), shard),
        *(jax.device_put(jnp.asarray(w), shard) for w in windows),
    )
    if device_result:
        return result, band_meta
    result = np.asarray(result)  # [ndev, band_h_max, W, C]
    out = np.empty((h10, w10, cfg.out_channels), jnp.dtype(infer_cfg.output_dtype))
    for s, (y0, band_h) in enumerate(band_meta):
        if band_h:
            out[y0 : y0 + band_h] = result[s, :band_h]
    return out


@functools.lru_cache(maxsize=32)
def _sharded_tile_pipeline(mesh, n_in, cfg, infer_cfg, grids, band_hw):
    """Jitted shard_map program for one single-tile band-sharded geometry."""
    in_specs = (P(), P(DATA_AXIS), P(DATA_AXIS)) + (P(DATA_AXIS),) * n_in
    out_spec = P(DATA_AXIS)

    def per_shard(params, starts, positions, *windows):
        band = sr_tile(
            params,
            tuple(w[0] for w in windows),
            starts[0],
            positions[0],
            cfg=cfg,
            infer_cfg=infer_cfg,
            grids=grids,
            out_hw=band_hw,
            pad_inputs=False,
        )
        return band[None]

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
