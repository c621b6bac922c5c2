"""Banded full-tile engine: compute/readback overlap + bounded HBM.

The one-jit pipeline (infer/api.py) keeps the whole output mosaic in HBM and
hands it back in a single device->host transfer at the end. For production
full tiles this engine splits the patch grid into horizontal BANDS of whole
grid rows, launches one jitted pipeline per band, and pulls band i to host
while band i+1 computes (JAX dispatch is async, so the readback of a
finished band overlaps the next band's execution). Peak HBM for outputs
drops from the full mosaic to one band.

Band boundaries need no halo exchange: every patch already carries its own
halo from the padded input, and grid rows write disjoint output rows —
except the final edge-flush row, which is merged into the last band
(same last-write-wins semantics as the reference mosaic)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dsen2_tpu.core.config import InferConfig, ModelConfig
from dsen2_tpu.infer.api import (
    _pad_to_multiple,
    _validate_inputs,
    build_grids,
    sr_pipeline,
    stage_raster,
)
from dsen2_tpu.ops.tiling import PatchGrid, recompose_positions

__all__ = ["plan_bands", "sr_banded"]


def plan_bands(ny: int, rows_per_band: int):
    """Assign the ny patch-grid rows to bands of rows_per_band rows; the
    final flush row (if any) writes rows that overlap the previous row's
    span, so a lone trailing row always joins the last band. SINGLE source
    of truth for the banded program shapes — scripts/warm_cache.py mirrors
    this plan to prime the compile cache under the exact keys sr_banded
    will look up."""
    if rows_per_band < 1:
        raise ValueError(f"rows_per_band must be >= 1, got {rows_per_band}")
    band_rows = []
    r0 = 0
    while r0 < ny:
        r1 = min(r0 + rows_per_band, ny)
        if ny - r1 == 1:
            r1 = ny
        band_rows.append((r0, r1))
        r0 = r1
    return band_rows


def sr_banded(
    rasters: Sequence[np.ndarray],
    lr_factor: int,
    cfg: ModelConfig,
    params,
    infer_cfg: InferConfig,
    rows_per_band: int = 16,
    device_output: bool = False,
):
    """Like infer.api._run but banded. rasters: finest-first HWC numpy.
    rows_per_band: patch-grid rows per band (16 rows x 112 px = 1792 output
    rows per band on the default 2x geometry).

    device_output=True returns the bands as a GENERATOR of (device_array,
    y0, band_h) without any host readback — for callers that chain device
    work or score compute without the d2h link. Band k+1 is dispatched
    before band k is yielded, so consuming promptly keeps one band of
    compute in flight while bounding resident output HBM to ~2 bands —
    drain as you iterate to keep the engine's bounded-memory guarantee
    (materializing the whole generator holds every band, i.e. the full
    mosaic, in HBM). Beyond its API role this also sidesteps a measured
    harness effect: the FIRST execution of the one-jit full-tile program
    pays a multi-minute backend overhead that the smaller per-band program
    does not."""
    if rows_per_band < 1:
        raise ValueError(f"rows_per_band must be >= 1, got {rows_per_band}")
    _validate_inputs(rasters, lr_factor, cfg, infer_cfg)
    h10, w10 = rasters[0].shape[:2]
    p_hr, b_hr = infer_cfg.patch_size, infer_cfg.border
    grids = build_grids([r.shape for r in rasters], lr_factor, infer_cfg)
    interior = p_hr - 2 * b_hr

    starts_all = [g.flat_starts() for g in grids]
    pos_all = recompose_positions((h10, w10), interior)
    n = pos_all.shape[0]
    ny = len(grids[0].starts_i)
    nx = n // ny

    inputs = tuple(stage_raster(r) for r in rasters)
    batch = min(infer_cfg.batch_size, nx * min(rows_per_band, ny))

    band_rows = plan_bands(ny, rows_per_band)

    out_dtype = jnp.dtype(infer_cfg.output_dtype)

    def band_iter():
        """Dispatch band k+1 before yielding band k: the consumer drains a
        finished band while the next computes (async dispatch), and at most
        ~2 bands of output are device-resident at any time."""
        prev = None
        for r0, r1 in band_rows:
            sl = slice(r0 * nx, r1 * nx)
            band_pos = pos_all[sl].copy()
            y_off = int(band_pos[:, 0].min())
            band_h = int(band_pos[:, 0].max()) + interior - y_off
            band_pos[:, 0] -= y_off

            stacked = np.stack([s[sl] for s in starts_all], axis=1)
            stacked = _pad_to_multiple(stacked, batch)
            bpos = _pad_to_multiple(band_pos, batch)
            nb = stacked.shape[0] // batch

            band = sr_pipeline(
                params,
                inputs,
                jnp.asarray(stacked.reshape(nb, batch, len(grids), 2)),
                jnp.asarray(bpos.reshape(nb, batch, 2)),
                cfg=cfg,
                infer_cfg=infer_cfg,
                grids=grids,
                out_hw=(band_h, w10),
            )
            if prev is not None:
                yield prev
            prev = (band, y_off, band_h)
        if prev is not None:
            yield prev

    if device_output:
        return band_iter()
    out = np.empty((h10, w10, cfg.out_channels), out_dtype)
    for b, yo, bh in band_iter():
        out[yo : yo + bh] = np.asarray(b)
    return out
