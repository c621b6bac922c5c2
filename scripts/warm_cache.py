"""Prime the persistent compile cache for the standard tile geometries.

Full-tile pipeline compiles are minutes (and in this harness go through a
remote-compile service), so a cold process pays them on first use. The
dsen2_tpu import hook points JAX's persistent compilation cache at
<repo>/.jax_cache (survives across processes and harness sessions); this
script populates it ahead of time by LOWERING AND COMPILING — never
executing — the fused inference pipeline for the production geometries:

  - DSen2 2x and DSen2_60 6x on the full 10980 tile, BOTH execution paths:
    the one-jit whole-mosaic program (device-resident callers, bench.py)
    AND every distinct per-band program of the banded engine
    (infer/engine.py — what the public API/CLI actually run for
    host-output full tiles)
  - VDSen2 2x on the bench.py deep sub-tile (1830, batch 16)

Inputs and parameters are jax.ShapeDtypeStructs, so no tile-sized buffers
are allocated and no TPU step runs; the geometry derivation is the SAME
code the pipelines use (infer.api.build_grids + the banded row plan), so
the compiled executables land in the cache under exactly the keys the real
API will look up. Run once after cloning (or after a JAX upgrade):
`python scripts/warm_cache.py`.

Env: WARM_SIZE (default 10980), WARM_DEEP_SIZE (default 1830; 0 skips),
WARM_PRECISIONS (default "high,default": the bench/parity class AND the
Pallas-routed turbo class bench.py's turbo row executes; WARM_PRECISION
is accepted as a single-value alias), WARM_BATCH2/WARM_BATCH6 (64/32),
WARM_ROWS_PER_BAND (default 16, the sr_banded default; 0 skips banded),
WARM_INPUT_DTYPES (default "uint16,float32" — input dtype keys the HLO;
uint16 is the compact-staging production/bench path).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _input_shapes(lr_factor: int, size: int):
    return {
        2: [(size, size, 4), (size // 2, size // 2, 6)],
        6: [(size, size, 4), (size // 2, size // 2, 6), (size // 6, size // 6, 2)],
    }[lr_factor]


def warm_one(lr_factor: int, cfg, icfg, size: int, rows_per_band: int,
             in_dtype="uint16") -> int:
    """Compile (cache-write or cache-hit) every pipeline program this
    geometry can execute; returns the number of programs compiled.
    in_dtype keys the compiled HLO: uint16 is the production/bench staging
    (compact h2d, infer.api.stage_raster), float32 the legacy path. One
    in_dtype applies to ALL input rasters — a caller feeding MIXED dtypes
    (e.g. f32 d10 with uint16 d20) compiles under a different HLO key and
    bypasses this cache (cold compile on first use)."""
    import jax
    import jax.numpy as jnp

    from dsen2_tpu.infer.api import _prepare_schedule, build_grids, sr_pipeline
    from dsen2_tpu.models import s2net
    from dsen2_tpu.ops.tiling import recompose_positions

    shapes = _input_shapes(lr_factor, size)
    grids = build_grids(shapes, lr_factor, icfg)
    interior = icfg.patch_size - 2 * icfg.border

    params = jax.eval_shape(
        lambda k: s2net.init_params(k, cfg), jax.random.PRNGKey(0)
    )
    inputs = tuple(jax.ShapeDtypeStruct(s, jnp.dtype(in_dtype)) for s in shapes)

    def compile_program(starts_shape, pos_shape, out_hw,
                        window_shapes=None):
        """window_shapes=None -> the whole-raster (pad_inputs=True) program;
        otherwise the streaming-window (pad_inputs=False) program the
        host-input banded path executes."""
        ins = (
            inputs
            if window_shapes is None
            else tuple(
                jax.ShapeDtypeStruct(s, jnp.dtype(in_dtype))
                for s in window_shapes
            )
        )
        sr_pipeline.lower(
            params,
            ins,
            jax.ShapeDtypeStruct(starts_shape, jnp.int32),
            jax.ShapeDtypeStruct(pos_shape, jnp.int32),
            cfg=cfg,
            infer_cfg=icfg,
            grids=grids,
            out_hw=out_hw,
            pad_inputs=window_shapes is None,
        ).compile()

    jobs = []
    # 1. the one-jit whole-mosaic program (infer.api._run device_output path)
    batch = min(icfg.batch_size, grids[0].num_patches)
    starts, positions, _ = _prepare_schedule(grids, (size, size), interior, batch)
    jobs.append((starts.shape, positions.shape, (size, size), None))

    # 2. the banded engine's per-band programs (infer/engine.py::sr_banded)
    #    — mirror its band plan exactly, BOTH input modes: whole-raster
    #    (device-resident callers: bench.py, the self-ensemble) and
    #    streaming windows (host-input callers: the public API/CLIs).
    if rows_per_band:
        from dsen2_tpu.infer.engine import band_window_rows, plan_bands

        pos_all = recompose_positions((size, size), interior)
        ny = len(grids[0].starts_i)
        nx = pos_all.shape[0] // ny
        bbatch = min(icfg.batch_size, nx * min(rows_per_band, ny))
        band_rows = plan_bands(ny, rows_per_band)
        seen = set()
        for r0, r1 in band_rows:
            sl = pos_all[r0 * nx : r1 * nx]
            y_off = int(sl[:, 0].min())
            band_h = int(sl[:, 0].max()) + interior - y_off
            n = sl.shape[0]
            nb = -(-n // bbatch)
            wins = tuple(
                (
                    (lambda w: w[1] - w[0])(band_window_rows(g, r0, r1)),
                    shp[1] + 2 * g.border,
                    shp[2],
                )
                for g, shp in zip(grids, shapes)
            )
            key = (nb, band_h, wins)
            if key in seen:
                continue
            seen.add(key)
            starts_shape = (nb, bbatch, len(grids), 2)
            pos_shape = (nb, bbatch, 2)
            jobs.append((starts_shape, pos_shape, (band_h, size), None))
            jobs.append((starts_shape, pos_shape, (band_h, size), wins))

    for starts_shape, pos_shape, out_hw, wins in jobs:
        compile_program(starts_shape, pos_shape, out_hw, wins)
    return len(jobs)


def main() -> int:
    size = int(os.environ.get("WARM_SIZE", "10980"))
    deep_size = int(os.environ.get("WARM_DEEP_SIZE", "1830"))
    precisions = [
        t.strip()
        for t in os.environ.get(
            "WARM_PRECISIONS",
            os.environ.get("WARM_PRECISION", "high,default"),
        ).split(",")
        if t.strip()
    ]
    rows_per_band = int(os.environ.get("WARM_ROWS_PER_BAND", "16"))

    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dsen2_tpu.core.config import InferConfig, dsen2_2x, dsen2_6x

    jobs = []
    for precision in precisions:
        jobs += [
            ("DSen2 2x", 2, dsen2_2x(False), InferConfig(
                patch_size=128, border=8,
                batch_size=int(os.environ.get("WARM_BATCH2", "64")),
                precision=precision), size, rows_per_band),
            ("DSen2_60 6x", 6, dsen2_6x(False), InferConfig(
                patch_size=192, border=12,
                batch_size=int(os.environ.get("WARM_BATCH6", "32")),
                precision=precision), size, rows_per_band),
        ]
        deep_icfg2 = InferConfig(
            patch_size=128, border=8,
            batch_size=int(os.environ.get("BENCH_DEEP_BATCH", "16")),
            precision=precision)
        deep_icfg6 = InferConfig(
            patch_size=192, border=12,
            batch_size=int(os.environ.get("BENCH_DEEP_BATCH6", "8")),
            precision=precision)
        if deep_size:
            jobs.append(("VDSen2 2x", 2, dsen2_2x(True), deep_icfg2,
                         deep_size, 0))
            jobs.append(("VDSen2_60 6x", 6, dsen2_6x(True), deep_icfg6,
                         deep_size, 0))
        if os.environ.get("WARM_DEEP_FULL", "0") == "1":
            # The measured deep full-tile path (BENCH_DEEP_FULL=1 bench.py /
            # docs/PERFORMANCE.md): both VDSen2 heads through the banded
            # engine at WARM_SIZE.
            jobs.append(("VDSen2 2x banded", 2, dsen2_2x(True), deep_icfg2,
                         size, rows_per_band))
            jobs.append(("VDSen2_60 6x banded", 6, dsen2_6x(True), deep_icfg6,
                         size, rows_per_band))

    in_dtypes = [
        t.strip()
        for t in os.environ.get("WARM_INPUT_DTYPES", "uint16,float32").split(",")
        if t.strip()
    ]
    print(f"cache dir: {jax.config.jax_compilation_cache_dir}")
    for name, lr_factor, cfg, icfg, sz, rows in jobs:
        for in_dtype in in_dtypes:
            t0 = time.time()
            n = warm_one(lr_factor, cfg, icfg, sz, rows, in_dtype=in_dtype)
            print(f"warmed {name} @ {sz} ({icfg.precision}, {in_dtype} in): "
                  f"{n} programs, {time.time() - t0:.1f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
