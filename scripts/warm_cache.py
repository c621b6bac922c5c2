"""Prime the persistent compile cache for the standard tile geometries.

Full-tile pipeline compiles are minutes (and in this harness go through a
remote-compile service), so a cold process pays them on first use. The
dsen2_tpu import hook points JAX's persistent compilation cache at
<repo>/.jax_cache (survives across processes and harness sessions); this
script populates it ahead of time by LOWERING AND COMPILING — never
executing — the fused inference pipeline for the production geometries:

  - DSen2 2x, full 10980 tile (patch 128/8, batch 64)
  - DSen2_60 6x, full 10980 tile (patch 192/12, batch 32)
  - VDSen2 2x on the bench.py deep sub-tile (1830, batch 16)

Inputs and parameters are jax.ShapeDtypeStructs, so no tile-sized buffers
are allocated and no TPU step runs; the compiled executables land in the
cache keyed by the same HLO the real API produces. Run once after cloning
(or after a JAX upgrade): `python scripts/warm_cache.py`.

Env: WARM_SIZE (default 10980), WARM_DEEP_SIZE (default 1830; 0 skips),
WARM_PRECISION (default "high"), WARM_BATCH2/WARM_BATCH6 (64/32).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def warm_one(lr_factor: int, cfg, icfg, size: int) -> float:
    import jax
    import jax.numpy as jnp

    from dsen2_tpu.infer.api import _prepare_schedule, sr_pipeline
    from dsen2_tpu.models import s2net
    from dsen2_tpu.ops.tiling import PatchGrid

    shapes = {
        2: [(size, size, 4), (size // 2, size // 2, 6)],
        6: [(size, size, 4), (size // 2, size // 2, 6), (size // 6, size // 6, 2)],
    }[lr_factor]
    p_hr, b_hr = icfg.patch_size, icfg.border
    g_coarse = PatchGrid(
        shapes[-1][0], shapes[-1][1], p_hr // lr_factor, b_hr // lr_factor
    )
    factors = [lr_factor // (size // s[0]) for s in shapes]
    grids = tuple(g_coarse.scaled(f) for f in factors)
    interior = p_hr - 2 * b_hr
    batch = min(icfg.batch_size, grids[0].num_patches)
    starts, positions, _ = _prepare_schedule(grids, (size, size), interior, batch)

    params = jax.eval_shape(
        lambda k: s2net.init_params(k, cfg), jax.random.PRNGKey(0)
    )
    inputs = tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes)
    t0 = time.time()
    sr_pipeline.lower(
        params,
        inputs,
        jax.ShapeDtypeStruct(starts.shape, jnp.int32),
        jax.ShapeDtypeStruct(positions.shape, jnp.int32),
        cfg=cfg,
        infer_cfg=icfg,
        grids=grids,
        out_hw=(size, size),
    ).compile()
    return time.time() - t0


def main() -> int:
    size = int(os.environ.get("WARM_SIZE", "10980"))
    deep_size = int(os.environ.get("WARM_DEEP_SIZE", "1830"))
    precision = os.environ.get("WARM_PRECISION", "high")

    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dsen2_tpu.core.config import InferConfig, dsen2_2x, dsen2_6x

    jobs = [
        ("DSen2 2x", 2, dsen2_2x(False), InferConfig(
            patch_size=128, border=8,
            batch_size=int(os.environ.get("WARM_BATCH2", "64")),
            precision=precision), size),
        ("DSen2_60 6x", 6, dsen2_6x(False), InferConfig(
            patch_size=192, border=12,
            batch_size=int(os.environ.get("WARM_BATCH6", "32")),
            precision=precision), size),
    ]
    if deep_size:
        jobs.append(("VDSen2 2x", 2, dsen2_2x(True), InferConfig(
            patch_size=128, border=8,
            batch_size=int(os.environ.get("BENCH_DEEP_BATCH", "16")),
            precision=precision), deep_size))

    print(f"cache dir: {jax.config.jax_compilation_cache_dir}")
    for name, lr_factor, cfg, icfg, sz in jobs:
        dt = warm_one(lr_factor, cfg, icfg, sz)
        print(f"warmed {name} @ {sz} ({precision}): {dt:.1f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
