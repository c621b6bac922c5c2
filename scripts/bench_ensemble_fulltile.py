"""Full-tile self-ensemble benchmark: the recommended accuracy mode at
production scale.

Times `ensemble=True` (8 dihedral transforms, per-band accumulation into
an on-device f32 accumulator, ONE host readback — infer/api.py::
_run_ensembled + _ens_accumulate_bands) on a full Sentinel-2 tile, and
reports peak HBM when the backend exposes memory_stats. The clock stops
when the averaged mosaic is in host numpy (readback included).

Env: BENCH_SIZE (default 10980), BENCH_NET ("6x" default — the head whose
ensemble accuracy gain is largest, docs/GENERALIZATION.md; "2x"),
BENCH_DEEP (0 default), BENCH_PRECISION (default "high"),
BENCH_OUTPUT_DTYPE (default "uint16": compact readback of the mean),
BENCH_SINGLE_RUN=1 (report the first run — includes any residual compiles;
for the ~25-min-per-pass deep configs where a second pass doubles chip
occupancy for little precision).

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.filterwarnings("ignore")


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", "10980"))
    net = os.environ.get("BENCH_NET", "6x")
    deep = os.environ.get("BENCH_DEEP", "0") == "1"
    precision = os.environ.get("BENCH_PRECISION", "high")
    out_dtype = os.environ.get("BENCH_OUTPUT_DTYPE", "uint16")
    assert size % 6 == 0, "BENCH_SIZE must be a multiple of 6"

    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dsen2_tpu.core.config import InferConfig, dsen2_2x, dsen2_6x
    from dsen2_tpu.infer.api import dsen2_20, dsen2_60
    from dsen2_tpu.models import s2net

    rng = np.random.default_rng(0)
    d10 = (rng.random((size, size, 4), dtype=np.float32) * 10000).astype(np.uint16)
    d20 = (rng.random((size // 2, size // 2, 6), dtype=np.float32) * 10000).astype(np.uint16)
    d60 = (rng.random((size // 6, size // 6, 2), dtype=np.float32) * 10000).astype(np.uint16)

    if net == "6x":
        cfg = dsen2_6x(deep)
        icfg = InferConfig(patch_size=192, border=12, precision=precision,
                           batch_size=8 if deep else 32,
                           output_dtype=out_dtype)
        params = s2net.init_params(jax.random.PRNGKey(1), cfg)

        def run():
            return dsen2_60(d10, d20, d60, deep=deep, params=params,
                            infer_cfg=icfg, ensemble=True)

    else:
        cfg = dsen2_2x(deep)
        icfg = InferConfig(patch_size=128, border=8, precision=precision,
                           batch_size=16 if deep else 64,
                           output_dtype=out_dtype)
        params = s2net.init_params(jax.random.PRNGKey(1), cfg)

        def run():
            return dsen2_20(d10, d20, deep=deep, params=params,
                            infer_cfg=icfg, ensemble=True)

    t0 = time.time()
    out = run()  # cold: includes compiles not in the persistent cache
    warm_seconds = time.time() - t0
    assert np.isfinite(out.astype(np.float32)).all()

    if os.environ.get("BENCH_SINGLE_RUN", "0") == "1":
        seconds = warm_seconds
    else:
        t0 = time.time()
        out = run()
        seconds = time.time() - t0

    stats = jax.devices()[0].memory_stats() or {}
    peak_gb = stats.get("peak_bytes_in_use")
    if peak_gb is not None:
        peak_gb = round(peak_gb / 1e9, 2)

    mp = size * size / 1e6
    print(json.dumps({
        "metric": "ensemble_full_tile_seconds_incl_readback",
        "net": f"{'V' if deep else ''}DSen2{'_60' if net == '6x' else ''}",
        "tile_10m_px": size,
        "seconds": round(seconds, 1),
        "warmup_seconds": round(warm_seconds, 1),
        "mp_per_sec_per_chip": round(mp / seconds / len(jax.devices()), 4),
        "precision": precision,
        "output_dtype": out_dtype,
        "peak_hbm_gb": peak_gb,
        "note": "8 dihedral transforms, per-band f32 accumulation on device, "
        "one averaged-mosaic readback; random weights",
    }))


if __name__ == "__main__":
    main()
