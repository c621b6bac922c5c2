"""Honest end-to-end full-tile benchmark INCLUDING host readback.

Complements bench.py (which scores device-resident outputs and reports d2h
separately — see its docstring for why: this dev harness's TPU tunnel moves
~20-30 MB/s d2h where a real v5e host does tens of GB/s). Here both networks
run through the banded engine (infer/engine.py::sr_banded), which overlaps
band readback with the next band's compute, and the clock stops only when
the LAST output byte is in host numpy arrays.

Measured for each requested output dtype (BENCH_OUTPUT_DTYPES, default
"float32,uint16"): float32 is the parity default; uint16 is the compact
readback mode (InferConfig.output_dtype) that halves d2h bytes by rounding
to integer reflectance on device — semantically lossless for Sentinel-2
L1C data (integer-valued at source; the reference's own writer quantizes,
testing/s2_tiles_supres.py:397).

Weights are random-initialized (conv timing is weight-independent; accuracy
is benchmarked separately by the demo CLI against real weights).

Prints one JSON line. Env: BENCH_SIZE (default 10980), BENCH_PRECISION
(default "high"), BENCH_ROWS_PER_BAND (default 16), BENCH_OUTPUT_DTYPES.
"""

from __future__ import annotations

import dataclasses
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
    precision = os.environ.get("BENCH_PRECISION", "high")
    rows_per_band = int(os.environ.get("BENCH_ROWS_PER_BAND", "16"))
    dtypes = os.environ.get("BENCH_OUTPUT_DTYPES", "float32,uint16").split(",")
    assert size % 6 == 0, "BENCH_SIZE must be a multiple of 6"

    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dsen2_tpu.core.config import InferConfig, dsen2_2x, dsen2_6x
    from dsen2_tpu.infer.engine import sr_banded
    from dsen2_tpu.models import s2net

    rng = np.random.default_rng(0)
    # uint16: the L1C source dtype — compact staging ships the integers and
    # casts on device (infer.api.stage_raster), halving the h2d leg too.
    in_dtype = np.dtype(os.environ.get("BENCH_INPUT_DTYPE", "uint16"))
    d10 = (rng.random((size, size, 4), dtype=np.float32) * 10000).astype(in_dtype)
    d20 = (rng.random((size // 2, size // 2, 6), dtype=np.float32) * 10000).astype(in_dtype)
    d60 = (rng.random((size // 6, size // 6, 2), dtype=np.float32) * 10000).astype(in_dtype)

    cfg2, cfg6 = dsen2_2x(False), dsen2_6x(False)
    params2 = s2net.init_params(jax.random.PRNGKey(0), cfg2)
    params6 = s2net.init_params(jax.random.PRNGKey(1), cfg6)
    icfg2 = InferConfig(patch_size=128, border=8, batch_size=64, precision=precision)
    icfg6 = InferConfig(patch_size=192, border=12, batch_size=32, precision=precision)

    n_chips = len(jax.devices())
    out_mp = size * size / 1e6
    baseline = (10980.0 * 10980.0 / 1e6) / 60.0 / 8.0

    modes = {}
    for dt in dtypes:
        c2 = dataclasses.replace(icfg2, output_dtype=dt)
        c6 = dataclasses.replace(icfg6, output_dtype=dt)

        def run():
            sr60 = sr_banded([d10, d20, d60], 6, cfg6, params6, c6, rows_per_band)
            sr20 = sr_banded([d10, d20], 2, cfg2, params2, c2, rows_per_band)
            return sr20, sr60

        t0 = time.time()
        sr20, sr60 = run()  # cold for this dtype: includes compile
        warm_seconds = time.time() - t0
        assert np.isfinite(sr20.astype(np.float32)).all()
        assert np.isfinite(sr60.astype(np.float32)).all()

        t0 = time.time()
        sr20, sr60 = run()
        seconds = time.time() - t0
        modes[dt] = {
            "seconds_both_nets_incl_readback": round(seconds, 3),
            "warmup_seconds": round(warm_seconds, 3),
            "output_gb": round((sr20.nbytes + sr60.nbytes) / 1e9, 3),
            "mp_per_sec_per_chip": round(out_mp / seconds / n_chips, 4),
        }

    primary = modes[dtypes[0]]
    value = primary["mp_per_sec_per_chip"]
    print(json.dumps({
        "metric": "sr_megapixels_per_sec_per_chip_e2e_readback",
        "value": value,
        "unit": "MP/s/chip",
        "vs_baseline": round(value / baseline, 4),
        "tile_10m_px": size,
        "rows_per_band": rows_per_band,
        "n_chips": n_chips,
        "precision": precision,
        "modes": modes,
        "note": "random weights; d2h tunnel-limited in this harness (~20-30 MB/s); "
        "uint16 = compact readback (InferConfig.output_dtype)",
    }))


if __name__ == "__main__":
    main()
