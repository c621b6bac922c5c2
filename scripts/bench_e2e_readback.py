"""Honest end-to-end full-tile benchmark INCLUDING host readback.

Complements bench.py (which scores device-resident outputs and reports d2h
separately — see its docstring for why: this dev harness's TPU tunnel moves
~20-30 MB/s d2h where a real v5e host does tens of GB/s). Here both networks
run through the banded engine (infer/engine.py::sr_banded), which overlaps
band readback with the next band's compute, and the clock stops only when
the LAST output byte is in host numpy arrays.

Weights are random-initialized (conv timing is weight-independent; accuracy
is benchmarked separately by the demo CLI against real weights).

Prints one JSON line. Env: BENCH_SIZE (default 10980), BENCH_PRECISION
(default "high"), BENCH_ROWS_PER_BAND (default 16).
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
    precision = os.environ.get("BENCH_PRECISION", "high")
    rows_per_band = int(os.environ.get("BENCH_ROWS_PER_BAND", "16"))
    assert size % 6 == 0, "BENCH_SIZE must be a multiple of 6"

    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dsen2_tpu.core.config import InferConfig, dsen2_2x, dsen2_6x
    from dsen2_tpu.infer.engine import sr_banded
    from dsen2_tpu.models import s2net

    rng = np.random.default_rng(0)
    d10 = (rng.random((size, size, 4), dtype=np.float32) * 10000).astype(np.float32)
    d20 = (rng.random((size // 2, size // 2, 6), dtype=np.float32) * 10000).astype(np.float32)
    d60 = (rng.random((size // 6, size // 6, 2), dtype=np.float32) * 10000).astype(np.float32)

    cfg2, cfg6 = dsen2_2x(False), dsen2_6x(False)
    params2 = s2net.init_params(jax.random.PRNGKey(0), cfg2)
    params6 = s2net.init_params(jax.random.PRNGKey(1), cfg6)
    icfg2 = InferConfig(patch_size=128, border=8, batch_size=64, precision=precision)
    icfg6 = InferConfig(patch_size=192, border=12, batch_size=32, precision=precision)

    def run():
        sr60 = sr_banded([d10, d20, d60], 6, cfg6, params6, icfg6, rows_per_band)
        sr20 = sr_banded([d10, d20], 2, cfg2, params2, icfg2, rows_per_band)
        return sr20, sr60

    t0 = time.time()
    sr20, sr60 = run()  # cold: includes compile
    warm_seconds = time.time() - t0
    assert np.isfinite(sr20).all() and np.isfinite(sr60).all()

    t0 = time.time()
    sr20, sr60 = run()
    seconds = time.time() - t0

    out_mp = size * size / 1e6
    n_chips = len(jax.devices())
    value = out_mp / seconds / n_chips
    baseline = (10980.0 * 10980.0 / 1e6) / 60.0 / 8.0
    print(json.dumps({
        "metric": "sr_megapixels_per_sec_per_chip_e2e_readback",
        "value": round(value, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(value / baseline, 4),
        "tile_10m_px": size,
        "seconds_both_nets_incl_readback": round(seconds, 3),
        "warmup_seconds": round(warm_seconds, 3),
        "output_gb": round((sr20.nbytes + sr60.nbytes) / 1e9, 3),
        "rows_per_band": rows_per_band,
        "n_chips": n_chips,
        "precision": precision,
        "note": "random weights; d2h tunnel-limited in this harness (~20-30 MB/s)",
    }))


if __name__ == "__main__":
    main()
