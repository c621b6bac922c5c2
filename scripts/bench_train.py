"""Training-throughput benchmark: patches/s and epoch wall-clock.

Measures the reference's training envelope (training/supres_train.py:218-230:
batch 128, 32x32 HR patches, Nadam + MAE) on a realistic 8000-patch dataset
(one tile's worth, utils/patches.py:181 NR_CROP=8000), comparing the two
input pipelines:

  host-fed  — per-step host indexing + device_put, double-buffered on a
              background thread (train/loop.py::_host_fed_epoch)
  staged    — whole dataset staged into HBM once; each epoch is ONE jitted
              lax.scan (train/staged.py) — only the shuffle permutation and
              scalar metrics cross the host boundary per epoch

Prints one JSON line per pipeline:
  {"metric": "train_patches_per_sec", "pipeline": ..., "value": N, ...}

Env overrides: TRAINBENCH_N (default 8000 patches), TRAINBENCH_EPOCHS
(default 3 timed epochs after 1 warmup), TRAINBENCH_BATCH (default 128),
TRAINBENCH_DEEP=1 for the VDSen2 config (batch 8 unless overridden).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    from dsen2_tpu.core.config import TrainConfig, dsen2_2x
    from dsen2_tpu.train.loop import fit

    deep = os.environ.get("TRAINBENCH_DEEP", "0") == "1"
    n = int(os.environ.get("TRAINBENCH_N", "8000"))
    epochs = int(os.environ.get("TRAINBENCH_EPOCHS", "3"))
    batch = int(os.environ.get("TRAINBENCH_BATCH", "8" if deep else "128"))

    cfg = dsen2_2x(deep)
    rng = np.random.default_rng(0)
    # Reference training geometry: 32x32 HR crops (utils/patches.py:181-219),
    # inputs already /SCALE like OpenDataFiles (utils/patches.py:305-311).
    x10 = (rng.random((n, 32, 32, 4), dtype=np.float32) * 4).astype(np.float32)
    x20 = (rng.random((n, 32, 32, 6), dtype=np.float32) * 4).astype(np.float32)
    lb = (x20 * 1.1 + 0.05).astype(np.float32)
    n_val = max(n // 10, batch)
    tr_in, tr_lb = (x10[n_val:], x20[n_val:]), lb[n_val:]
    va_in, va_lb = (x10[:n_val], x20[:n_val]), lb[:n_val]

    results = {}
    for pipeline in ("staged", "host-fed"):
        tcfg = TrainConfig(lr=1e-4, batch_size=batch, state_every=0)
        t0 = time.time()
        # warmup epoch (compile) then timed epochs, one fit call each so the
        # jit cache carries over (fresh params each fit; compile dominates
        # the first call only).
        _, hist = fit(
            cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
            epochs=1, verbose=False, remat=deep,
            stage_data=(pipeline == "staged"),
        )
        warm = time.time() - t0
        t0 = time.time()
        _, hist = fit(
            cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
            epochs=epochs, verbose=False, remat=deep,
            stage_data=(pipeline == "staged"),
        )
        total = time.time() - t0
        per_epoch = total / epochs
        pps = tr_lb.shape[0] / per_epoch
        results[pipeline] = pps
        print(json.dumps({
            "metric": "train_patches_per_sec",
            "pipeline": pipeline,
            "value": round(pps, 1),
            "unit": "patches/s",
            "epoch_seconds": round(per_epoch, 3),
            "warmup_seconds": round(warm, 1),
            "n_train": int(tr_lb.shape[0]),
            "batch": batch,
            "deep": deep,
            "n_chips": jax.device_count(),
            "final_loss": float(hist["loss"][-1]),
        }))
    if "staged" in results and "host-fed" in results:
        print(json.dumps({
            "metric": "staged_speedup_vs_host_fed",
            "value": round(results["staged"] / results["host-fed"], 2),
            "unit": "x",
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
