"""Measure the device-resident geometric self-ensemble vs the host loop.

Round-3's ensemble ran 8 host round-trips: host-side dihedral transform,
full pipeline, full mosaic readback, 8 times (infer/api.py r03
_run_ensembled). Round 4 moved the transforms, the accumulation, and the
averaging on device: inputs stage to HBM once and ONE averaged mosaic reads
back. This script times both implementations on the bundled demo scene and
checks they agree to f32 tolerance.

Usage: python scripts/bench_ensemble.py [--scene PATH] [--run_60] [--deep]
       [--iters 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_ensemble(rasters, lr_factor, cfg, params, icfg):
    """The round-3 implementation: 8 host transforms, 8 full readbacks."""
    from dsen2_tpu.infer.api import _run
    from dsen2_tpu.ops.dihedral import dihedral_np, inverse_code

    acc = None
    for code in range(8):
        tr = [dihedral_np(np.asarray(r), code) for r in rasters]
        sr = _run(tr, lr_factor, cfg, params, icfg)
        back = dihedral_np(np.asarray(sr), inverse_code[code]).astype(np.float64)
        acc = back if acc is None else acc + back
    return (acc / 8.0).astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/data/S2A_MSIL1C_20170527_T33UUB.mat")
    ap.add_argument("--run_60", action="store_true")
    ap.add_argument("--deep", action="store_true")
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    from dsen2_tpu.core.config import InferConfig, dsen2_2x, dsen2_6x
    from dsen2_tpu.data.mat import read_scene
    from dsen2_tpu.infer.api import _run_ensembled
    from dsen2_tpu.models import s2net

    import jax

    s = read_scene(args.scene)
    if args.run_60:
        rasters = [s["im10"], s["im20"], s["im60"]]
        lr_factor, cfg = 6, dsen2_6x(args.deep)
        icfg = InferConfig(patch_size=192, border=12)
    else:
        rasters = [s["im10"], s["im20"]]
        lr_factor, cfg = 2, dsen2_2x(args.deep)
        icfg = InferConfig(patch_size=128, border=8)
    params = s2net.init_params(jax.random.PRNGKey(0), cfg)

    def timed(label, fn):
        out = fn()  # warmup (compile both geometries)
        best = np.inf
        for _ in range(args.iters):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        print(f"{label:32s} {best:8.2f} s")
        return out, best

    dev, t_dev = timed(
        "device ensemble (1 readback)",
        lambda: _run_ensembled(rasters, lr_factor, cfg, params, icfg),
    )
    host, t_host = timed(
        "host ensemble (r03, 8 readbacks)",
        lambda: host_ensemble(rasters, lr_factor, cfg, params, icfg),
    )
    diff = np.abs(dev.astype(np.float64) - host.astype(np.float64)).max()
    rel = diff / max(np.abs(host).max(), 1e-9)
    print(f"speedup: {t_host / t_dev:.2f}x   max abs diff {diff:.4f} "
          f"(rel {rel:.2e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
