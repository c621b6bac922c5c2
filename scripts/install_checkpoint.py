"""Evaluate a work-dir checkpoint with the default-weights gate and install it.

Companion to scripts/train_default_weights.py for runs that were stopped
before their epoch budget (the best-val checkpoint is written continuously,
so a truncated run still has a best candidate): rebuild the same Wald
eval payloads (full scenes + the standard held-out strips), run the full
metric suite (plain + self-ensembled), apply the same beat-bicubic gate,
and install under the reference filename if it passes.

Usage:
  python scripts/install_checkpoint.py WORKDIR/s2_dft_lr_1e-04.npz
         [--deep] [--run_60] [--holdout-frac 0.25] [--report FILE]
         [--force-install]
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "_tdw", os.path.join(REPO, "scripts", "train_default_weights.py")
)
_tdw = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_tdw)


def build_evals(scenes, run_60, holdout_frac):
    """The eval payloads of train_default_weights.build_crops, without
    writing any crop archives."""
    import jax.numpy as jnp

    from dsen2_tpu.data.mat import read_scene
    from dsen2_tpu.ops.resize import wald_downsample

    def wald(img, f):
        return np.asarray(wald_downsample(jnp.asarray(img, jnp.float32), f))

    evals = []
    for path in scenes:
        s = read_scene(path)
        im10, im20, im60 = s["im10"], s["im20"], s.get("im60")
        name = os.path.splitext(os.path.basename(path))[0] + ".SAFE"
        if run_60:
            h36, w36 = (im10.shape[0] // 36) * 36, (im10.shape[1] // 36) * 36
            im10, im20, im60 = (
                im10[:h36, :w36], im20[: h36 // 2, : w36 // 2], im60[: h36 // 6, : w36 // 6]
            )
            d10, d20, d60 = wald(im10, 6), wald(im20, 6), wald(im60, 6)
            n_tr = int(d60.shape[0] * (1.0 - holdout_frac))
            evals.append({"name": name, "gt": im60, "inputs": [d10, d20, d60],
                          "scale": 6, "strip_row": 6 * n_tr})
        else:
            d10, d20 = wald(im10, 2), wald(im20, 2)
            n_tr = int(d20.shape[0] * (1.0 - holdout_frac))
            evals.append({"name": name, "gt": im20, "inputs": [d10, d20],
                          "scale": 2, "strip_row": 2 * n_tr})
    return evals


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help=".npz params checkpoint")
    ap.add_argument("--run_60", action="store_true")
    ap.add_argument("--deep", action="store_true")
    ap.add_argument("--holdout-frac", type=float, default=0.25)
    ap.add_argument("--scenes", default="/root/reference/data")
    ap.add_argument("--out", default=os.path.join(REPO, "models"))
    ap.add_argument("--report", default=None)
    ap.add_argument("--force-install", action="store_true")
    args = ap.parse_args()

    from dsen2_tpu.weights import load_params_npz, reference_weight_filename

    scenes = sorted(glob.glob(os.path.join(args.scenes, "*.mat")))
    params = load_params_npz(args.checkpoint)
    evals = build_evals(scenes, args.run_60, args.holdout_frac)
    results = _tdw.evaluate(params, evals, args.run_60, deep=args.deep)
    tables = _tdw.fmt_tables(results)
    print("\n" + tables)

    gate_rows = []
    for scene, rows in results.items():
        for suffix in ("", " [held-out strip]"):
            b, d = rows["bicubic" + suffix], rows["default" + suffix]
            ok = d["rmse"] < b["rmse"] and d["sre"] > b["sre"]
            gate_rows.append((scene + suffix, ok, d["rmse"], b["rmse"]))
    for name, ok, dr, br in gate_rows:
        print(f"  gate {'PASS' if ok else 'FAIL'}  {name}: "
              f"RMSE {dr:.2f} vs bicubic {br:.2f}")
    gate = all(ok for _, ok, _, _ in gate_rows)
    if args.report:
        with open(args.report, "a") as f:
            f.write("\n" + tables)

    if gate or args.force_install:
        fname = reference_weight_filename(args.run_60, args.deep)
        base = os.path.splitext(args.checkpoint)[0]
        os.makedirs(args.out, exist_ok=True)
        for ext in (".hdf5", ".npz"):
            src = base + ext
            if os.path.exists(src):
                shutil.copy(src, os.path.join(args.out, fname.replace(".hdf5", ext)))
        print(f"INSTALLED {fname} -> {args.out}")
        return 0
    print("bicubic gate FAILED: nothing installed")
    return 1


if __name__ == "__main__":
    sys.exit(main())
