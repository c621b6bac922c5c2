"""Train the framework's DEFAULT weights: joint 2-scene, augmented, long schedule.

Round-2's generalization study (docs/GENERALIZATION.md) showed that nets
trained on ONE bundled scene mostly lose to bicubic on the other, while
augmentation + self-ensembling close most of the gap. This script trains the
configuration nobody had trained yet — DSen2 on Wald-protocol crops of BOTH
bundled scenes jointly, with dihedral augmentation and a long plateau
schedule — and installs it as the framework default only if it beats the
MATLAB-bicubic baseline on RMSE and SRE for BOTH scenes, including on
spatially HELD-OUT strips that contribute no training crops.

Spatial holdout protocol: the bottom `--holdout-frac` of every scene (in the
Wald/input geometry) is excluded from the random-crop sampler, so the strip
metrics are computed on pixels the net has never seen at any resolution.
The shipped default IS the holdout-trained net, so the reported held-out
numbers describe exactly the installed weights.

Reference anchor: the reference ships globally-pretrained checkpoints bound
to its inference API (testing/supres.py:57-60; trained on the 45 tiles of
S2_tiles_training.txt). The original blobs are unrecoverable from the
snapshot; this is the strongest default trainable from the bundled data.

Usage:
  python scripts/train_default_weights.py [--run_60] [--epochs N]
         [--n-crops N] [--holdout-frac F] [--report FILE] [--force-install]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_crops(scenes, run_60, holdout_frac, n_crops, work):
    """Write joint random-crop archives, sampling only above the holdout
    strip. Returns per-scene eval payloads (full rasters + strip offset)."""
    import jax.numpy as jnp

    from dsen2_tpu.data.mat import read_scene
    from dsen2_tpu.data.patches_dataset import (
        make_val_index,
        save_random_patches,
        save_random_patches60,
    )
    from dsen2_tpu.ops.resize import wald_downsample

    def wald(img, f):
        return np.asarray(wald_downsample(jnp.asarray(img, jnp.float32), f))

    sub = "train60" if run_60 else "train"
    evals = []
    total = 0
    for i, path in enumerate(scenes):
        s = read_scene(path)
        im10, im20, im60 = s["im10"], s["im20"], s.get("im60")
        name = os.path.splitext(os.path.basename(path))[0] + ".SAFE"
        out_dir = os.path.join(work, sub, name)
        if run_60:
            h36, w36 = (im10.shape[0] // 36) * 36, (im10.shape[1] // 36) * 36
            im10, im20, im60 = (
                im10[:h36, :w36], im20[: h36 // 2, : w36 // 2], im60[: h36 // 6, : w36 // 6]
            )
            d10, d20, d60 = wald(im10, 6), wald(im20, 6), wald(im60, 6)
            # Crop grid lives on d60 (the coarsest simulated raster).
            patch_60 = 16 if min(d60.shape[:2]) > 24 else 8
            n_tr = int(d60.shape[0] * (1.0 - holdout_frac))
            save_random_patches60(
                im60[: 6 * n_tr], d10[: 6 * n_tr], d20[: 3 * n_tr], d60[:n_tr],
                out_dir, n_crops=n_crops, seed=i, patch_60=patch_60,
            )
            evals.append({
                "name": name, "gt": im60, "inputs": [d10, d20, d60],
                "scale": 6, "strip_row": 6 * n_tr,
            })
        else:
            d10, d20 = wald(im10, 2), wald(im20, 2)
            n_tr = int(d20.shape[0] * (1.0 - holdout_frac))  # on the 40 m grid
            save_random_patches(
                im20[: 2 * n_tr], d10[: 2 * n_tr], d20[:n_tr],
                out_dir, n_crops=n_crops, seed=i,
            )
            evals.append({
                "name": name, "gt": im20, "inputs": [d10, d20],
                "scale": 2, "strip_row": 2 * n_tr,
            })
        total += n_crops
        print(f"crops: {n_crops} from {name} "
              f"(holdout strip from GT row {evals[-1]['strip_row']})")
    np.save(os.path.join(work, sub, "val_index.npy"),
            make_val_index(total, 0.1, seed=0))
    return evals


def metric_row(sr, gt, scale):
    from dsen2_tpu.infer.metrics import ergas, rmse, sam_deg, sre_db, uiq

    return {"rmse": rmse(sr, gt), "sre": sre_db(sr, gt), "sam": sam_deg(sr, gt),
            "ergas": ergas(sr, gt, scale), "uiq": uiq(sr, gt)}


def evaluate(params, evals, run_60, deep=False):
    """Full-scene + held-out-strip metric rows per scene, for bicubic /
    plain / self-ensembled inference."""
    import jax.numpy as jnp

    from dsen2_tpu.core.config import InferConfig
    from dsen2_tpu.infer.api import dsen2_20, dsen2_60
    from dsen2_tpu.ops.resize import matlab_imresize

    out = {}
    for ev in evals:
        gt, scale, r0 = ev["gt"], ev["scale"], ev["strip_row"]
        bic = np.asarray(matlab_imresize(jnp.asarray(ev["inputs"][-1]), gt.shape[:2]))
        if run_60:
            # Default geometry is 192/12; shrink for the small simulated
            # rasters exactly like cli/demo.py does.
            patch = 192
            d60 = ev["inputs"][-1]
            while patch // 6 - 4 > min(d60.shape[:2]) and patch > 36:
                patch -= 36
            icfg = InferConfig(patch_size=patch, border=12, batch_size=32)
            sr = dsen2_60(*ev["inputs"], params=params, infer_cfg=icfg, deep=deep)
            sr_e = dsen2_60(*ev["inputs"], params=params, infer_cfg=icfg,
                            ensemble=True, deep=deep)
        else:
            sr = dsen2_20(*ev["inputs"], params=params, deep=deep)
            sr_e = dsen2_20(*ev["inputs"], params=params, ensemble=True, deep=deep)
        rows = {}
        for tag, img in (("bicubic", bic), ("default", sr), ("default + ensemble", sr_e)):
            rows[tag] = metric_row(img, gt, scale)
            rows[tag + " [held-out strip]"] = metric_row(img[r0:], gt[r0:], scale)
        out[ev["name"]] = rows
    return out


def fmt_tables(results):
    lines = []
    for scene, rows in results.items():
        for strip in (False, True):
            suffix = " — HELD-OUT strip" if strip else " — full scene"
            lines += [f"### default weights eval: {scene}{suffix}", "",
                      "| config | RMSE | SRE dB | SAM deg | ERGAS | UIQ |",
                      "|---|---|---|---|---|---|"]
            for name, r in rows.items():
                if name.endswith("[held-out strip]") != strip:
                    continue
                base = name.replace(" [held-out strip]", "")
                lines.append(f"| {base} | {r['rmse']:.2f} | {r['sre']:.2f} | "
                             f"{r['sam']:.3f} | {r['ergas']:.3f} | {r['uiq']:.4f} |")
            lines.append("")
    return "\n".join(lines) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_60", action="store_true")
    ap.add_argument("--deep", action="store_true", help="VDSen2 (32x256, batch 8)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--n-crops", type=int, default=None, help="per scene")
    ap.add_argument("--holdout-frac", type=float, default=0.25)
    ap.add_argument("--scenes", default="/root/reference/data")
    ap.add_argument("--out", default=os.path.join(REPO, "models"))
    ap.add_argument("--batch", type=int, default=None,
                    help="default 128, or the reference's 8 for --deep")
    ap.add_argument("--report", default=None,
                    help="append the markdown tables to this file")
    ap.add_argument("--json", default=None, help="dump raw metric rows here")
    ap.add_argument("--force-install", action="store_true",
                    help="install even if the bicubic gate fails")
    ap.add_argument("--keep-work", action="store_true")
    args = ap.parse_args()

    import jax

    from dsen2_tpu.core.bands import SCALE
    from dsen2_tpu.core.config import TrainConfig, dsen2_2x, dsen2_6x
    from dsen2_tpu.data.patches_dataset import open_data_files
    from dsen2_tpu.train.loop import fit
    from dsen2_tpu.weights import load_params_npz, reference_weight_filename

    scenes = sorted(glob.glob(os.path.join(args.scenes, "*.mat")))
    if len(scenes) < 2:
        print("need both bundled scenes", file=sys.stderr)
        return 1
    epochs = args.epochs or (600 if args.run_60 else 450)
    batch = args.batch or (8 if args.deep else 128)
    n_crops = args.n_crops or (1000 if args.run_60 else 8000)

    work = tempfile.mkdtemp(prefix="dsen2_default_")
    evals = build_crops(scenes, args.run_60, args.holdout_frac, n_crops, work)
    tr_in, tr_lb, va_in, va_lb = open_data_files(work, args.run_60, SCALE)
    print(f"train {tr_lb.shape[0]} / val {va_lb.shape[0]} patches; "
          f"{epochs} epochs, augmented, lr 1e-4 plateau")

    cfg = (dsen2_6x if args.run_60 else dsen2_2x)(args.deep)
    tcfg = TrainConfig(lr=1e-4, batch_size=batch, model_nr="s2_dft_",
                       out_dir=work, augment=True)
    state, hist = fit(cfg, tcfg, tr_in, tr_lb, va_in, va_lb,
                      epochs=epochs, stage_data=True, verbose=True,
                      remat=args.deep)
    best = min(hist["val_loss"]) if hist["val_loss"] else float("inf")
    print(f"run best val MAE {best:.4e}")

    ckpt = os.path.join(work, "s2_dft_lr_1e-04.npz")
    params = load_params_npz(ckpt) if os.path.exists(ckpt) else jax.device_get(state.params)

    results = evaluate(params, evals, args.run_60, deep=args.deep)
    tables = fmt_tables(results)
    print("\n" + tables)

    # Install gate: beat bicubic RMSE and SRE on every scene, full AND strip.
    gate_rows = []
    for scene, rows in results.items():
        for suffix in ("", " [held-out strip]"):
            b, d = rows["bicubic" + suffix], rows["default" + suffix]
            ok = d["rmse"] < b["rmse"] and d["sre"] > b["sre"]
            gate_rows.append((scene + suffix, ok, d["rmse"], b["rmse"]))
    for name, ok, dr, br in gate_rows:
        print(f"  gate {'PASS' if ok else 'FAIL'}  {name}: RMSE {dr:.2f} vs bicubic {br:.2f}")
    gate = all(ok for _, ok, _, _ in gate_rows)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"results": results, "gate": gate,
                       "best_val_mae": best, "epochs": epochs}, f, indent=1)
    if args.report:
        with open(args.report, "a") as f:
            f.write("\n" + tables)
        print(f"appended tables to {args.report}")

    if gate or args.force_install:
        fname = reference_weight_filename(args.run_60, args.deep)
        os.makedirs(args.out, exist_ok=True)
        installed = []
        for ext in (".hdf5", ".npz"):
            src = os.path.join(work, "s2_dft_lr_1e-04" + ext)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(args.out, fname.replace(".hdf5", ext)))
                installed.append(ext)
        print(f"INSTALLED {fname} ({'/'.join(installed)}) -> {args.out}")
    else:
        print("bicubic gate FAILED: nothing installed "
              "(weights remain in the work dir; rerun with --force-install to override)")
    if args.keep_work or not (gate or args.force_install):
        print(f"work dir kept: {work}")
    else:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
