"""Bootstrap pretrained weights from the bundled demo scenes.

The reference's pretrained checkpoints are git-LFS blobs missing from the
snapshot, so this script trains DSen2 (and optionally DSen2_60) on
Wald-protocol patches from the two bundled .mat scenes and installs the
result under models/ with the reference's filenames
(testing/supres.py:57,60), making them the framework's default weights.

Protocol is the reference's end to end: Gaussian+mean-pool downsample by
the network's scale factor (training/create_patches.py:220-230), 8000
random 32/16 crops per scene for 2x (500 of 96/48/16 for 6x;
utils/patches.py:181,222), /2000 scaling, MAE + Keras-Nadam(1e-4), plateau
LR, best-val checkpointing.

Usage: python scripts/train_demo_weights.py [--run_60] [--epochs N]
       [--scenes DIR] [--out models/]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_60", action="store_true")
    ap.add_argument("--deep", action="store_true", help="VDSen2 (32x256)")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--scenes", default="/root/reference/data")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "models"))
    ap.add_argument("--n-crops", type=int, default=None)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--augment", action="store_true",
                    help="dihedral flip/rot90 augmentation (the paper's protocol)")
    ap.add_argument("--finetune", action="store_true",
                    help="warm-start from the currently installed weights")
    ap.add_argument("--lr", type=float, default=None,
                    help="override the reference learning rate")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dsen2_tpu.core.bands import SCALE
    from dsen2_tpu.core.config import TrainConfig, dsen2_2x, dsen2_6x
    from dsen2_tpu.data.mat import read_scene
    from dsen2_tpu.data.patches_dataset import (
        make_val_index,
        open_data_files,
        save_random_patches,
        save_random_patches60,
    )
    from dsen2_tpu.ops.resize import wald_downsample
    from dsen2_tpu.train.loop import fit
    from dsen2_tpu.weights import reference_weight_filename

    scenes = sorted(glob.glob(os.path.join(args.scenes, "*.mat")))
    if not scenes:
        print("no scenes found", file=sys.stderr)
        return 1

    def wald(img, f):
        return np.asarray(wald_downsample(jnp.asarray(img, jnp.float32), f))

    work = tempfile.mkdtemp(prefix="dsen2_train_")
    sub = "train60" if args.run_60 else "train"
    n_default = 500 if args.run_60 else 8000
    n_crops = args.n_crops or n_default
    total = 0
    for i, path in enumerate(scenes):
        s = read_scene(path)
        im10, im20 = s["im10"], s["im20"]
        im60 = s.get("im60")
        name = os.path.splitext(os.path.basename(path))[0] + ".SAFE"
        out_dir = os.path.join(work, sub, name)
        if args.run_60:
            if im60 is None:
                continue
            h36 = im10.shape[0] // 36 * 36
            w36 = im10.shape[1] // 36 * 36
            im10, im20, im60 = (
                im10[:h36, :w36], im20[: h36 // 2, : w36 // 2], im60[: h36 // 6, : w36 // 6]
            )
            d60_lr = wald(im60, 6)
            # Small demo scenes: shrink the crop so positions exist (the
            # network is fully convolutional; the reference's 16 assumes
            # full 1830x1830 60m rasters).
            patch_60 = 16 if min(d60_lr.shape[:2]) > 24 else 8
            save_random_patches60(
                im60, wald(im10, 6), wald(im20, 6), d60_lr, out_dir,
                n_crops=n_crops, seed=i, patch_60=patch_60,
            )
        else:
            save_random_patches(
                im20, wald(im10, 2), wald(im20, 2), out_dir, n_crops=n_crops, seed=i
            )
        total += n_crops
        print(f"built {n_crops} crops from {name}")

    np.save(os.path.join(work, sub, "val_index.npy"), make_val_index(total, 0.1, seed=0))
    tr_in, tr_lb, va_in, va_lb = open_data_files(work, args.run_60, SCALE)
    print(f"train {tr_lb.shape[0]} / val {va_lb.shape[0]} patches")

    cfg = (dsen2_6x if args.run_60 else dsen2_2x)(args.deep)
    fname = reference_weight_filename(args.run_60, args.deep)
    model_nr = fname[:7]
    # match the reference filenames: only the non-deep 6x file is lr 1e-5
    lr = args.lr or (1e-5 if (args.run_60 and not args.deep) else 1e-4)
    # Checkpoints must only be written when the run genuinely beats the
    # currently installed weights (whether warm-starting or training from
    # scratch), so seed best_val with their measured val loss. When no
    # trained file is installed, default_params falls back to random init
    # (with its UNTRAINED warning) and the guard is effectively open.
    from dsen2_tpu.models import s2net
    from dsen2_tpu.train.losses import mae
    from dsen2_tpu.weights import default_params

    installed_params = default_params(cfg, args.run_60, args.deep)
    ev = jax.jit(lambda p, xs, y: mae(
        s2net.apply(p, xs, cfg, remat=args.deep), y))
    losses, nb = [], max(1, va_lb.shape[0] // args.batch)
    for bi in range(nb):
        sl = slice(bi * args.batch, None if bi == nb - 1 else (bi + 1) * args.batch)
        n = va_lb[sl].shape[0]
        losses.append(float(ev(installed_params, tuple(jnp.asarray(v[sl]) for v in va_in),
                               jnp.asarray(va_lb[sl]))) * n)
    best_val = sum(losses) / va_lb.shape[0]
    init_params = None
    if args.finetune:
        init_params = installed_params
        print(f"warm-starting from installed {fname} (val MAE {best_val:.4e})")
    else:
        print(f"installed {fname} val MAE {best_val:.4e}; "
              "will only install an improvement")
    tcfg = TrainConfig(
        lr=lr, batch_size=args.batch, model_nr=model_nr, out_dir=work,
        augment=args.augment,
    )
    state, hist = fit(
        cfg, tcfg, tr_in, tr_lb, va_in, va_lb, params=init_params,
        epochs=args.epochs, stage_data=True, verbose=True, remat=args.deep,
        best_val=best_val,
    )

    base = os.path.join(work, f"{model_nr}lr_{lr:.0e}")
    os.makedirs(args.out, exist_ok=True)
    installed = 0
    for ext in (".hdf5", ".npz"):
        src = base + ext
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.out, fname.replace(".hdf5", ext)))
            installed += 1
    run_best = min(hist["val_loss"]) if hist["val_loss"] else float("inf")
    if installed:
        print(f"installed {fname} (best val {run_best:.4e}) -> {args.out}")
    else:
        print(f"no improvement over installed weights "
              f"(run best {run_best:.4e} vs {best_val:.4e}); nothing installed")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
