"""Cross-scene generalization study on the bundled demo scenes.

Trains DSen2 (2x) FROM SCRATCH on one scene's Wald-protocol crops and
evaluates full-scene metrics on the OTHER (held-out) scene, for every
combination of dihedral augmentation (on/off) and inference-time geometric
self-ensembling (on/off). This is the honest counterpart to
models/README.md's same-scene val numbers: a same-scene val split rewards
orientation-specific overfit, while a held-out scene measures the
generalization that the paper's augmentation protocol and self-ensembling
actually target.

Reference anchor: the reference trains on 45 tiles and evaluates on 15
held-out tiles (S2_tiles_training.txt / S2_tiles_testing.txt,
/root/reference/README.md:37-44) — this is the 2-scene analogue feasible
in this snapshot (the training-tile blobs are missing).

Each training run drives scripts/train_demo_weights.py IN-PROCESS with an
isolated weights dir (empty -> random init, improvement guard open), so
the installed framework weights are never touched. In-process is safe —
the weights registry resolves DSEN2_TPU_WEIGHTS_DIR exclusively and keys
its cache on the resolved file's identity (path+mtime+size), so the
eval sees the weights training just installed, not the pre-training
cache entry — and avoids this harness's per-process TPU lease stalls.

Usage:
  python scripts/eval_generalization.py [--epochs N] [--n-crops N]
         [--one-direction] [--report docs/GENERALIZATION.md]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def train_scratch(scene_path: str, weights_dir: str, augment: bool,
                  epochs: int, n_crops: int) -> None:
    """Train DSen2 2x from scratch on ONE scene into weights_dir."""
    import runpy

    scene_dir = tempfile.mkdtemp(prefix="dsen2_gen_scene_")
    os.symlink(scene_path, os.path.join(scene_dir, os.path.basename(scene_path)))
    argv = ["train_demo_weights.py",
            "--scenes", scene_dir, "--out", weights_dir,
            "--epochs", str(epochs), "--n-crops", str(n_crops)]
    if augment:
        argv.append("--augment")
    print("+ (in-process)", " ".join(argv[1:]))
    old_argv, old_env = sys.argv, os.environ.get("DSEN2_TPU_WEIGHTS_DIR")
    os.environ["DSEN2_TPU_WEIGHTS_DIR"] = weights_dir
    sys.argv = argv
    try:
        runpy.run_path(
            os.path.join(REPO, "scripts", "train_demo_weights.py"),
            run_name="__main__",
        )
    except SystemExit as e:
        if e.code not in (0, None):
            raise RuntimeError(f"training failed (rc={e.code})")
    finally:
        sys.argv = old_argv
        if old_env is None:
            os.environ.pop("DSEN2_TPU_WEIGHTS_DIR", None)
        else:
            os.environ["DSEN2_TPU_WEIGHTS_DIR"] = old_env


def eval_heldout(scene_path: str, weights_dir: str) -> dict:
    """Wald-simulate the held-out scene, super-resolve with the weights in
    weights_dir (plain and self-ensembled), return the metric rows."""
    import jax.numpy as jnp

    from dsen2_tpu.core.config import dsen2_2x
    from dsen2_tpu.data.mat import read_scene
    from dsen2_tpu.infer.api import dsen2_20
    from dsen2_tpu.infer.metrics import ergas, rmse, sam_deg, sre_db, uiq
    from dsen2_tpu.ops.resize import matlab_imresize, wald_downsample
    from dsen2_tpu.weights import default_params

    os.environ["DSEN2_TPU_WEIGHTS_DIR"] = weights_dir
    params = default_params(dsen2_2x(False), run_60=False, deep=False)
    s = read_scene(scene_path)
    im10, im20 = s["im10"], s["im20"]
    d10_lr = np.asarray(wald_downsample(jnp.asarray(im10), 2))
    d20_lr = np.asarray(wald_downsample(jnp.asarray(im20), 2))
    bic = np.asarray(matlab_imresize(jnp.asarray(d20_lr), im20.shape[:2]))

    def row(sr):
        return {"rmse": rmse(sr, im20), "sre": sre_db(sr, im20),
                "sam": sam_deg(sr, im20), "ergas": ergas(sr, im20, 2),
                "uiq": uiq(sr, im20)}

    out = {"bicubic": row(bic)}
    out["plain"] = row(dsen2_20(d10_lr, d20_lr, params=params))
    out["ensemble"] = row(dsen2_20(d10_lr, d20_lr, params=params, ensemble=True))
    return out


def fmt_table(direction: str, rows: dict) -> str:
    lines = [f"### train {direction}", "",
             "| config | RMSE | SRE dB | SAM deg | ERGAS | UIQ |",
             "|---|---|---|---|---|---|"]
    for name, r in rows.items():
        lines.append(f"| {name} | {r['rmse']:.2f} | {r['sre']:.2f} | "
                     f"{r['sam']:.3f} | {r['ergas']:.3f} | {r['uiq']:.4f} |")
    return "\n".join(lines) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--n-crops", type=int, default=8000)
    ap.add_argument("--scenes", default="/root/reference/data")
    ap.add_argument("--one-direction", action="store_true",
                    help="only train on the first scene / eval on the second")
    ap.add_argument("--report", default=None,
                    help="append the markdown tables to this file")
    args = ap.parse_args()

    scenes = sorted(glob.glob(os.path.join(args.scenes, "*.mat")))
    if len(scenes) < 2:
        print("need two scenes", file=sys.stderr)
        return 1
    pairs = [(scenes[0], scenes[1])]
    if not args.one_direction:
        pairs.append((scenes[1], scenes[0]))

    report = []
    for train_scene, eval_scene in pairs:
        tn = os.path.splitext(os.path.basename(train_scene))[0].split("_")[-1]
        en = os.path.splitext(os.path.basename(eval_scene))[0].split("_")[-1]
        rows = {}
        for augment in (False, True):
            wdir = tempfile.mkdtemp(prefix=f"dsen2_gen_w_{tn}_aug{int(augment)}_")
            train_scratch(train_scene, wdir, augment, args.epochs, args.n_crops)
            r = eval_heldout(eval_scene, wdir)
            rows.setdefault("bicubic", r["bicubic"])
            tag = "augmented" if augment else "unaugmented"
            rows[f"{tag}"] = r["plain"]
            rows[f"{tag} + ensemble"] = r["ensemble"]
        table = fmt_table(f"{tn} -> eval {en} (held out)", rows)
        print("\n" + table)
        report.append(table)

    if args.report:
        with open(args.report, "a") as f:
            f.write("\n".join(report))
        print(f"appended to {args.report}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
