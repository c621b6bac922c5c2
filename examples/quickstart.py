"""Quickstart: super-resolve a Sentinel-2 demo scene and report accuracy.

Equivalent flow to the reference's Colab notebook / demo script
(Running_Demo_in_the_colab.ipynb -> testing/demoDSen2.py): load a scene,
run the 2x and 6x networks, compare with the bicubic baseline.

    python examples/quickstart.py [scene.mat]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

import dsen2_tpu  # noqa: E402
from dsen2_tpu.cli.demo import rmse  # noqa: E402
from dsen2_tpu.data.mat import read_scene  # noqa: E402
from dsen2_tpu.ops.resize import matlab_imresize, wald_downsample  # noqa: E402


def main() -> int:
    scene_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/data/S2A_MSIL1C_20170527_T33UUB.mat"
    )
    scene = read_scene(scene_path)
    im10, im20 = scene["im10"], scene["im20"]
    print(f"scene: {os.path.basename(scene_path)}  im10 {im10.shape}  im20 {im20.shape}")

    # Straight super-resolution of the real scene:
    sr20 = dsen2_tpu.dsen2_20(im10, im20)
    print(f"SR20: {sr20.shape} range [{sr20.min():.0f}, {sr20.max():.0f}]")

    # Accuracy via the Wald protocol: downsample, super-resolve the
    # simulation, score against the original as ground truth.
    d10_lr = np.asarray(wald_downsample(jnp.asarray(im10), 2))
    d20_lr = np.asarray(wald_downsample(jnp.asarray(im20), 2))
    sim = dsen2_tpu.dsen2_20(d10_lr, d20_lr)
    bic = np.asarray(matlab_imresize(jnp.asarray(d20_lr), im20.shape[:2]))
    print("DSen2 vs simulated GT: ", end="")
    r1 = rmse(sim, im20)
    print("bicubic vs simulated GT: ", end="")
    r2 = rmse(bic, im20)
    print(f"improvement over bicubic: {r2 / max(r1, 1e-9):.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
