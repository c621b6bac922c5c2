"""Pure-numpy float64 oracle for the DSen2 CNN forward pass.

Pins the exact semantics of the reference model (utils/DSen2Net.py:9-43):
zero-padded SAME 3x3 convolutions, ReLU, 0.1-scaled residual blocks, and the
global residual over the last input. Used to regression-test the JAX/TPU
implementation's numerics (including its precision modes)."""

from __future__ import annotations

from typing import Sequence

import numpy as np


def conv3x3_same_np(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """x: [H,W,Cin], w: [3,3,Cin,Cout] HWIO, b: [Cout]. Zero-padded SAME."""
    h, wd, _ = x.shape
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    out = np.zeros((h, wd, w.shape[-1]), dtype=np.float64)
    for dy in range(3):
        for dx in range(3):
            out += xp[dy : dy + h, dx : dx + wd, :].astype(np.float64) @ w[dy, dx].astype(np.float64)
    return out + b.astype(np.float64)


def apply_np(params, inputs: Sequence[np.ndarray], residual_scale: float = 0.1) -> np.ndarray:
    """Forward one [H,W,C] example (no batch axis) in float64.

    params uses the same pytree layout as dsen2_tpu.models.s2net (blocks
    stacked on a leading layer axis)."""
    x = np.concatenate([np.asarray(a, dtype=np.float64) for a in inputs], axis=-1)
    x = np.maximum(conv3x3_same_np(x, np.asarray(params["head"]["w"]), np.asarray(params["head"]["b"])), 0.0)

    blocks = params["blocks"]
    n_l = np.asarray(blocks["w1"]).shape[0]
    for i in range(n_l):
        t = np.maximum(conv3x3_same_np(x, np.asarray(blocks["w1"][i]), np.asarray(blocks["b1"][i])), 0.0)
        t = conv3x3_same_np(t, np.asarray(blocks["w2"][i]), np.asarray(blocks["b2"][i]))
        x = x + residual_scale * t

    x = conv3x3_same_np(x, np.asarray(params["tail"]["w"]), np.asarray(params["tail"]["b"]))
    return x + np.asarray(inputs[-1], dtype=np.float64)
