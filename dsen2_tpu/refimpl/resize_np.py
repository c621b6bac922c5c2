"""Pure-numpy golden oracle for the resampling ops.

These functions pin the reference semantics (skimage bilinear resize, MATLAB
bicubic imresize, scipy Gaussian + block-reduce Wald downsampler) as plain
float64 numpy so the JAX/TPU implementations can be regression-tested without
skimage/scipy image deps. They intentionally share the weight builders with
the device path — the builders ARE the spec — but apply them with the same
dtype/rounding behavior the reference exhibits (float32 in interp_patches,
float64 in imresize).
"""

from __future__ import annotations

import numpy as np

from dsen2_tpu.core.bands import INTERP_NORM
from dsen2_tpu.ops import resize_weights as rw


def _apply_separable_np(img: np.ndarray, w_rows: np.ndarray, w_cols: np.ndarray) -> np.ndarray:
    """out = W_rows @ img @ W_cols^T over the two leading spatial axes of
    [H, W] or [H, W, C], computed in float64."""
    out = np.tensordot(w_rows, img.astype(np.float64), axes=(1, 0))
    out = np.tensordot(w_cols, out, axes=(1, 1)).swapaxes(0, 1)
    return out


def resize_bilinear_np(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """skimage.transform.resize(order=1, mode='reflect') oracle for [H,W(,C)]."""
    h, w = img.shape[0], img.shape[1]
    return _apply_separable_np(
        img, rw.bilinear_matrix(h, out_hw[0]), rw.bilinear_matrix(w, out_hw[1])
    )


def interp_patches_np(patches_lr: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Oracle for the reference's per-patch LR->HR bilinear pre-interpolation
    (utils/patches.py:11-16): [N, h, w, C] float32 -> [N, H, W, C] float32,
    including the /30000 ... *30000 normalisation in float32."""
    n, _, _, c = patches_lr.shape
    out = np.zeros((n, out_hw[0], out_hw[1], c), dtype=np.float32)
    for k in range(n):
        scaled = (patches_lr[k] / np.float32(INTERP_NORM)).astype(np.float32)
        res = resize_bilinear_np(scaled, out_hw).astype(np.float32)
        out[k] = res * np.float32(INTERP_NORM)
    return out


def matlab_imresize_np(img: np.ndarray, scale: float | None = None,
                       out_hw: tuple[int, int] | None = None) -> np.ndarray:
    """Oracle for MATLAB-convention bicubic resize (utils/imresize.py:80-112).

    Accepts a scalar scale (output = ceil(scale * in) and the kernel math
    uses the REQUESTED scale, as MATLAB does) or an explicit output shape
    (scale derived as out/in). Returns float64 like the reference."""
    h, w = img.shape[0], img.shape[1]
    if out_hw is None:
        assert scale is not None
        out_hw = (int(np.ceil(scale * h)), int(np.ceil(scale * w)))
        wr = rw.matlab_cubic_matrix(h, out_hw[0], scale)
        wc = rw.matlab_cubic_matrix(w, out_hw[1], scale)
    else:
        wr = rw.matlab_cubic_matrix(h, out_hw[0])
        wc = rw.matlab_cubic_matrix(w, out_hw[1])
    return _apply_separable_np(img, wr, wc)


def convert_double_to_byte_np(img: np.ndarray) -> np.ndarray:
    """Clip to [0,1], scale to [0,255], round to uint8 — the reference's
    display conversion (utils/imresize.py:114-117)."""
    return np.around(255.0 * np.clip(img, 0.0, 1.0)).astype(np.uint8)


def wald_downsample_np(img: np.ndarray, factor: int) -> np.ndarray:
    """Oracle for downPixelAggr (utils/patches.py:353-371): Gaussian blur with
    sigma=1/factor then factor x factor mean pooling, float64."""
    h, w = img.shape[0], img.shape[1]
    return _apply_separable_np(
        img, rw.wald_downsample_matrix(h, factor), rw.wald_downsample_matrix(w, factor)
    )
