"""Pure-numpy oracle of the reference's patch pipeline (NHWC convention).

Faithful reimplementations of get_test_patches / get_test_patches60 /
recompose_images (reference: utils/patches.py:19-156, :374-405) used as the
golden baseline for the jit/TPU tiling ops. Unlike the reference these stay
channels-last; channel order is untouched so values are directly comparable.
"""

from __future__ import annotations

import numpy as np

from dsen2_tpu.ops.tiling import PatchGrid
from dsen2_tpu.refimpl.resize_np import interp_patches_np


def _extract_np(img: np.ndarray, grid: PatchGrid) -> np.ndarray:
    b, p = grid.border, grid.patch
    padded = np.pad(img, ((b, b), (b, b), (0, 0)), mode="symmetric")
    out = np.zeros((grid.num_patches, p, p, img.shape[-1]), dtype=np.float32)
    k = 0
    for i in grid.starts_i:
        for j in grid.starts_j:
            out[k] = padded[i : i + p, j : j + p, :]
            k += 1
    return out


def get_test_patches_np(d10: np.ndarray, d20: np.ndarray, patch_size: int = 128,
                        border: int = 4, interp: bool = True):
    """Oracle for utils/patches.py:19-80 (2x path). d10 [H,W,4], d20 [H/2,W/2,6].
    Returns (p10 [N,P,P,4], p20 [N,P,P,6] bilinearly upsampled) float32,
    WITHOUT the reference's zero slack slots (its recompose never reads them)."""
    grid_lr = PatchGrid(d20.shape[0], d20.shape[1], patch_size // 2, border // 2)
    grid_hr = grid_lr.scaled(2)
    p10 = _extract_np(d10.astype(np.float32), grid_hr)
    p20 = _extract_np(d20.astype(np.float32), grid_lr)
    if interp:
        p20 = interp_patches_np(p20, (patch_size, patch_size))
    return p10, p20


def get_test_patches60_np(d10: np.ndarray, d20: np.ndarray, d60: np.ndarray,
                          patch_size: int = 192, border: int = 12, interp: bool = True):
    """Oracle for utils/patches.py:83-156 (6x path): the grid lives on the
    60 m raster; 20 m / 10 m crops are the x3 / x6 scalings of it."""
    grid60 = PatchGrid(d60.shape[0], d60.shape[1], patch_size // 6, border // 6)
    p10 = _extract_np(d10.astype(np.float32), grid60.scaled(6))
    p20 = _extract_np(d20.astype(np.float32), grid60.scaled(3))
    p60 = _extract_np(d60.astype(np.float32), grid60)
    if interp:
        p20 = interp_patches_np(p20, (patch_size, patch_size))
        p60 = interp_patches_np(p60, (patch_size, patch_size))
    return p10, p20, p60


def recompose_images_np(patches: np.ndarray, border: int, out_hw) -> np.ndarray:
    """Oracle for utils/patches.py:374-405, NHWC. patches [N,P,P,C]; extra
    trailing (slack) patches are ignored; overlapping writes resolve
    last-write-wins in y-outer/x-inner order.

    Single-patch quirk: the reference short-circuits on n == 1 and returns
    the patch UNCROPPED regardless of border/size (utils/patches.py:375-376)
    — the mirrored border is not removed. The oracle mirrors that exactly;
    the device op (ops.tiling.recompose) deliberately keeps correct
    crop-and-mosaic semantics instead (its n==1 shortcut requires border 0
    and an exact-cover patch)."""
    n, p, _, c = patches.shape
    if n == 1:
        return patches[0]
    s = p - 2 * border
    h, w = int(out_hw[0]), int(out_hw[1])
    ny = -(-h // s)
    nx = -(-w // s)
    img = np.zeros((h, w, c), dtype=np.float32)
    k = 0
    for y in range(ny):
        yp = min(y * s, h - s)
        for x in range(nx):
            xp = min(x * s, w - s)
            img[yp : yp + s, xp : xp + s, :] = patches[k, border : p - border, border : p - border, :]
            k += 1
    return img
