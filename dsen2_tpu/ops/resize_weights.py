"""Separable resampling expressed as dense weight matrices (the TPU-native design).

Every resampling operation in the reference stack is a separable linear map:

  - per-patch bilinear LR->HR pre-interpolation
    (reference behavior: utils/patches.py:11-16 via skimage.transform.resize,
    order=1, mode='reflect', no anti-aliasing since it always upsamples)
  - the MATLAB-convention bicubic `imresize` used as the demo baseline
    (reference behavior: utils/imresize.py:20-48, itself the published
    fatheral/matlab_imresize algorithm)
  - the Wald-protocol downsampler: Gaussian blur (scipy.ndimage.gaussian_filter,
    sigma=1/scale, mode='reflect') followed by scale x scale average pooling
    (reference behavior: utils/patches.py:353-371)

Instead of translating those scalar loops, we build a dense [out, in] weight
matrix ONCE per (in_size, out_size) pair on host with numpy (exact reference
math — this module IS the parity spec, exercised by both the numpy oracle in
dsen2_tpu.refimpl and the on-device path in dsen2_tpu.ops.resize), and apply it
on device as two matrix multiplies:

    out[o1, o2] = sum_{i1, i2} W_rows[o1, i1] * img[i1, i2] * W_cols[o2, i2]

which maps straight onto the TPU MXU with static shapes, batches over patches
and bands, and lets XLA fuse the surrounding elementwise work.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "bilinear_matrix",
    "matlab_cubic_matrix",
    "gaussian_blur_matrix",
    "block_mean_matrix",
    "wald_downsample_matrix",
]


def _fold_mirror(pos: np.ndarray, n: int) -> np.ndarray:
    """Fold continuous coordinates into [0, n-1] by mirror reflection about
    the first/last sample positions (ndimage 'mirror' == np.pad 'reflect').

    Matches scipy.ndimage.map_coordinates(mode='mirror'), which skimage's
    resize(mode='reflect') lowers to.
    """
    if n == 1:
        return np.zeros_like(pos)
    period = 2.0 * (n - 1)
    pos = np.mod(pos, period)
    return np.where(pos > n - 1, period - pos, pos)


def _fold_symmetric_index(idx: np.ndarray, n: int) -> np.ndarray:
    """Fold integer indices into [0, n-1] with symmetric (edge-repeating)
    reflection (np.pad 'symmetric' == ndimage 'reflect'). Used by the Gaussian
    blur boundary (scipy gaussian_filter default mode) and by MATLAB imresize's
    mirrored index table (reference: utils/imresize.py:43-44)."""
    period = 2 * n
    idx = np.mod(idx, period)
    return np.where(idx >= n, period - 1 - idx, idx)


@functools.lru_cache(maxsize=None)
def bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] matrix reproducing skimage.transform.resize
    (order=1 linear, mode='reflect', centered pixel convention, no AA).

    Output sample o reads input coordinate (o + 0.5) * in/out - 0.5, folded by
    mirror reflection, then linearly interpolated. This is the exact map the
    reference's per-patch LR->HR pre-interpolation applies
    (utils/patches.py:15)."""
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = _fold_mirror(src, in_size)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, max(in_size - 2, 0))
    frac = src - i0
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    np.add.at(w, (rows, i0), 1.0 - frac)
    np.add.at(w, (rows, i0 + 1), frac)
    return w


def _matlab_cubic_kernel(x: np.ndarray) -> np.ndarray:
    """MATLAB's bicubic kernel (Keys/Catmull-Rom with a = -0.5).

    Same piecewise cubic the reference's baseline uses
    (utils/imresize.py:20-26)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = 1.5 * ax3 - 2.5 * ax2 + 1.0
    outer = -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0
    return np.where(ax <= 1.0, inner, np.where(ax <= 2.0, outer, 0.0))


@functools.lru_cache(maxsize=None)
def matlab_cubic_matrix(in_size: int, out_size: int, scale: float = 0.0) -> np.ndarray:
    """[out_size, in_size] matrix reproducing MATLAB-convention bicubic resize
    along one axis, including the antialiased (widened) kernel when
    downscaling and the symmetric boundary fold.

    Semantics match the reference baseline resizer (utils/imresize.py:28-48):
    output sample o (1-based u = (o+1)/scale + 0.5*(1 - 1/scale)) gathers from
    a support window of the (possibly scale-widened) cubic kernel, with
    weights renormalised to sum 1 and out-of-range taps folded symmetrically.

    `scale` pins the MATLAB scalar-scale semantics where out = ceil(scale*in)
    but the kernel math uses the REQUESTED scale (matters for antialiased
    downscales of non-divisible sizes); 0.0 derives it as out/in
    (MATLAB's output_shape mode)."""
    if not scale:
        scale = out_size / in_size
    support = 4.0
    if scale < 1.0:
        # Antialias: stretch the kernel by 1/scale and scale its amplitude.
        kernel_width = support / scale
        kernel = lambda x: scale * _matlab_cubic_kernel(scale * np.asarray(x))
    else:
        kernel_width = support
        kernel = _matlab_cubic_kernel

    u = (np.arange(1, out_size + 1, dtype=np.float64)) / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    ntaps = int(np.ceil(kernel_width)) + 2
    taps = left[:, None] + np.arange(ntaps)[None, :] - 1.0  # 0-based tap index
    weights = kernel(u[:, None] - taps - 1.0)
    weights = weights / weights.sum(axis=1, keepdims=True)
    idx = _fold_symmetric_index(taps.astype(np.int64), in_size)

    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.repeat(np.arange(out_size), ntaps)
    np.add.at(w, (rows, idx.ravel()), weights.ravel())
    return w


@functools.lru_cache(maxsize=None)
def gaussian_blur_matrix(size: int, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """[size, size] matrix reproducing scipy.ndimage.gaussian_filter along one
    axis (default mode='reflect' i.e. symmetric edge-repeating boundary).

    This is the blur stage of the Wald-protocol downsampler
    (reference: utils/patches.py:363 with sigma = 1/scale)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    taps = np.exp(-0.5 * (x / sigma) ** 2)
    taps /= taps.sum()
    w = np.zeros((size, size), dtype=np.float64)
    rows = np.arange(size)
    for k, tap in zip(range(-radius, radius + 1), taps):
        idx = _fold_symmetric_index(rows + k, size)
        np.add.at(w, (rows, idx), tap)
    return w


@functools.lru_cache(maxsize=None)
def block_mean_matrix(in_size: int, factor: int) -> np.ndarray:
    """[in_size//factor, in_size] matrix for factor-sized average pooling
    (skimage.measure.block_reduce with np.mean; reference utils/patches.py:369).

    Requires in_size % factor == 0 — the reference guarantees this by snapping
    ROIs to 6/36-pixel boundaries."""
    if in_size % factor:
        raise ValueError(f"block_mean_matrix: {in_size} not divisible by {factor}")
    out_size = in_size // factor
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        w[o, o * factor : (o + 1) * factor] = 1.0 / factor
    return w


@functools.lru_cache(maxsize=None)
def wald_downsample_matrix(in_size: int, factor: int) -> np.ndarray:
    """[in_size//factor, in_size] matrix: Gaussian blur (sigma=1/factor) then
    factor x factor mean pooling — one axis of the Wald-protocol simulated-LR
    generator (reference: utils/patches.py:353-371)."""
    return block_mean_matrix(in_size, factor) @ gaussian_blur_matrix(in_size, 1.0 / factor)
