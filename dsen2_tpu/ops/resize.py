"""On-device resampling: separable weight matrices applied as MXU matmuls.

All functions take/return NHWC (or HWC) jax arrays and are jit-friendly:
shapes are static, the weight matrices are baked in as constants at trace
time (built on host by dsen2_tpu.ops.resize_weights), and the apply is two
einsums that XLA tiles onto the MXU.

Capability map to the reference:
  - interp_patches  -> upsample_patches (utils/patches.py:11-16)
  - imresize        -> matlab_imresize (utils/imresize.py:80-112)
  - downPixelAggr   -> wald_downsample (utils/patches.py:353-371)
  - convertDouble2Byte -> convert_double_to_byte (utils/imresize.py:114-117)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dsen2_tpu.core.bands import INTERP_NORM
from dsen2_tpu.ops import resize_weights as rw

__all__ = [
    "apply_separable",
    "resize_bilinear",
    "upsample_patches",
    "matlab_imresize",
    "wald_downsample",
    "convert_double_to_byte",
]

# Parity-critical resampling runs in full f32 on the MXU.
_PRECISION = jax.lax.Precision.HIGHEST


def apply_separable(img: jax.Array, w_rows: np.ndarray, w_cols: np.ndarray) -> jax.Array:
    """Apply out = W_rows @ img @ W_cols^T over the two spatial axes.

    img: [..., H, W, C]; w_rows: [H', H]; w_cols: [W', W].
    Returns [..., H', W', C] with the dtype of img.
    """
    dtype = img.dtype
    wr = jnp.asarray(w_rows, dtype=dtype)
    wc = jnp.asarray(w_cols, dtype=dtype)
    out = jnp.einsum("ph,...hwc->...pwc", wr, img, precision=_PRECISION)
    out = jnp.einsum("qw,...pwc->...pqc", wc, out, precision=_PRECISION)
    return out


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """skimage-convention bilinear resize (order=1, mode='reflect') of
    [..., H, W, C] to [..., out_h, out_w, C]."""
    h, w = img.shape[-3], img.shape[-2]
    return apply_separable(
        img, rw.bilinear_matrix(h, out_hw[0]), rw.bilinear_matrix(w, out_hw[1])
    )


def upsample_patches(patches_lr: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Per-patch bilinear LR->HR pre-interpolation with the reference's
    /30000 ... *30000 normalisation (utils/patches.py:15), batched over the
    leading patch axis. patches_lr: [N, h, w, C] -> [N, out_h, out_w, C]."""
    norm = jnp.asarray(INTERP_NORM, dtype=patches_lr.dtype)
    return resize_bilinear(patches_lr / norm, out_hw) * norm


def matlab_imresize(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """MATLAB-convention bicubic resize (antialiased when downscaling) of
    [..., H, W, C]. Device equivalent of the reference baseline resizer
    (utils/imresize.py:80-112). Applies rows then columns; for uniform
    scaling the order does not change the linear map."""
    h, w = img.shape[-3], img.shape[-2]
    return apply_separable(
        img, rw.matlab_cubic_matrix(h, out_hw[0]), rw.matlab_cubic_matrix(w, out_hw[1])
    )


def wald_downsample(img: jax.Array, factor: int) -> jax.Array:
    """Wald-protocol simulated-LR generator: Gaussian blur (sigma=1/factor)
    + factor x factor mean pooling (reference: utils/patches.py:353-371).
    img: [..., H, W, C] with H, W divisible by factor."""
    h, w = img.shape[-3], img.shape[-2]
    return apply_separable(
        img, rw.wald_downsample_matrix(h, factor), rw.wald_downsample_matrix(w, factor)
    )


def convert_double_to_byte(img: np.ndarray) -> np.ndarray:
    """[0,1] float image -> rounded uint8 (reference: utils/imresize.py:
    114-117 convertDouble2Byte; host helper — byte conversion is display/IO
    work, not device math)."""
    return np.around(255.0 * np.clip(img, 0.0, 1.0)).astype(np.uint8)
