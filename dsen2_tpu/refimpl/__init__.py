"""Pure-numpy golden oracles pinning the reference semantics (used by tests)."""

from dsen2_tpu.refimpl.model_np import apply_np, conv3x3_same_np
from dsen2_tpu.refimpl.patches_np import (
    get_test_patches60_np,
    get_test_patches_np,
    recompose_images_np,
)
from dsen2_tpu.refimpl.resize_np import (
    interp_patches_np,
    matlab_imresize_np,
    resize_bilinear_np,
    wald_downsample_np,
)

__all__ = [
    "apply_np",
    "conv3x3_same_np",
    "get_test_patches_np",
    "get_test_patches60_np",
    "recompose_images_np",
    "interp_patches_np",
    "matlab_imresize_np",
    "resize_bilinear_np",
    "wald_downsample_np",
]
