from dsen2_tpu.ops.resize import (
    apply_separable,
    matlab_imresize,
    resize_bilinear,
    upsample_patches,
    wald_downsample,
)
from dsen2_tpu.ops.tiling import PatchGrid, extract_patches, recompose

__all__ = [
    "apply_separable",
    "matlab_imresize",
    "resize_bilinear",
    "upsample_patches",
    "wald_downsample",
    "PatchGrid",
    "extract_patches",
    "recompose",
]
