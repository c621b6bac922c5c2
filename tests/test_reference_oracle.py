"""Parity against the reference's OWN importable code (round-1 VERDICT item #5).

The reference's utils/imresize.py is pure numpy and utils/patches.py needs
only numpy for the functions exercised here, so we import them directly from
/root/reference and assert exact agreement with our spec
(ops/resize_weights + refimpl + ops.tiling). These tests fail if the
weight-matrix spec ever diverges from the actual reference implementation —
one independence level stronger than hand-derived goldens.

patches.py imports `skimage.transform.resize` at module scope (unavailable
here); the functions under test never call it, so a raising stub satisfies
the import. downPixelAggr additionally calls skimage.measure.block_reduce
with exactly-divisible shapes — stubbed with the unambiguous reshape-mean.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from dsen2_tpu.ops import resize as dresize
from dsen2_tpu.ops import tiling
from dsen2_tpu.refimpl import patches_np, resize_np

REF_UTILS = "/root/reference/utils"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_imresize():
    return _load("ref_imresize", f"{REF_UTILS}/imresize.py")


@pytest.fixture(scope="module")
def ref_patches():
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        transform = types.ModuleType("skimage.transform")

        def _resize(*a, **k):  # pragma: no cover - must never be reached
            raise AssertionError("oracle tests must not call skimage resize")

        transform.resize = _resize
        measure = types.ModuleType("skimage.measure")

        def _block_reduce(img, block, func):
            assert func is np.mean and img.ndim == 2
            h, w = img.shape
            bh, bw = block
            assert h % bh == 0 and w % bw == 0, "reference always divides exactly"
            return img.reshape(h // bh, bh, w // bw, bw).mean(axis=(1, 3))

        measure.block_reduce = _block_reduce
        skimage.transform = transform
        skimage.measure = measure
        sys.modules["skimage"] = skimage
        sys.modules["skimage.transform"] = transform
        sys.modules["skimage.measure"] = measure
    return _load("ref_patches", f"{REF_UTILS}/patches.py")


@pytest.fixture(scope="module")
def rng64():
    return np.random.default_rng(42)


# ---------------------------------------------------------------- imresize

@pytest.mark.parametrize("scale", [2.0, 6.0, 0.5, 1.0 / 6.0, 1.7, 0.37])
def test_matlab_imresize_scalar_scale_exact(ref_imresize, rng64, scale):
    img = rng64.random((36, 30, 3))
    want = ref_imresize.imresize(img, scalar_scale=scale)
    got = resize_np.matlab_imresize_np(img, scale=scale)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


@pytest.mark.parametrize("out_hw", [(72, 60), (25, 17), (13, 49)])
def test_matlab_imresize_output_shape_exact(ref_imresize, rng64, out_hw):
    img = rng64.random((36, 30, 2))
    want = ref_imresize.imresize(img, output_shape=out_hw)
    got = resize_np.matlab_imresize_np(img, out_hw=out_hw)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_matlab_imresize_2d_and_odd_sizes(ref_imresize, rng64):
    img = rng64.random((25, 17))
    want = ref_imresize.imresize(img, scalar_scale=2.0)
    got = resize_np.matlab_imresize_np(img, scale=2.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_device_matlab_imresize_matches_reference(ref_imresize, rng64):
    img = rng64.random((30, 24, 6)).astype(np.float32)
    want = ref_imresize.imresize(img.astype(np.float64), scalar_scale=2.0)
    got = np.asarray(dresize.matlab_imresize(jnp.asarray(img), (60, 48)))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_convert_double_to_byte(ref_imresize, rng64):
    img = rng64.random((16, 16)) * 1.4 - 0.2
    np.testing.assert_array_equal(
        resize_np.convert_double_to_byte_np(img),
        ref_imresize.convertDouble2Byte(img),
    )


# ------------------------------------------------------------- extractors

def _chw_to_nhwc(a: np.ndarray) -> np.ndarray:
    return np.transpose(a, (0, 2, 3, 1))


@pytest.mark.parametrize("hw10", [(64, 64), (72, 56), (70, 66)])
def test_get_test_patches_parity(ref_patches, rng64, hw10):
    # hw10 (70,66): non-exact division -> exercises the flush-to-edge patch.
    d10 = rng64.random(hw10 + (4,)).astype(np.float32)
    d20 = rng64.random((hw10[0] // 2, hw10[1] // 2, 6)).astype(np.float32)
    want10, want20 = ref_patches.get_test_patches(
        d10, d20, patchSize=16, border=4, interp=False
    )
    got10, got20 = patches_np.get_test_patches_np(
        d10, d20, patch_size=16, border=4, interp=False
    )
    n = got10.shape[0]
    np.testing.assert_array_equal(_chw_to_nhwc(want10[:n]), got10)
    np.testing.assert_array_equal(_chw_to_nhwc(want20[:n]), got20)
    # the reference's extra slots are all-zero slack its recompose never reads
    assert not want10[n:].any() and not want20[n:].any()


def test_get_test_patches60_parity(ref_patches, rng64):
    h60, w60 = 30, 24
    d10 = rng64.random((h60 * 6, w60 * 6, 4)).astype(np.float32)
    d20 = rng64.random((h60 * 3, w60 * 3, 6)).astype(np.float32)
    d60 = rng64.random((h60, w60, 2)).astype(np.float32)
    want10, want20, want60 = ref_patches.get_test_patches60(
        d10, d20, d60, patchSize=36, border=6, interp=False
    )
    got10, got20, got60 = patches_np.get_test_patches60_np(
        d10, d20, d60, patch_size=36, border=6, interp=False
    )
    n = got10.shape[0]
    np.testing.assert_array_equal(_chw_to_nhwc(want10[:n]), got10)
    np.testing.assert_array_equal(_chw_to_nhwc(want20[:n]), got20)
    np.testing.assert_array_equal(_chw_to_nhwc(want60[:n]), got60)


def test_device_extract_matches_reference(ref_patches, rng64):
    d10 = rng64.random((72, 56, 4)).astype(np.float32)
    d20 = rng64.random((36, 28, 6)).astype(np.float32)
    want10, _ = ref_patches.get_test_patches(d10, d20, patchSize=16, border=4, interp=False)
    grid = tiling.PatchGrid(36, 28, 8, 2).scaled(2)
    got10 = np.asarray(tiling.extract_patches(jnp.asarray(d10), grid))
    np.testing.assert_array_equal(_chw_to_nhwc(want10[: got10.shape[0]]), got10)


# -------------------------------------------------------------- recompose

@pytest.mark.parametrize("hw", [(64, 64), (70, 70)])
def test_recompose_parity_square(ref_patches, rng64, hw):
    # The reference misassembles non-square ROIs (x/y tile counts swapped vs
    # patch order — fixed in ours, documented in data/patches_dataset.py), so
    # byte parity is asserted on square sizes, where its behavior is correct.
    border, patch = 4, 16
    grid = tiling.PatchGrid(hw[0], hw[1], patch, border)
    n = grid.num_patches
    patches = rng64.random((n, patch, patch, 3)).astype(np.float32)
    ref_in = np.transpose(patches, (0, 3, 1, 2))
    want = ref_patches.recompose_images(ref_in, border, size=hw)
    got = patches_np.recompose_images_np(patches, border, hw)
    np.testing.assert_array_equal(want, got)
    got_dev = np.asarray(tiling.recompose(jnp.asarray(patches), border, hw))
    np.testing.assert_array_equal(want, got_dev)


def test_recompose_single_patch_shortcircuit(ref_patches, rng64):
    patches = rng64.random((1, 16, 16, 3)).astype(np.float32)
    want = ref_patches.recompose_images(np.transpose(patches, (0, 3, 1, 2)), 4, size=(16, 16))
    got = patches_np.recompose_images_np(patches, 4, (16, 16))
    # reference short-circuits: returns the whole patch uncropped
    np.testing.assert_array_equal(want, got)


# ---------------------------------------------------------- downPixelAggr

@pytest.mark.parametrize("scale", [2, 6])
def test_wald_downsample_parity(ref_patches, rng64, scale):
    img = rng64.random((36, 36, 3))
    want = ref_patches.downPixelAggr(img.copy(), SCALE=scale)
    got = resize_np.wald_downsample_np(img, scale)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    got_dev = np.asarray(dresize.wald_downsample(jnp.asarray(img, jnp.float32), scale))
    np.testing.assert_allclose(got_dev, want, rtol=0, atol=2e-5)
