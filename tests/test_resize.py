"""Resampling op tests: weight-matrix spec vs scipy ground truth vs device.

The separable weight builders (dsen2_tpu/ops/resize_weights.py) are the
parity spec for the reference's skimage/scipy/MATLAB resampling. scipy IS
available here, so the bilinear + Gaussian parts are validated against real
scipy.ndimage behavior (which skimage lowers to); the MATLAB bicubic part is
validated against analytically derived golden values and invariants.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax

from dsen2_tpu.ops import resize_weights as rw
from dsen2_tpu.ops.resize import (
    matlab_imresize,
    resize_bilinear,
    upsample_patches,
    wald_downsample,
)
from dsen2_tpu.refimpl.resize_np import (
    interp_patches_np,
    matlab_imresize_np,
    resize_bilinear_np,
    wald_downsample_np,
)


class TestBilinearSpec:
    """bilinear_matrix must reproduce skimage.transform.resize(order=1,
    mode='reflect'), i.e. scipy.ndimage.zoom(order=1, mode='mirror',
    grid_mode=True)."""

    @pytest.mark.parametrize("in_size,out_size", [(16, 32), (48, 96), (16, 96), (100, 600), (7, 13)])
    def test_matches_scipy_zoom(self, rng, in_size, out_size):
        img = rng.random((in_size, in_size)).astype(np.float64)
        want = ndi.zoom(
            img, (out_size / in_size, out_size / in_size),
            order=1, mode="mirror", grid_mode=True, prefilter=False,
        )
        got = resize_bilinear_np(img, (out_size, out_size))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_rows_sum_to_one(self):
        for n, m in [(16, 32), (300, 600), (100, 600)]:
            w = rw.bilinear_matrix(n, m)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)

    def test_device_matches_oracle(self, rng):
        img = rng.random((30, 30, 6)).astype(np.float32)
        want = resize_bilinear_np(img, (60, 60))
        got = np.asarray(resize_bilinear(jax.numpy.asarray(img), (60, 60)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_interp_patches_normalisation(self, rng):
        """The reference normalises by 30000 inside the resize
        (utils/patches.py:15); device and oracle must agree."""
        patches = (rng.random((5, 16, 16, 6)) * 10000).astype(np.float32)
        want = interp_patches_np(patches, (32, 32))
        got = np.asarray(upsample_patches(jax.numpy.asarray(patches), (32, 32)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-2)


class TestMatlabBicubicSpec:
    def test_2x_upsample_golden_row(self):
        """Hand-derived first row for scale=2 upsampling: output sample 0 sits
        at source coordinate -0.25; after symmetric folding the taps combine
        to [1.09375, -0.09375, 0, ...] (MATLAB bicubic a=-0.5 kernel)."""
        w = rw.matlab_cubic_matrix(8, 16)
        np.testing.assert_allclose(w[0, 0], 1.09375, atol=1e-12)
        np.testing.assert_allclose(w[0, 1], -0.09375, atol=1e-12)
        np.testing.assert_allclose(w[0, 2:], 0.0, atol=1e-12)
        # interior phase +-0.25 taps: k(1.75), k(0.75), k(0.25), k(1.25)
        np.testing.assert_allclose(
            w[4, 0:4], [-0.0234375, 0.2265625, 0.8671875, -0.0703125], atol=1e-12
        )

    def test_rows_sum_to_one(self):
        for n, m in [(8, 16), (300, 600), (100, 600), (600, 300)]:
            w = rw.matlab_cubic_matrix(n, m)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)

    def test_linear_reproduction_interior(self):
        """Bicubic interpolation reproduces affine signals exactly away from
        the boundary fold."""
        x = np.arange(20, dtype=np.float64)
        up = matlab_imresize_np(np.outer(x, np.ones(20)), scale=2)
        interior = up[4:-4, 4:-4]
        # src coordinate of output o is (o+1)/2 + 0.25 - 1 in 0-based terms
        want = np.outer((np.arange(40) + 1) / 2.0 + 0.25 - 1.0, np.ones(32))[4:-4]
        np.testing.assert_allclose(interior, want, atol=1e-10)

    def test_downscale_antialias_preserves_mean(self, rng):
        """Antialiased downscale by 2: constant images map to themselves and
        the global mean is nearly preserved for smooth signals."""
        w = rw.matlab_cubic_matrix(64, 32)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)
        t = np.linspace(0, 1, 64)
        smooth = np.sin(2 * np.pi * t)[:, None] * np.ones((1, 64))
        down = matlab_imresize_np(smooth, scale=0.5)
        assert down.shape == (32, 32)
        assert abs(down.mean() - smooth.mean()) < 1e-3

    def test_device_matches_oracle(self, rng):
        img = (rng.random((50, 50, 2)) * 10000).astype(np.float32)
        want = matlab_imresize_np(img, scale=6)
        got = np.asarray(matlab_imresize(jax.numpy.asarray(img), (300, 300)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=0.5)


class TestWaldDownsampler:
    """downPixelAggr = scipy gaussian_filter(sigma=1/scale) + block mean
    (reference utils/patches.py:353-371); scipy is available for ground truth."""

    @pytest.mark.parametrize("factor", [2, 6])
    def test_matches_scipy(self, rng, factor):
        img = (rng.random((60, 60, 3)) * 10000).astype(np.float64)
        blurred = np.stack(
            [ndi.gaussian_filter(img[:, :, c], 1.0 / factor) for c in range(3)], axis=-1
        )
        want = blurred.reshape(
            60 // factor, factor, 60 // factor, factor, 3
        ).mean(axis=(1, 3))
        got = wald_downsample_np(img, factor)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-8)

    def test_device_matches_oracle(self, rng):
        img = (rng.random((36, 36, 4)) * 10000).astype(np.float32)
        want = wald_downsample_np(img, 6)
        got = np.asarray(wald_downsample(jax.numpy.asarray(img), 6))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=0.5)

    def test_requires_divisibility(self):
        with pytest.raises(ValueError):
            rw.block_mean_matrix(35, 6)


class TestScalarScaleAntialias:
    def test_scalar_scale_kernel_uses_requested_scale(self):
        """MATLAB scalar-scale mode: out = ceil(scale*in) but the AA kernel
        width uses the REQUESTED scale (13 -> ceil(6.5) = 7 with kernel
        widened by 1/0.5, not by 13/7)."""
        w_scalar = rw.matlab_cubic_matrix(13, 7, 0.5)
        w_shape = rw.matlab_cubic_matrix(13, 7)
        # they must differ (shape mode derives 7/13 != 0.5)...
        assert np.abs(w_scalar - w_shape).max() > 1e-6
        # ...but both remain partitions of unity
        np.testing.assert_allclose(w_scalar.sum(axis=1), 1.0, atol=1e-12)

    def test_divisible_sizes_agree(self):
        np.testing.assert_allclose(
            rw.matlab_cubic_matrix(64, 32, 0.5), rw.matlab_cubic_matrix(64, 32), atol=0
        )


class TestConvertDoubleToByte:
    def test_matches_reference_implementation(self):
        """Direct oracle: the reference's convertDouble2Byte is importable
        numpy (utils/imresize.py:114-117)."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_imresize", "/root/reference/utils/imresize.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        from dsen2_tpu.ops.resize import convert_double_to_byte

        rng = np.random.default_rng(0)
        img = rng.normal(0.5, 0.6, (17, 9, 3))  # includes <0 and >1 values
        np.testing.assert_array_equal(
            convert_double_to_byte(img), ref.convertDouble2Byte(img)
        )
