"""Patch extraction / recompose parity: device ops vs the numpy oracle,
including edge-flush duplicate patches and round-trip identity."""

import numpy as np
import pytest

import jax.numpy as jnp

from dsen2_tpu.ops.tiling import PatchGrid, extract_patches, recompose
from dsen2_tpu.refimpl.patches_np import (
    get_test_patches_np,
    get_test_patches60_np,
    recompose_images_np,
)


class TestPatchGrid:
    def test_exact_division(self):
        # 20m raster 300x300, patch 64, border 4 -> stride 56; 300 % 56 != 0
        g = PatchGrid(300, 300, 64, 4)
        assert g.stride == 56
        assert g.starts_i == tuple(range(0, 280, 56)) + (300 + 8 - 64,)
        assert g.num_patches == 36

    def test_divisible_no_flush(self):
        g = PatchGrid(112, 112, 64, 4)
        assert g.starts_i == (0, 56)
        assert g.num_patches == 4
        assert g.slack_patches == 9 - 4

    def test_scaled(self):
        g = PatchGrid(100, 100, 32, 2)
        g6 = g.scaled(6)
        assert (g6.height, g6.patch, g6.border, g6.stride) == (600, 192, 12, 168)


class TestExtractParity:
    def test_2x_against_oracle(self, rng):
        d10 = (rng.random((120, 96, 4)) * 10000).astype(np.float32)
        d20 = (rng.random((60, 48, 6)) * 10000).astype(np.float32)
        want10, want20 = get_test_patches_np(d10, d20, patch_size=64, border=8)

        grid_lr = PatchGrid(60, 48, 32, 4)
        got10 = np.asarray(extract_patches(jnp.asarray(d10), grid_lr.scaled(2)))
        got20_lr = np.asarray(extract_patches(jnp.asarray(d20), grid_lr))
        from dsen2_tpu.ops.resize import upsample_patches

        got20 = np.asarray(upsample_patches(jnp.asarray(got20_lr), (64, 64)))
        np.testing.assert_allclose(got10, want10, rtol=0, atol=0)
        np.testing.assert_allclose(got20, want20, rtol=1e-5, atol=2e-2)

    def test_6x_against_oracle(self, rng):
        d10 = (rng.random((216, 216, 4)) * 10000).astype(np.float32)
        d20 = (rng.random((108, 108, 6)) * 10000).astype(np.float32)
        d60 = (rng.random((36, 36, 2)) * 10000).astype(np.float32)
        want10, want20, want60 = get_test_patches60_np(
            d10, d20, d60, patch_size=96, border=6
        )
        g60 = PatchGrid(36, 36, 16, 1)
        got10 = np.asarray(extract_patches(jnp.asarray(d10), g60.scaled(6)))
        np.testing.assert_array_equal(got10, want10)
        from dsen2_tpu.ops.resize import upsample_patches

        got20 = np.asarray(
            upsample_patches(extract_patches(jnp.asarray(d20), g60.scaled(3)), (96, 96))
        )
        got60 = np.asarray(
            upsample_patches(extract_patches(jnp.asarray(d60), g60), (96, 96))
        )
        np.testing.assert_allclose(got20, want20, rtol=1e-5, atol=2e-2)
        np.testing.assert_allclose(got60, want60, rtol=1e-5, atol=2e-2)


class TestRecompose:
    def test_roundtrip_identity(self, rng):
        """extract -> crop borders -> mosaic must reproduce the image exactly
        (each interior is written from data, borders come from the halo)."""
        img = (rng.random((120, 96, 3)) * 100).astype(np.float32)
        g = PatchGrid(120, 96, 40, 4)
        patches = extract_patches(jnp.asarray(img), g)
        out = np.asarray(recompose(patches, 4, (120, 96)))
        np.testing.assert_array_equal(out, img)

    def test_matches_oracle_with_flush_overlap(self, rng):
        """Non-divisible size -> edge-flush duplicate coverage; device scatter
        must agree with the oracle's last-write-wins order."""
        patches = rng.random((9, 24, 24, 2)).astype(np.float32)
        want = recompose_images_np(patches, 4, (40, 40))
        got = np.asarray(recompose(jnp.asarray(patches), 4, (40, 40)))
        np.testing.assert_array_equal(got, want)

    def test_ignores_slack_patches(self, rng):
        patches = rng.random((4, 16, 16, 1)).astype(np.float32)
        padded = np.concatenate([patches, np.zeros((5, 16, 16, 1), np.float32)])
        want = np.asarray(recompose(jnp.asarray(patches), 0, (32, 32)))
        got = np.asarray(recompose(jnp.asarray(padded), 0, (32, 32)))
        np.testing.assert_array_equal(got, want)

    def test_single_patch_shortcircuit(self, rng):
        p = rng.random((1, 32, 32, 6)).astype(np.float32)
        out = np.asarray(recompose(jnp.asarray(p), 0, (32, 32)))
        np.testing.assert_array_equal(out, p[0])


class TestGridGuards:
    def test_image_smaller_than_interior_raises(self):
        g = PatchGrid(20, 20, 64, 4)  # stride 56 > 20
        with pytest.raises(ValueError):
            g.starts_i
