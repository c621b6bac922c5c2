"""Native host library vs numpy semantics (pad/extract/recompose), and the
build/fallback machinery."""

import numpy as np
import pytest

from dsen2_tpu.ops.tiling import PatchGrid, recompose_positions
from dsen2_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def _require_toolchain():
    if not native.native_available():
        pytest.skip("no native toolchain; numpy fallbacks already covered elsewhere")


class TestSymmetricPad:
    def test_matches_numpy(self, rng):
        img = rng.random((37, 53, 6)).astype(np.float32)
        for b in (1, 4, 12):
            want = np.pad(img, ((b, b), (b, b), (0, 0)), mode="symmetric")
            got = native.symmetric_pad(img, b)
            np.testing.assert_array_equal(got, want)

    def test_border_larger_than_image(self, rng):
        img = rng.random((3, 3, 2)).astype(np.float32)
        want = np.pad(img, ((4, 4), (4, 4), (0, 0)), mode="symmetric")
        got = native.symmetric_pad(img, 4)
        np.testing.assert_array_equal(got, want)


class TestPadExtract:
    def test_matches_reference_grid(self, rng):
        img = rng.random((120, 96, 4)).astype(np.float32)
        g = PatchGrid(120, 96, 40, 4)
        starts = g.flat_starts()
        padded = np.pad(img, ((4, 4), (4, 4), (0, 0)), mode="symmetric")
        want = np.stack([padded[i : i + 40, j : j + 40] for i, j in starts])
        got = native.pad_extract_host(img, starts, 40, 4)
        np.testing.assert_array_equal(got, want)
        got2 = native.extract_patches_host(padded, starts, 40)
        np.testing.assert_array_equal(got2, want)


class TestRecompose:
    def test_matches_oracle_with_overlap(self, rng):
        from dsen2_tpu.refimpl.patches_np import recompose_images_np

        patches = rng.random((9, 24, 24, 3)).astype(np.float32)
        want = recompose_images_np(patches, 4, (40, 40))
        pos = recompose_positions((40, 40), 16)
        got = native.recompose_host(patches, 4, (40, 40), pos)
        np.testing.assert_array_equal(got, want)

    def test_roundtrip(self, rng):
        img = rng.random((112, 112, 6)).astype(np.float32)
        g = PatchGrid(112, 112, 40, 4)
        patches = native.pad_extract_host(img, g.flat_starts(), 40, 4)
        pos = recompose_positions((112, 112), 32)
        out = native.recompose_host(patches, 4, (112, 112), pos)
        np.testing.assert_array_equal(out, img)
