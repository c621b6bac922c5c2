"""Data pipeline tests: reference-format patch archives round-trip, val
split, and the SAFE-reader pure logic (ROI snap, UTM selection, band
validation) without GDAL."""

import json
import os

import numpy as np
import pytest

from dsen2_tpu.data.patches_dataset import (
    interp_patches_host,
    make_val_index,
    open_data_files,
    open_data_files_test,
    save_random_patches,
    save_random_patches60,
    save_test_patches,
    save_test_patches60,
)
from dsen2_tpu.data.safe_reader import (
    Roi,
    SubdatasetInfo,
    band_short_name,
    classify_subdatasets,
    select_utm,
    snap_roi_to_grid,
    validate_bands,
    validate_description,
)
from dsen2_tpu.refimpl.resize_np import interp_patches_np


class TestInterpHost:
    def test_matches_oracle(self, rng):
        patches = (rng.random((7, 16, 16, 6)) * 10000).astype(np.float32)
        want = interp_patches_np(patches, (32, 32))
        got = interp_patches_host(patches, (32, 32))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-2)


class TestArchives:
    @pytest.fixture()
    def tile(self, rng):
        d10 = (rng.random((120, 120, 4)) * 10000).astype(np.float32)
        d20 = (rng.random((60, 60, 6)) * 10000).astype(np.float32)
        d60 = (rng.random((20, 20, 2)) * 10000).astype(np.float32)
        return d10, d20, d60

    def test_random_patches_format(self, tile, tmp_path):
        d10, d20, _ = tile
        out = tmp_path / "T1.SAFE"
        save_random_patches(d10, d10, d20, str(out), n_crops=50, seed=0)
        a10 = np.load(out / "data10.npy")
        agt = np.load(out / "data20_gt.npy")
        a20 = np.load(out / "data20.npy")
        # reference layout: channel-first [N, C, H, W] float32
        assert a10.shape == (50, 4, 32, 32) and a10.dtype == np.float32
        assert agt.shape == (50, 4, 32, 32)  # gt == d10 here (4 bands)
        assert a20.shape == (50, 6, 32, 32)

    def test_random_patches60_format(self, rng, tmp_path):
        # Wald-consistent shapes: the 60m GT is at 6x the LR grid
        # (reference: utils/patches.py:244-253 crops gt at *6 offsets).
        d60_gt = (rng.random((108, 108, 2)) * 10000).astype(np.float32)
        d10_lr = (rng.random((108, 108, 4)) * 10000).astype(np.float32)
        d20_lr = (rng.random((54, 54, 6)) * 10000).astype(np.float32)
        d60_lr = (rng.random((18, 18, 2)) * 10000).astype(np.float32)
        out = tmp_path / "T1.SAFE"
        save_random_patches60(d60_gt, d10_lr, d20_lr, d60_lr, str(out), n_crops=20, seed=0)
        assert np.load(out / "data10.npy").shape == (20, 4, 96, 96)
        assert np.load(out / "data60_gt.npy").shape == (20, 2, 96, 96)
        assert np.load(out / "data20.npy").shape == (20, 6, 96, 96)
        assert np.load(out / "data60.npy").shape == (20, 2, 96, 96)

    def test_test_patches_include_slack(self, tile, tmp_path):
        d10, d20, _ = tile
        out = tmp_path / "T1.SAFE"
        save_test_patches(d10, d20, str(out), patch_size=64, border=4)
        # grid on 60x60 with patch 32 stride 28: 3 starts (2 + flush) -> 9
        # patches; slack pads to (2+1+... ) reference (k+1)^2 = 9 -> equal here
        a10 = np.load(out / "data10.npy")
        assert a10.shape[0] == 9

    def test_train_load_split_roundtrip(self, tile, tmp_path):
        d10, d20, _ = tile
        for t in ("A", "B"):
            save_random_patches(
                d10, d10, d20, str(tmp_path / "train" / f"{t}.SAFE"), n_crops=30, seed=1
            )
        val = make_val_index(60, 0.1, seed=0)
        np.save(tmp_path / "train" / "val_index.npy", val)
        tr_in, tr_lb, va_in, va_lb = open_data_files(str(tmp_path), False, 2000)
        assert tr_lb.shape[0] + va_lb.shape[0] == 60
        assert va_lb.shape[0] == 6
        assert tr_in[0].shape[1:] == (32, 32, 4)  # NHWC in memory
        assert tr_in[1].shape[1:] == (32, 32, 6)
        assert tr_in[0].max() <= 10000 / 2000 + 1e-6  # scaled

    def test_test_load_roundtrip(self, tile, tmp_path):
        d10, d20, d60 = tile
        out = tmp_path / "test60" / "T1.SAFE"
        save_test_patches60(d10, d20, d60, str(out), patch_size=96, border=6)
        with open(out / "roi.json", "w") as f:
            json.dump([0, 0, 60, 60], f)
        inputs, size = open_data_files_test(str(out), True, 2000)
        assert len(inputs) == 3
        assert inputs[0].shape[1:] == (96, 96, 4)
        assert size == [60, 60]


class TestValIndex:
    def test_fraction_and_determinism(self):
        a = make_val_index(1000, 0.1, seed=3)
        b = make_val_index(1000, 0.1, seed=3)
        assert a.sum() == 100
        np.testing.assert_array_equal(a, b)


class TestSafeReaderLogic:
    def test_snap_roi_6px(self):
        # reference math (s2_tiles_supres.py:130-134): min rounds down to the
        # grid, the EXCLUSIVE end rounds down too — xmax 100 -> 95 (end 96).
        roi = snap_roi_to_grid(7, 10, 100, 200, 10980, 10980, grid=6)
        assert (roi.xmin, roi.ymin) == (6, 6)
        assert (roi.xmax, roi.ymax) == (95, 197)
        assert roi.width % 6 == 0 and roi.height % 6 == 0

    def test_snap_roi_36px_and_order_independence(self):
        a = snap_roi_to_grid(500, 400, 100, 200, 10980, 10980, grid=36)
        b = snap_roi_to_grid(100, 200, 500, 400, 10980, 10980, grid=36)
        assert a == b
        assert a.xmin % 36 == 0 and (a.xmax + 1) % 36 == 0

    def test_snap_clamps_to_raster(self):
        roi = snap_roi_to_grid(-50, -50, 99999, 99999, 120, 120, grid=6)
        assert roi == Roi(0, 0, 119, 119)

    def test_classify(self):
        groups = classify_subdatasets(
            [
                ("a", "Bands with 10m resolution, UTM 33N"),
                ("b", "Bands with 20m resolution, UTM 33N"),
                ("c", "Bands with 60m resolution, UTM 33N"),
                ("d", "TCI preview"),
            ]
        )
        assert [g.name for g in groups["10m"]] == ["a"]
        assert [g.name for g in groups["unknown"]] == ["d"]

    def test_select_utm_largest_coverage(self):
        c33 = (SubdatasetInfo("a", "10m resolution, UTM 33N"), Roi(0, 0, 99, 99))
        c34 = (SubdatasetInfo("b", "10m resolution, UTM 34N"), Roi(0, 0, 9, 9))
        idx, utm, roi, cov = select_utm([c33, c34])
        assert idx == 0 and utm == "UTM 33N"
        assert cov["UTM 34N"] == 100

    def test_select_utm_requested_wins(self):
        c33 = (SubdatasetInfo("a", "10m resolution, UTM 33N"), Roi(0, 0, 99, 99))
        c34 = (SubdatasetInfo("b", "10m resolution, UTM 34N"), Roi(0, 0, 9, 9))
        idx, utm, _, _ = select_utm([c33, c34], requested="UTM 34N")
        assert idx == 1 and utm == "UTM 34N"

    def test_validate_description_wavelength(self):
        assert (
            validate_description("B4, central wavelength 665 nm") == "B4 (665 nm)"
        )

    def test_band_short_name(self):
        assert band_short_name("B8A, central wavelength 865 nm") == "B8A"
        assert band_short_name("B12 (2190 nm)") == "B12"

    def test_validate_bands_order_and_selection(self):
        descs = [
            "B4, central wavelength 665 nm",
            "B3, central wavelength 560 nm",
            "B2, central wavelength 490 nm",
            "B8, central wavelength 842 nm",
        ]
        got = validate_bands(descs, ["B2", "B3", "B4", "B8"])
        # dataset order preserved, all four matched
        assert [b.shortname for b in got] == ["B4", "B3", "B2", "B8"]
        assert [b.index for b in got] == [0, 1, 2, 3]
