"""GDAL-free SAFE ingestion (data/safe_pil.py) against a REAL on-disk
synthetic product (tests/safe_product.py: actual JP2 files + MTD_TL.xml),
through the shared read_safe pipeline and the production CLI end to end —
the workflow the reference runs via GDAL (s2_tiles_supres.py:97-421),
executed here with zero GDAL."""

import numpy as np
import pytest

from dsen2_tpu.data import safe_pil
from dsen2_tpu.data.safe_reader import read_safe, scan_utm_zones
from safe_product import build_safe


pytestmark = pytest.mark.skipif(
    not safe_pil.available(), reason="Pillow lacks JPEG-2000"
)


@pytest.fixture(scope="module")
def product(tmp_path_factory):
    rng = np.random.default_rng(840)  # local: keep the shared stream stable
    root = tmp_path_factory.mktemp("safe")
    mtd, arrays = build_safe(root, rng, h10=360)
    return mtd, arrays


class TestSafePilBackend:
    def test_looks_like_safe(self, product, tmp_path):
        mtd, _ = product
        assert safe_pil.looks_like_safe(mtd)
        import os

        assert safe_pil.looks_like_safe(os.path.dirname(mtd))  # the .SAFE dir
        assert not safe_pil.looks_like_safe(str(tmp_path))

    def test_subdatasets_mirror_gdal_driver(self, product):
        mtd, _ = product
        shim, _ = safe_pil.open_product(mtd)
        subs = shim.Open(mtd).GetSubDatasets()
        descs = [d for _, d in subs]
        assert any("10m resolution" in d and "UTM 33N" in d for d in descs)
        assert any("20m resolution" in d for d in descs)
        assert any("60m resolution" in d for d in descs)
        ds10 = shim.Open(next(n for n, d in subs if "10m" in d))
        # GDAL SENTINEL2-driver order: B4, B3, B2, B8
        got = [ds10.GetRasterBand(i + 1).GetDescription() for i in range(4)]
        assert [g.split(",")[0] for g in got] == ["B4", "B3", "B2", "B8"]
        assert ds10.GetGeoTransform() == (399960.0, 10.0, 0.0, 5000040.0, 0.0, -10.0)
        assert "32633" in ds10.GetProjection()

    def test_read_safe_without_gdal(self, product):
        """read_safe falls back to the Pillow backend (no osgeo in this
        image) and returns byte-exact JP2 plane data in driver order."""
        mtd, arrays = product
        tile = read_safe(mtd, roi_x_y=(0, 0, 239, 239), run_60=True)
        assert tile.data10.shape == (240, 240, 4)
        assert tile.data20.shape == (120, 120, 6)
        assert tile.data60.shape == (40, 40, 2)  # B10 excluded
        assert tile.data10.dtype == np.uint16
        # band order + exact pixel parity vs the arrays written to JP2
        for i, b in enumerate(["B4", "B3", "B2", "B8"]):
            np.testing.assert_array_equal(
                tile.data10[:, :, i], arrays[b][:240, :240]
            )
        for i, b in enumerate(["B5", "B6", "B7", "B8A", "B11", "B12"]):
            np.testing.assert_array_equal(
                tile.data20[:, :, i], arrays[b][:120, :120]
            )
        for i, b in enumerate(["B1", "B9"]):
            np.testing.assert_array_equal(
                tile.data60[:, :, i], arrays[b][:40, :40]
            )
        assert tile.utm == "UTM 33N"
        assert tile.geotransform == (399960.0, 10.0, 0.0, 5000040.0, 0.0, -10.0)

    def test_roi_snapping_applied(self, product):
        mtd, _ = product
        tile = read_safe(mtd, roi_x_y=(5, 7, 130, 100))
        # snapped outward to 6-px boundaries on the 10m grid
        assert tile.roi.xmin % 6 == 0 and tile.roi.ymin % 6 == 0
        assert (tile.roi.xmax + 1) % 6 == 0 and (tile.roi.ymax + 1) % 6 == 0
        assert tile.data10.shape[0] % 6 == 0

    def test_scan_utm_zones(self, product):
        mtd, _ = product
        cov = scan_utm_zones(mtd)
        assert cov == {"UTM 33N": 360 * 360}

    def test_lonlat_roi_without_osr(self, product):
        """lon/lat ROIs project through the built-in UTM transverse
        Mercator (geo/utm.py) when OSR is absent: the selected ROI must
        equal the pixel-ROI selection of the same corners."""
        from dsen2_tpu.geo.utm import utm_inverse

        mtd, _ = product
        ulx, uly = 399960.0, 5000040.0
        # pixel corners (12, 12) and (131, 101) on the 10 m grid -> UTM
        # metres -> WGS84 lon/lat (zone 33N)
        # half-pixel offsets: exact pixel-corner metres truncate
        # unstably through int() (same semantics as the reference's OSR
        # path, s2_tiles_supres.py:161-166)
        lon1, lat1 = utm_inverse(ulx + 12.5 * 10, uly - 12.5 * 10, 33, True)
        lon2, lat2 = utm_inverse(ulx + 131.5 * 10, uly - 101.5 * 10, 33, True)
        got = read_safe(mtd, roi_lon_lat=(lon1, lat1, lon2, lat2))
        want = read_safe(mtd, roi_x_y=(12, 12, 131, 101))
        assert got.roi == want.roi
        np.testing.assert_array_equal(got.data10, want.data10)


class TestMultiZoneProduct:
    @pytest.fixture(scope="class")
    def two_zone(self, tmp_path_factory):
        """An (older-style) multi-granule product spanning TWO UTM zones,
        with different tile sizes so coverage-based selection has a
        winner."""
        from safe_product import add_granule, build_safe

        rng = np.random.default_rng(841)  # local: keep the shared stream stable
        root = tmp_path_factory.mktemp("safe2")
        mtd, arr33 = build_safe(root, rng, h10=360, epsg=32633, tile="T33UUB")
        import os

        safe = os.path.dirname(mtd)
        arr34 = add_granule(safe, rng, h10=120, epsg=32634, tile="T34VCH",
                            ulx=300000.0, uly=6200040.0,
                            stamp="20170527T101032")
        return mtd, arr33, arr34

    def test_coverage_selection(self, two_zone):
        """Unrequested: the zone whose dataset covers the larger ROI wins
        (s2_tiles_supres.py:115-190 semantics), here zone 33 (360^2 vs
        120^2)."""
        mtd, arr33, _ = two_zone
        cov = scan_utm_zones(mtd)
        assert cov == {"UTM 33N": 360 * 360, "UTM 34N": 120 * 120}
        tile = read_safe(mtd)
        assert tile.utm == "UTM 33N"
        np.testing.assert_array_equal(tile.data10[:, :, 0], arr33["B4"])

    def test_select_utm_zone(self, two_zone):
        """--select_UTM must override coverage and pick the smaller zone,
        with ALL resolutions coming from that zone's granule."""
        mtd, _, arr34 = two_zone
        tile = read_safe(mtd, select_utm_zone="UTM 34N", run_60=True)
        assert tile.utm == "UTM 34N"
        assert tile.data10.shape == (120, 120, 4)
        np.testing.assert_array_equal(tile.data10[:, :, 0], arr34["B4"])
        np.testing.assert_array_equal(tile.data60[:, :, 0], arr34["B1"][:20, :20])
        assert tile.geotransform[0] == 300000.0


class TestCliEndToEndNoGdal:
    def test_safe_to_geotiff(self, product, tmp_path, monkeypatch):
        """The FULL production workflow with zero GDAL: real SAFE layout
        in (JP2 decode via Pillow) -> SR -> real georeferenced GeoTIFF
        out (pure-Python writer), SR values matching the library API on
        the same arrays."""
        from dsen2_tpu.cli.s2_supres import main
        from dsen2_tpu.core.config import InferConfig
        from dsen2_tpu.infer.api import dsen2_20
        from tiff_reader import read_tiff

        mtd, arrays = product
        monkeypatch.chdir(tmp_path)
        rc = main([mtd, "out.tif", "--roi_x_y", "0,0,239,239"])
        assert rc == 0
        tif = read_tiff(str(tmp_path / "out.tif"))
        assert tif["geokeys"][3072] == 32633
        assert tif["pixel_scale"] == [10.0, 10.0, 0.0]
        assert tif["tiepoint"][3:5] == [399960.0, 5000040.0]
        bands = tif["bands"]
        assert sorted(bands) == sorted(
            f"SR{b} ({wl} nm)"
            for b, wl in (("B5", 705), ("B6", 740), ("B7", 783),
                          ("B8A", 865), ("B11", 1610), ("B12", 2190))
        )
        d10 = np.stack([arrays[b][:240, :240] for b in
                        ("B4", "B3", "B2", "B8")], axis=-1)
        d20 = np.stack([arrays[b][:120, :120] for b in
                        ("B5", "B6", "B7", "B8A", "B11", "B12")], axis=-1)
        want = dsen2_20(d10, d20)
        got = np.stack(
            [bands[k] for k in (
                "SRB5 (705 nm)", "SRB6 (740 nm)", "SRB7 (783 nm)",
                "SRB8A (865 nm)", "SRB11 (1610 nm)", "SRB12 (2190 nm)",
            )],
            axis=-1,
        )
        np.testing.assert_allclose(got, want.astype(np.float64), rtol=0, atol=1e-4)

    def test_create_patches_from_safe(self, product, tmp_path):
        """The dataset-builder CLI ingests the real SAFE layout without
        GDAL too (36-px snap grid), producing the reference-format patch
        archives (create_patches.py:32-316 workflow)."""
        from dsen2_tpu.cli.create_patches import main

        mtd, _ = product
        import os

        safe_dir = os.path.dirname(mtd)  # reference usage: the .SAFE dir
        prefix = str(tmp_path) + "/"
        rc = main([safe_dir, "--roi_x_y", "0,0,215,215", "--test_data",
                   "--save_prefix", prefix])
        assert rc == 0
        import glob
        import json

        tiles = glob.glob(os.path.join(prefix, "test", "*SAFE"))
        assert len(tiles) == 1
        d10 = np.load(os.path.join(tiles[0], "data10.npy"))
        d20 = np.load(os.path.join(tiles[0], "data20.npy"))
        gt = np.load(os.path.join(tiles[0], "no_tiling", "data20_gt.npy"))
        # CHW patch archives on the Wald-downsampled grid (108^2 10m)
        assert d10.ndim == 4 and d10.shape[1] == 4
        assert d20.shape[1] == 6
        assert 6 in (gt.shape[0], gt.shape[-1])  # full-scene GT, 6 bands
        with open(os.path.join(tiles[0], "roi.json")) as f:
            roi = json.load(f)
        # test mode records the Wald-downsampled grid (216 -> 108 at x2),
        # like the reference's simulated-GT protocol
        assert roi[2] - roi[0] == 108 and roi[3] - roi[1] == 108
