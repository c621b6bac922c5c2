"""End-to-end drive of the SAFE reader and the full-tile CLI with a fake
GDAL: a synthetic in-memory Sentinel-2 product (3 resolution subdatasets,
band descriptions, geotransform) exercises the reference-parity logic of
read_safe + s2_supres that a real SAFE product would
(s2_tiles_supres.py:97-421 capability), GDAL-free."""

import sys
import types

import numpy as np
import pytest


class FakeBand:
    def __init__(self, desc):
        self._desc = desc

    def GetDescription(self):
        return self._desc


class FakeDataset:
    def __init__(self, arrs, descs, geot):
        self._arrs = arrs  # [C, H, W]
        self._descs = descs
        self._geot = geot
        self.RasterXSize = arrs.shape[2]
        self.RasterYSize = arrs.shape[1]
        self.RasterCount = arrs.shape[0]

    def GetRasterBand(self, i):
        return FakeBand(self._descs[i - 1])

    def GetGeoTransform(self):
        return self._geot

    def GetProjection(self):
        return "PROJCS[WGS 84 / UTM zone 33N]"

    def ReadAsArray(self, xoff, yoff, xsize, ysize, buf_xsize=None, buf_ysize=None):
        return self._arrs[:, yoff : yoff + ysize, xoff : xoff + xsize]

    def GetSubDatasets(self):
        return []


class FakeProduct:
    def __init__(self, subdatasets):
        self._subs = subdatasets

    def GetSubDatasets(self):
        return [(name, desc) for name, (desc, _) in self._subs.items()]


@pytest.fixture()
def fake_gdal(monkeypatch, rng):
    h10 = 360  # 10m grid (large enough for the reference 192/12 6x geometry)
    geot = (399960.0, 10.0, 0.0, 5000040.0, 0.0, -10.0)

    def mk(n_bands, size, descs):
        # uint16: what real GDAL hands back for L1C JP2s — flows through
        # safe_reader unchanged and exercises compact staging end to end
        arrs = (rng.random((n_bands, size, size)) * 8000).astype(np.uint16)
        return FakeDataset(arrs, descs, geot)

    ds10 = mk(4, h10, [
        "B4, central wavelength 665 nm", "B3, central wavelength 560 nm",
        "B2, central wavelength 490 nm", "B8, central wavelength 842 nm",
    ])
    ds20 = mk(6, h10 // 2, [
        "B5, central wavelength 705 nm", "B6, central wavelength 740 nm",
        "B7, central wavelength 783 nm", "B8A, central wavelength 865 nm",
        "B11, central wavelength 1610 nm", "B12, central wavelength 2190 nm",
    ])
    ds60 = mk(3, h10 // 6, [
        "B1, central wavelength 443 nm", "B9, central wavelength 945 nm",
        "B10, central wavelength 1375 nm",
    ])
    subs = {
        "SENTINEL2_L1C:10m:EPSG_32633": ("Bands B2, B3, B4, B8 with 10m resolution, UTM 33N", ds10),
        "SENTINEL2_L1C:20m:EPSG_32633": ("Bands with 20m resolution, UTM 33N", ds20),
        "SENTINEL2_L1C:60m:EPSG_32633": ("Bands with 60m resolution, UTM 33N", ds60),
    }
    product = FakeProduct(subs)

    gdal_mod = types.ModuleType("osgeo.gdal")

    def fake_open(name):
        if name == "FAKE_MTD_MSIL1C.xml":
            return product
        for key, (_, ds) in subs.items():
            if name == key:
                return ds
        return None

    gdal_mod.Open = fake_open
    gdal_mod.DCAP_CREATE = "DCAP_CREATE"
    gdal_mod.DCAP_RASTER = "DCAP_RASTER"
    gdal_mod.GetDriverByName = lambda name: None  # force npz fallback
    gdal_mod.GetDriverCount = lambda: 0

    osgeo_mod = types.ModuleType("osgeo")
    osgeo_mod.gdal = gdal_mod
    monkeypatch.setitem(sys.modules, "osgeo", osgeo_mod)
    monkeypatch.setitem(sys.modules, "osgeo.gdal", gdal_mod)
    return {"ds10": ds10, "ds20": ds20, "ds60": ds60}



def _read_tif_bands(path):
    """Parse the CLI's pure-Python GeoTIFF output with the independent
    spec-based reader (tests/tiff_reader.py)."""
    from tiff_reader import read_tiff

    t = read_tiff(str(path))
    return t["bands"], t


class TestReadSafe:
    def test_full_read_with_roi(self, fake_gdal):
        from dsen2_tpu.data.safe_reader import read_safe

        tile = read_safe(
            "FAKE_MTD_MSIL1C.xml", roi_x_y=(6, 6, 101, 101), run_60=True
        )
        # ROI snapped to 6px boundaries: ends at 101 inclusive (102 % 6 == 0)
        assert (tile.roi.xmin, tile.roi.ymin, tile.roi.xmax, tile.roi.ymax) == (6, 6, 101, 101)
        assert tile.data10.shape == (96, 96, 4)
        assert tile.data20.shape == (48, 48, 6)
        assert tile.data60.shape == (16, 16, 2)  # B10 excluded
        assert [b.shortname for b in tile.bands60] == ["B1", "B9"]
        assert tile.utm == "UTM 33N"
        # band values must come from the right windows
        want = np.moveaxis(
            fake_gdal["ds10"]._arrs[:, 6:102, 6:102], 0, -1
        )
        np.testing.assert_array_equal(tile.data10, want)

    def test_b10_never_selected(self, fake_gdal):
        from dsen2_tpu.data.safe_reader import read_safe

        tile = read_safe("FAKE_MTD_MSIL1C.xml", run_60=True)
        names = [b.shortname for b in tile.bands10 + tile.bands20 + tile.bands60]
        assert "B10" not in names
        assert sorted(names) == sorted(
            ["B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B9", "B11", "B12"]
        )


class TestS2SupresCLIEndToEnd:
    def test_full_tile_cli_geotiff_output(self, fake_gdal, tmp_path,
                                          monkeypatch):
        """Drive the CLI main() end to end: fake SAFE in -> a REAL
        georeferenced GeoTIFF out (the pure-Python writer takes over when
        GDAL cannot create files), with --copy_original_bands and
        --run_60."""
        from dsen2_tpu.cli.s2_supres import main

        monkeypatch.chdir(tmp_path)
        rc = main(
            [
                "FAKE_MTD_MSIL1C.xml", "out.tif",
                "--roi_x_y", "0,0,359,359", "--run_60", "--copy_original_bands",
            ]
        )
        assert rc == 0
        bands, tif = _read_tif_bands(tmp_path / "out.tif")
        # 4 original 10m + 6 SR20 + 2 SR60
        assert len(bands) == 12
        sr_names = [k for k in bands if k.startswith("SR")]
        assert len(sr_names) == 8
        for v in bands.values():
            assert v.shape == (360, 360)
            assert np.isfinite(v).all()
        # georeferencing carried through: 10 m pixels, ROI-shifted origin
        assert tif["pixel_scale"] == [10.0, 10.0, 0.0]
        assert tif["tiepoint"][3:5] == [399960.0, 5000040.0]

    def test_full_tile_cli_ensemble(self, fake_gdal, tmp_path, monkeypatch):
        """--ensemble must run the 8-transform average through the same CLI
        path and produce finite same-shape output."""
        from dsen2_tpu.cli.s2_supres import main

        monkeypatch.chdir(tmp_path)
        rc = main(["FAKE_MTD_MSIL1C.xml", "out.tif",
                   "--roi_x_y", "0,0,359,359", "--ensemble"])
        assert rc == 0
        bands, _ = _read_tif_bands(tmp_path / "out.tif")
        assert len([k for k in bands if k.startswith("SR")]) == 6
        for v in bands.values():
            assert v.shape == (360, 360) and np.isfinite(v).all()

    def test_full_tile_cli_mesh(self, fake_gdal, tmp_path, monkeypatch):
        """--mesh N shards the patch grid over the (virtual) device mesh;
        the output must equal the single-device CLI run bit for bit (the
        default geometry's per-shard chunking coincides here)."""
        from dsen2_tpu.cli.s2_supres import main

        monkeypatch.chdir(tmp_path)
        rc = main(["FAKE_MTD_MSIL1C.xml", "mesh.tif",
                   "--roi_x_y", "0,0,359,359", "--mesh", "8"])
        assert rc == 0
        rc = main(["FAKE_MTD_MSIL1C.xml", "single.tif",
                   "--roi_x_y", "0,0,359,359"])
        assert rc == 0
        zm, _ = _read_tif_bands(tmp_path / "mesh.tif")
        zs, _ = _read_tif_bands(tmp_path / "single.tif")
        assert set(zm) == set(zs)
        for k in zm:
            assert np.isfinite(zm[k]).all()
            np.testing.assert_allclose(zm[k], zs[k], rtol=2e-4, atol=1e-2)

    def test_full_tile_cli_mesh_ensemble(self, fake_gdal, tmp_path,
                                         monkeypatch):
        """--mesh with --ensemble routes through the device-resident mesh
        ensemble (per-shard bands folded into the on-device accumulator,
        one readback) and must agree with the single-device ensemble."""
        from dsen2_tpu.cli.s2_supres import main

        monkeypatch.chdir(tmp_path)
        rc = main(["FAKE_MTD_MSIL1C.xml", "me.tif",
                   "--roi_x_y", "0,0,359,359", "--mesh", "8", "--ensemble"])
        assert rc == 0
        rc = main(["FAKE_MTD_MSIL1C.xml", "se.tif",
                   "--roi_x_y", "0,0,359,359", "--ensemble"])
        assert rc == 0
        zm, _ = _read_tif_bands(tmp_path / "me.tif")
        zs, _ = _read_tif_bands(tmp_path / "se.tif")
        assert set(zm) == set(zs)
        for k in zm:
            assert np.isfinite(zm[k]).all()
            np.testing.assert_allclose(zm[k], zs[k], rtol=2e-4, atol=0.05)

    def test_list_bands(self, fake_gdal, capsys):
        from dsen2_tpu.cli.s2_supres import main

        rc = main(["FAKE_MTD_MSIL1C.xml", "--list_bands", "--run_60"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "B8A (865 nm)" in out and "B9 (945 nm)" in out

    def test_list_utm(self, fake_gdal, capsys):
        from dsen2_tpu.cli.s2_supres import main

        rc = main(["FAKE_MTD_MSIL1C.xml", "--list_UTM"])
        assert rc == 0
        assert "UTM 33N" in capsys.readouterr().out
