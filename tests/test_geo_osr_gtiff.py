"""Geo-I/O branches the fake-GDAL e2e test doesn't reach (round-1 VERDICT
item #6): the OSR lon/lat->pixel path (incl. GDAL-3 axis-order handling and
rotated geotransforms), UTM selection on genuinely multi-zone products, and
the GTiff (creatable-driver) branch of write_bands.

Reference anchors: testing/s2_tiles_supres.py:141-170 (lon/lat via OSR),
:115-190 (UTM coverage selection), :396-413 (GeoTIFF creation).
"""

import sys
import types

import numpy as np
import pytest

from dsen2_tpu.data.safe_reader import Roi

# --------------------------------------------------------------- fake osgeo

OAMS_TRADITIONAL = "OAMS_TRADITIONAL_GIS_ORDER"


class FakeSpatialReference:
    def __init__(self):
        self.wkt = None
        self.geogcs = None
        self.axis_strategy = None

    def ImportFromWkt(self, wkt):
        self.wkt = wkt

    def SetWellKnownGeogCS(self, name):
        self.geogcs = name

    def SetAxisMappingStrategy(self, strategy):
        self.axis_strategy = strategy


class FakeCoordinateTransformation:
    """WGS84 -> fake projected CRS: x = x0 + lon*1000, y = 5e6 + lat*1000.

    Mimics GDAL 3: TransformPoint takes CRS-authority axis order (lat, lon
    for WGS84) UNLESS the caller forced the traditional (lon, lat) mapping —
    so callers that skip SetAxisMappingStrategy get swapped coordinates,
    exactly the GDAL-2->3 trap the reader must handle."""

    def __init__(self, src, dst):
        self.src = src
        self.x0 = 399000.0 if "zone 33" in (dst.wkt or "") else 299000.0

    def TransformPoint(self, a, b, z=0.0):
        if self.src.axis_strategy == OAMS_TRADITIONAL:
            lon, lat = a, b
        else:
            lat, lon = a, b
        return (self.x0 + lon * 1000.0, 5_000_000.0 + lat * 1000.0, 0.0)


def make_fake_osr():
    osr = types.ModuleType("osgeo.osr")
    osr.SpatialReference = FakeSpatialReference
    osr.CoordinateTransformation = FakeCoordinateTransformation
    osr.OAMS_TRADITIONAL_GIS_ORDER = OAMS_TRADITIONAL
    return osr


class FakeBand:
    def __init__(self, desc):
        self._desc = desc

    def GetDescription(self):
        return self._desc


class FakeDataset:
    def __init__(self, arrs, descs, geot, projection="PROJCS[WGS 84 / UTM zone 33N]"):
        self._arrs = arrs
        self._descs = descs
        self._geot = geot
        self._proj = projection
        self.RasterXSize = arrs.shape[2]
        self.RasterYSize = arrs.shape[1]
        self.RasterCount = arrs.shape[0]

    def GetRasterBand(self, i):
        return FakeBand(self._descs[i - 1])

    def GetGeoTransform(self):
        return self._geot

    def GetProjection(self):
        return self._proj

    def ReadAsArray(self, xoff, yoff, xsize, ysize, buf_xsize=None, buf_ysize=None):
        return self._arrs[:, yoff : yoff + ysize, xoff : xoff + xsize]

    def GetSubDatasets(self):
        return []


DESCS10 = [
    "B4, central wavelength 665 nm",
    "B3, central wavelength 560 nm",
    "B2, central wavelength 490 nm",
    "B8, central wavelength 842 nm",
]
DESCS20 = [
    "B5, central wavelength 705 nm",
    "B6, central wavelength 740 nm",
    "B7, central wavelength 783 nm",
    "B8A, central wavelength 865 nm",
    "B11, central wavelength 1610 nm",
    "B12, central wavelength 2190 nm",
]
DESCS60 = [
    "B1, central wavelength 443 nm",
    "B9, central wavelength 945 nm",
    "B10, central wavelength 1375 nm",
]

GEOT = (399960.0, 10.0, 0.0, 5000040.0, 0.0, -10.0)


def make_zone_datasets(rng, size10, utm, projection):
    def mk(n, size, descs):
        arrs = (rng.random((n, size, size)) * 8000).astype(np.float32)
        return FakeDataset(arrs, descs, GEOT, projection)

    return {
        f"S2:10m:{utm}": (f"Bands B2, B3, B4, B8 with 10m resolution, UTM {utm}", mk(4, size10, DESCS10)),
        f"S2:20m:{utm}": (f"Bands with 20m resolution, UTM {utm}", mk(6, size10 // 2, DESCS20)),
        f"S2:60m:{utm}": (f"Bands with 60m resolution, UTM {utm}", mk(3, size10 // 6, DESCS60)),
    }


class FakeProduct:
    def __init__(self, subs):
        self._subs = subs

    def GetSubDatasets(self):
        return [(name, desc) for name, (desc, _) in self._subs.items()]


@pytest.fixture()
def multizone_gdal(monkeypatch, rng):
    """A product spanning two UTM zones: 33N covers 360x360 10m px, 32N only
    60x60 — so coverage-based selection must pick 33N unless overridden."""
    subs = {}
    subs.update(make_zone_datasets(rng, 60, "32N", "PROJCS[WGS 84 / UTM zone 32N]"))
    subs.update(make_zone_datasets(rng, 360, "33N", "PROJCS[WGS 84 / UTM zone 33N]"))
    product = FakeProduct(subs)

    gdal = types.ModuleType("osgeo.gdal")

    def fake_open(name):
        if name == "FAKE_MTD_MSIL1C.xml":
            return product
        pair = subs.get(name)
        return pair[1] if pair else None

    gdal.Open = fake_open
    gdal.DCAP_CREATE = "DCAP_CREATE"
    gdal.DCAP_RASTER = "DCAP_RASTER"
    gdal.GetDriverByName = lambda name: None
    gdal.GetDriverCount = lambda: 0

    osgeo = types.ModuleType("osgeo")
    osgeo.gdal = gdal
    osgeo.osr = make_fake_osr()
    monkeypatch.setitem(sys.modules, "osgeo", osgeo)
    monkeypatch.setitem(sys.modules, "osgeo.gdal", gdal)
    monkeypatch.setitem(sys.modules, "osgeo.osr", osgeo.osr)
    return subs


# ------------------------------------------------------- lon/lat -> pixel

class TestLonLatToPixel:
    def test_axis_order_and_inverse_geotransform(self, multizone_gdal):
        from dsen2_tpu.data.safe_reader import _lonlat_to_pixel

        ds = multizone_gdal["S2:10m:33N"][1]
        # fake CRS: x = 399000 + lon*1000 -> px = (lon*1000 - 960)/10
        #           y = 5e6 + lat*1000   -> py = (40 - lat*1000)/10
        x1, y1, x2, y2 = _lonlat_to_pixel(ds, 1.0, 0.0, 2.0, -1.0)
        assert (x1, y1) == pytest.approx((4.0, 4.0))
        assert (x2, y2) == pytest.approx((104.0, 104.0))

    def test_rotated_geotransform_inversion(self, multizone_gdal):
        from dsen2_tpu.data.safe_reader import _lonlat_to_pixel

        # 30-degree-rotated affine: the 2x2 inverse must be exercised fully.
        c, s = np.cos(np.pi / 6), np.sin(np.pi / 6)
        geot = (399960.0, 10 * c, 10 * s, 5000040.0, 10 * s, -10 * c)
        ds = FakeDataset(np.zeros((1, 8, 8), np.float32), ["B2"], geot)
        x, y, _, _ = _lonlat_to_pixel(ds, 1.5, -0.5, 1.5, -0.5)
        # verify by forward application: geo = origin + A @ (px, py)
        gx = geot[0] + geot[1] * x + geot[2] * y
        gy = geot[3] + geot[4] * x + geot[5] * y
        assert gx == pytest.approx(399000.0 + 1.5 * 1000.0)
        assert gy == pytest.approx(5_000_000.0 - 0.5 * 1000.0)

    def test_read_safe_lonlat_roi(self, multizone_gdal):
        from dsen2_tpu.data.safe_reader import read_safe

        tile = read_safe(
            "FAKE_MTD_MSIL1C.xml", roi_lon_lat=(1.0, 0.0, 2.0, -1.0), run_60=True
        )
        # pixels (4,4)-(104,104) snapped outward to 6-px: (0,0)-(101,101)
        assert (tile.roi.xmin, tile.roi.ymin, tile.roi.xmax, tile.roi.ymax) == (0, 0, 101, 101)
        assert tile.utm == "UTM 33N"
        assert tile.data10.shape == (102, 102, 4)
        assert tile.data60.shape == (17, 17, 2)


# --------------------------------------------------- multi-zone selection

class TestMultiZone:
    def test_coverage_selects_larger_zone(self, multizone_gdal):
        from dsen2_tpu.data.safe_reader import read_safe

        tile = read_safe("FAKE_MTD_MSIL1C.xml", roi_x_y=(0, 0, 239, 239))
        assert tile.utm == "UTM 33N"
        assert tile.data10.shape == (240, 240, 4)
        # both zones appear in the coverage report, clamped to their rasters
        assert tile.utm_coverage["UTM 33N"] == 240 * 240
        assert tile.utm_coverage["UTM 32N"] == 60 * 60

    def test_select_utm_override(self, multizone_gdal):
        from dsen2_tpu.data.safe_reader import read_safe

        tile = read_safe(
            "FAKE_MTD_MSIL1C.xml", roi_x_y=(0, 0, 47, 47), select_utm_zone="UTM 32N"
        )
        assert tile.utm == "UTM 32N"
        assert tile.data10.shape == (48, 48, 4)
        # the 20m/60m picks must come from the SAME zone
        assert tile.data20.shape == (24, 24, 6)

    def test_scan_utm_zones_lists_both(self, multizone_gdal):
        from dsen2_tpu.data.safe_reader import scan_utm_zones

        cov = scan_utm_zones("FAKE_MTD_MSIL1C.xml", roi_x_y=(0, 0, 239, 239))
        assert set(cov) == {"UTM 32N", "UTM 33N"}
        assert cov["UTM 33N"] > cov["UTM 32N"]

    def test_cli_list_utm(self, multizone_gdal, capsys):
        from dsen2_tpu.cli.s2_supres import main

        rc = main(["FAKE_MTD_MSIL1C.xml", "/tmp/unused_out", "--list_UTM"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "UTM 32N" in out and "UTM 33N" in out


# ------------------------------------------------------------ GTiff write

class FakeOutBand:
    def __init__(self):
        self.description = None
        self.array = None

    def SetDescription(self, d):
        self.description = d

    def WriteArray(self, a):
        self.array = np.asarray(a)


class FakeOutDataset:
    def __init__(self, path, w, h, n, dtype):
        self.path, self.w, self.h, self.n, self.dtype = path, w, h, n, dtype
        self.bands = [FakeOutBand() for _ in range(n)]
        self.geotransform = None
        self.projection = None
        self.flushed = False

    def SetGeoTransform(self, g):
        self.geotransform = tuple(g)

    def SetProjection(self, p):
        self.projection = p

    def GetRasterBand(self, i):
        return self.bands[i - 1]

    def FlushCache(self):
        self.flushed = True


class FakeDriver:
    def __init__(self, name, creatable=True, raster=True, created=None):
        self._name = name
        self._md = {}
        if creatable:
            self._md["DCAP_CREATE"] = "YES"
        if raster:
            self._md["DCAP_RASTER"] = "YES"
        self._md["DMD_LONGNAME"] = name + " Long"
        self._md["DMD_EXTENSIONS"] = name.lower()
        self.created = created if created is not None else []

    def GetMetadata(self):
        return self._md

    def GetDescription(self):
        return self._name

    def Create(self, path, w, h, n, dtype):
        ds = FakeOutDataset(path, w, h, n, dtype)
        self.created.append(ds)
        return ds


@pytest.fixture()
def creatable_gdal(monkeypatch):
    gtiff = FakeDriver("GTiff")
    png = FakeDriver("PNG", creatable=False)
    drivers = {"GTiff": gtiff, "PNG": png}

    gdal = types.ModuleType("osgeo.gdal")
    gdal.DCAP_CREATE = "DCAP_CREATE"
    gdal.DCAP_RASTER = "DCAP_RASTER"
    gdal.GDT_Float64 = "GDT_Float64"
    gdal.GetDriverByName = lambda name: drivers.get(name)
    gdal.GetDriverCount = lambda: len(drivers)
    gdal.GetDriver = lambda i: list(drivers.values())[i]

    osgeo = types.ModuleType("osgeo")
    osgeo.gdal = gdal
    monkeypatch.setitem(sys.modules, "osgeo", osgeo)
    monkeypatch.setitem(sys.modules, "osgeo.gdal", gdal)
    return gtiff


class TestWriteBandsGTiff:
    def test_gtiff_branch(self, creatable_gdal, rng, tmp_path):
        from dsen2_tpu.io.writers import shifted_geotransform, write_bands

        arrs = [(f"SR B{i}", rng.random((12, 10))) for i in (5, 6)]
        geot = shifted_geotransform(GEOT, xmin=6, ymin=12)
        fmt = write_bands(
            str(tmp_path / "out.tif"), arrs, "GTiff",
            geotransform=geot, projection="PROJCS[x]",
        )
        assert fmt == "GTiff"
        assert len(creatable_gdal.created) == 1
        ds = creatable_gdal.created[0]
        assert (ds.w, ds.h, ds.n, ds.dtype) == (10, 12, 2, "GDT_Float64")
        # origin shifted by ROI offsets x 10 m (s2_tiles_supres.py:399-403)
        assert ds.geotransform[0] == GEOT[0] + 60 and ds.geotransform[3] == GEOT[3] - 120
        assert ds.projection == "PROJCS[x]"
        assert [b.description for b in ds.bands] == ["SR B5", "SR B6"]
        np.testing.assert_array_equal(ds.bands[1].array, arrs[1][1])
        assert ds.flushed

    def test_noncreatable_falls_back_to_npz(self, creatable_gdal, rng, tmp_path):
        from dsen2_tpu.io.writers import write_bands

        out = str(tmp_path / "out")
        fmt = write_bands(out, [("SR B5", rng.random((4, 4)))], "PNG")
        assert fmt == "npz"
        assert not creatable_gdal.created

    def test_list_creatable_formats(self, creatable_gdal):
        from dsen2_tpu.io.writers import list_creatable_formats

        names = list_creatable_formats()
        assert any(n.startswith("GTiff") for n in names)
        assert not any(n.startswith("PNG") for n in names)
