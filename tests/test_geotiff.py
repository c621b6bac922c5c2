"""The pure-Python GeoTIFF/BigTIFF writer (dsen2_tpu/io/geotiff.py) vs an
independent spec-based reader (tests/tiff_reader.py): pixel data, strip
layout, georeferencing tags, band descriptions, and the write_bands
integration that gives the CLI real GTiff output without GDAL
(reference writer semantics: testing/s2_tiles_supres.py:396-413)."""

import numpy as np
import pytest

from dsen2_tpu.io.geotiff import epsg_from_wkt, write_geotiff
from tiff_reader import read_tiff

UTM33_WKT = (
    'PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563,AUTHORITY["EPSG","7030"]],'
    'AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0],UNIT["degree",'
    '0.0174532925199433],AUTHORITY["EPSG","4326"]],PROJECTION['
    '"Transverse_Mercator"],UNIT["metre",1,AUTHORITY["EPSG","9001"]],'
    'AUTHORITY["EPSG","32633"]]'
)
GEOT = (399960.0, 10.0, 0.0, 6100020.0, 0.0, -10.0)


class TestEpsgFromWkt:
    def test_utm_wkt(self):
        assert epsg_from_wkt(UTM33_WKT) == 32633

    def test_none_and_missing(self):
        assert epsg_from_wkt(None) is None
        assert epsg_from_wkt("PROJCS[x]") is None

    def test_wkt2_id_node(self):
        assert epsg_from_wkt(
            'PROJCRS["WGS 84 / UTM zone 33N",ID["EPSG",32633]]'
        ) == 32633


class TestRoundTrip:
    def _bands(self, rng, dtype, n=3, h=13, w=10):
        return [
            (f"SR B{i + 4}", (rng.random((h, w)) * 1000).astype(dtype))
            for i in range(n)
        ]

    @pytest.mark.parametrize("dtype", [np.float64, np.float32, np.uint16])
    def test_pixels_and_descriptions(self, rng, tmp_path, dtype):
        bands = self._bands(rng, dtype)
        path = str(tmp_path / "t.tif")
        variant = write_geotiff(path, bands, geotransform=GEOT,
                                projection_wkt=UTM33_WKT)
        assert variant == "GTiff"
        got = read_tiff(path)
        assert not got["bigtiff"]
        assert got["dtype"] == np.dtype(dtype)
        assert got["descriptions"] == [d for d, _ in bands]
        for desc, arr in bands:
            np.testing.assert_array_equal(got["bands"][desc], arr)
        # georeferencing: pixel scale (10, 10, 0), tiepoint at the origin
        assert got["pixel_scale"] == [10.0, 10.0, 0.0]
        assert got["tiepoint"] == [0, 0, 0, GEOT[0], GEOT[3], 0]
        # GeoKeyDirectory: projected model, PixelIsArea, EPSG 32633
        assert got["geokeys"][1024] == 1
        assert got["geokeys"][1025] == 1
        assert got["geokeys"][3072] == 32633

    def test_multi_strip_exact(self, rng, tmp_path):
        bands = self._bands(rng, np.float32, n=2, h=11, w=7)
        path = str(tmp_path / "t.tif")
        write_geotiff(path, bands, rows_per_strip=3)
        got = read_tiff(path)
        for desc, arr in bands:
            np.testing.assert_array_equal(got["bands"][desc], arr)

    def test_bigtiff_forced(self, rng, tmp_path):
        bands = self._bands(rng, np.uint16, n=2)
        path = str(tmp_path / "t.tif")
        assert write_geotiff(path, bands, geotransform=GEOT,
                             epsg=32633, bigtiff=True) == "BigTIFF"
        got = read_tiff(path)
        assert got["bigtiff"]
        assert got["geokeys"][3072] == 32633
        for desc, arr in bands:
            np.testing.assert_array_equal(got["bands"][desc], arr)

    def test_mixed_dtypes_upcast(self, rng, tmp_path):
        bands = [
            ("B2", (rng.random((6, 5)) * 1000).astype(np.uint16)),
            ("SRB5", (rng.random((6, 5)) * 1000).astype(np.float32)),
        ]
        path = str(tmp_path / "t.tif")
        write_geotiff(path, bands)
        got = read_tiff(path)
        assert got["dtype"] == np.float32
        np.testing.assert_array_equal(got["bands"]["B2"],
                                      bands[0][1].astype(np.float32))

    def test_geographic_epsg_geokeys(self, rng, tmp_path):
        path = str(tmp_path / "t.tif")
        write_geotiff(path, self._bands(rng, np.float32, n=1), epsg=4326)
        got = read_tiff(path)
        assert got["geokeys"][1024] == 2  # geographic model
        assert got["geokeys"][2048] == 4326

    def test_rotation_terms_rejected(self, rng, tmp_path):
        with pytest.raises(ValueError, match="north-up"):
            write_geotiff(str(tmp_path / "t.tif"),
                          self._bands(rng, np.float32, n=1),
                          geotransform=(0, 10, 1.0, 0, 0, -10))

    def test_single_band_no_georef(self, rng, tmp_path):
        path = str(tmp_path / "t.tif")
        arr = rng.random((4, 4)).astype(np.float64)
        write_geotiff(path, [("only", arr)])
        got = read_tiff(path)
        assert got["n"] == 1 and got["pixel_scale"] is None
        np.testing.assert_array_equal(got["bands"]["only"], arr)

    def test_xml_escaped_description(self, rng, tmp_path):
        path = str(tmp_path / "t.tif")
        write_geotiff(path, [("a<&>b", rng.random((3, 3)).astype(np.float32))])
        got = read_tiff(path)
        assert got["descriptions"] == ["a<&>b"] or got["descriptions"] == [
            "a&lt;&amp;&gt;b"
        ]


class TestWriteBandsIntegration:
    def test_gtiff_without_gdal(self, rng, tmp_path):
        """No GDAL in this image: the GTiff request must produce a real
        parseable GeoTIFF (not npz) through write_bands."""
        from dsen2_tpu.io.writers import write_bands

        bands = [("SR B5", (rng.random((8, 6)) * 9000).astype(np.float64))]
        path = str(tmp_path / "out.tif")
        fmt = write_bands(path, bands, "GTiff", geotransform=GEOT,
                          projection=UTM33_WKT)
        assert fmt in ("GTiff", "BigTIFF")
        got = read_tiff(path)
        np.testing.assert_array_equal(got["bands"]["SR B5"], bands[0][1])
        assert got["geokeys"][3072] == 32633
