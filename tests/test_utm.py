"""The built-in WGS84<->UTM transverse Mercator (dsen2_tpu/geo/utm.py),
validated without any external projection library: forward/inverse
round-trips, exact anchors (central meridian / equator / false
northing), an INDEPENDENT numerical integration of the meridian arc,
and the analytic first-order expansion near the central meridian.
Replaces OSR for lon/lat ROIs on GDAL-less hosts
(reference: testing/s2_tiles_supres.py:141-161)."""

import math

import numpy as np
import pytest

from dsen2_tpu.geo.utm import utm_forward, utm_inverse, zone_from_epsg

_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)


class TestZoneFromEpsg:
    def test_north_south(self):
        assert zone_from_epsg(32633) == (33, True)
        assert zone_from_epsg(32749) == (49, False)

    def test_non_utm_rejected(self):
        with pytest.raises(ValueError):
            zone_from_epsg(4326)


class TestAnchors:
    def test_central_meridian_easting(self):
        """Points ON the central meridian map to exactly the 500 km false
        easting, at any latitude."""
        for lat in (-60, -10, 0, 33.3, 72):
            e, _ = utm_forward(15.0, lat, 33, north=lat >= 0)
            assert e == pytest.approx(500000.0, abs=1e-6)

    def test_equator_northing(self):
        assert utm_forward(16.2, 0.0, 33)[1] == pytest.approx(0.0, abs=1e-6)

    def test_false_northing_south(self):
        """The southern grid adds the 10 000 km false northing: a point
        just south of the equator sits just below 10 000 000."""
        _, n = utm_forward(15.0, -0.001, 33, north=False)
        assert 9_999_000 < n < 10_000_000

    def test_scale_factor_on_cm(self):
        """Northing differences along the central meridian equal k0 times
        the meridian arc: ~0.9996 scale (checked in the arc test below);
        here just the sign/monotonicity."""
        n1 = utm_forward(15, 40, 33)[1]
        n2 = utm_forward(15, 41, 33)[1]
        assert 110_000 < n2 - n1 < 112_000  # ~111 km per degree


class TestAgainstIndependentMath:
    def test_meridian_arc_numerical_integration(self):
        """N(lat) on the central meridian must equal k0 * the meridian arc
        length, computed here by direct numerical integration of the
        ellipsoid's meridian curvature radius — an oracle that shares no
        code or series with the implementation. Sub-mm agreement."""
        for lat in (12.0, 45.0, 78.0):
            phi = np.linspace(0.0, math.radians(lat), 800_001)
            m = np.trapezoid(
                _A * (1 - _E2) / (1 - _E2 * np.sin(phi) ** 2) ** 1.5, phi
            )
            _, n = utm_forward(15.0, lat, 33)
            assert n == pytest.approx(0.9996 * m, abs=1e-3)

    def test_first_order_easting_expansion(self):
        """For small dlon, E - 500000 ~= k0 * nu(lat) * cos(lat) * dlon
        (the next term is O(dlon^3)); agreement to 1e-9 relative at
        dlon = 1e-5 rad."""
        for lat in (0.0, 40.0, 70.0):
            dlam = 1e-5
            e, _ = utm_forward(15 + math.degrees(dlam), lat, 33)
            nu = _A / math.sqrt(1 - _E2 * math.sin(math.radians(lat)) ** 2)
            approx = 0.9996 * nu * math.cos(math.radians(lat)) * dlam
            assert e - 500000.0 == pytest.approx(approx, rel=1e-9)


class TestRoundTrip:
    def test_forward_inverse(self):
        """Round-trip to < 1e-8 degrees (~1 mm) over the zone's extent,
        both hemispheres, including points well outside the +-3 degree
        nominal zone width."""
        for lat in (-79.5, -45.0, -0.5, 0.5, 33.33, 55.605, 71.2):
            for dlon in (-4.0, -2.9, -0.01, 0.0, 1.5, 2.9, 4.0):
                lon = 15.0 + dlon
                north = lat >= 0
                e, n = utm_forward(lon, lat, 33, north)
                lon2, lat2 = utm_inverse(e, n, 33, north)
                assert lon2 == pytest.approx(lon, abs=1e-8)
                assert lat2 == pytest.approx(lat, abs=1e-8)

    def test_bad_zone(self):
        with pytest.raises(ValueError):
            utm_forward(0, 0, 61)
