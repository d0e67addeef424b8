"""Helmert datum-shift tests (proj.py datum section; reference role:
ogr/ogrct.cpp:1003-1032 delegates to PROJ — this engine implements the
EPSG Guidance Note 7-2 geocentric pipeline directly)."""

import numpy as np
import pytest

from gdal_spark import proj


class TestGeocentric:
    def test_gn72_position_vector_worked_example(self):
        # EPSG GN7-2 §2.4.3.3 worked example (WGS72 -> WGS84):
        # dz +4.5 m, rz +0.554", ds +0.219 ppm; published output is
        # rounded to cm, the pipeline must agree within that rounding
        x, y, z = proj.helmert_7param(
            3657660.66, 255768.55, 5201382.11, 0, 0, 4.5, 0, 0, 0.554, 0.219
        )
        assert abs(float(x) - 3657660.78) < 0.01
        assert abs(float(y) - 255778.43) < 0.005
        assert abs(float(z) - 5201387.75) < 0.005

    def test_geodetic_geocentric_roundtrip(self):
        rng = np.random.default_rng(9)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-89.9, 89.9, 500)
        h = rng.uniform(-1000, 9000, 500)
        x, y, z = proj.geodetic_to_geocentric(lon, lat, proj._A,
                                              proj._WGS84_RF, h)
        lo, la, h2 = proj.geocentric_to_geodetic(x, y, z, proj._A,
                                                 proj._WGS84_RF)
        np.testing.assert_allclose(lo, lon, atol=1e-11)
        np.testing.assert_allclose(la, lat, atol=1e-11)
        np.testing.assert_allclose(h2, h, atol=1e-6)

    def test_helmert_inverse_is_inverse(self):
        rng = np.random.default_rng(1)
        xyz = rng.uniform(-6.4e6, 6.4e6, (3, 100))
        p = (446.448, -125.157, 542.06, 0.1502, 0.247, 0.8421, -20.4894)
        f = proj.helmert_7param(*xyz, *p)
        b = proj.helmert_7param(*f, *p, inverse=True)
        # first-order reverse: residual bounded by rot^2 * R ~ 0.1 mm
        for got, want in zip(b, xyz):
            np.testing.assert_allclose(got, want, atol=2e-4)


class TestDatumShift:
    def test_osgb36_shift_magnitude_and_roundtrip(self):
        s = proj.DATUM_TABLE[27700]
        lon = np.linspace(-6.0, 1.5, 40)
        lat = np.linspace(50.0, 58.0, 40)
        lo, la = s.to_local(lon, lat)
        # OSGB36 vs WGS84 is a well-known ~60-160 m offset over GB
        d = np.hypot((lo - lon) * np.cos(np.radians(lat)) * 111320.0,
                     (la - lat) * 110574.0)
        assert (d > 50).all() and (d < 200).all()
        lo2, la2 = s.to_wgs84(lo, la)
        np.testing.assert_allclose(lo2, lon, atol=1e-7)
        np.testing.assert_allclose(la2, lat, atol=1e-7)

    def test_airy_transit_circle(self):
        # The WGS84 prime meridian passes ~102 m east of the Airy
        # Transit Circle at Greenwich; the monument's published BNG grid
        # reference is E 538885 N 177320. Forward of its WGS84 position
        # must land within the Helmert's own ~3 m rating.
        t = proj.get_transformer(27700)
        e, n = t.forward(np.array([-0.0015]), np.array([51.4778]))
        assert abs(float(e) - 538885.0) < 5.0
        assert abs(float(n) - 177320.0) < 5.0

    def test_nad27_utm11_vs_wgs84_utm11(self):
        # byte.tif's CRS (EPSG:26711). Same WGS84 ground point projected
        # into NAD27 UTM 11 vs WGS84 UTM 11 must differ by the classic
        # CONUS datum offset (order 100-300 m), NOT agree naively.
        lon = np.array([-117.64])
        lat = np.array([33.9])
        e1, n1 = proj.get_transformer(26711).forward(lon, lat)
        e2, n2 = proj.get_transformer(32611).forward(lon, lat)
        d = float(np.hypot(e1 - e2, n1 - n2))
        assert 100.0 < d < 300.0
        lo, la = proj.get_transformer(26711).inverse(e1, n1)
        np.testing.assert_allclose(lo, lon, atol=1e-7)
        np.testing.assert_allclose(la, lat, atol=1e-7)

    def test_geographic_srid_shift_only(self):
        # EPSG:4267 (NAD27 geographic): forward = WGS84 -> NAD27 degrees
        t = proj.get_transformer(4267)
        lo, la = t.forward(np.array([-100.0]), np.array([40.0]))
        assert abs(float(lo) + 100.0) * 111320 * 0.766 < 300
        assert (abs(float(lo) + 100.0) + abs(float(la) - 40.0)) > 1e-5
        lo2, la2 = t.inverse(lo, la)
        np.testing.assert_allclose(
            [float(lo2), float(la2)], [-100.0, 40.0], atol=1e-7
        )

    def test_register_datum_user_crs(self):
        # user-registered CRS on the International 1924 ellipsoid with a
        # 3-param shift composes like the built-ins
        proj.register_crs(990001, "tm", a=6378388.0, rf=297.0, lon0=9.0,
                          k0=1.0, e0=500000.0, n0=0.0, lat0=0.0)
        proj.register_datum(990001, 6378388.0, 297.0, (-87.0, -98.0, -121.0))
        try:
            t = proj.get_transformer(990001)
            e, n = t.forward(np.array([9.5]), np.array([48.0]))
            lo, la = t.inverse(e, n)
            np.testing.assert_allclose(
                [float(lo), float(la)], [9.5, 48.0], atol=1e-7
            )
            # vs the same projection WITHOUT the shift: ~100 m class
            tm = proj.TM(a=6378388.0, rf=297.0, lon0=9.0, k0=1.0,
                         e0=500000.0, n0=0.0, lat0=0.0)
            e0, n0 = tm.forward(np.array([9.5]), np.array([48.0]))
            assert 50 < float(np.hypot(e - e0, n - n0)[0]) < 400
        finally:
            proj.DATUM_TABLE.pop(990001, None)
            proj.CRS_TABLE.pop(990001, None)
            proj._XFORM_CACHE.pop(990001, None)


class TestWarpDatum:
    def test_warp_27700_corners_move_vs_naive(self):
        # VERDICT r4 task #4's acceptance: corners of a 27700->3857 warp
        # must move by the documented ~100 m vs a datum-naive result.
        from gdal_spark.operators.warp import geo_transform_points

        e = np.array([400000.0, 600000.0])
        n = np.array([100000.0, 300000.0])
        x, y = geo_transform_points(e, n, 27700, 3857)
        # naive: treat OSGB36 geodetic output as if it were WGS84
        naive_t = proj.TM(a=6377563.396, rf=299.3249646, lon0=-2.0,
                          k0=0.9996012717, e0=400000.0, n0=-100000.0,
                          lat0=49.0)
        lon_o, lat_o = naive_t.inverse(e, n)
        xn, yn = geo_transform_points(lon_o, lat_o, 4326, 3857)
        d = np.hypot(x - xn, y - yn)
        assert (d > 60).all() and (d < 400).all()


class TestWktTowgs84:
    OSGB_WKT = """PROJCS["OSGB 1936 / British National Grid",
    GEOGCS["OSGB 1936",
        DATUM["OSGB_1936",
            SPHEROID["Airy 1830",6377563.396,299.3249646],
            TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["latitude_of_origin",49],
    PARAMETER["central_meridian",-2],
    PARAMETER["scale_factor",0.9996012717],
    PARAMETER["false_easting",400000],
    PARAMETER["false_northing",-100000],
    UNIT["metre",1]]"""

    def test_import_with_towgs84_matches_builtin(self):
        from gdal_spark.crs_wkt import register_crs_from_wkt

        register_crs_from_wkt(927701, self.OSGB_WKT)
        try:
            lon = np.array([-0.0015, -3.1])
            lat = np.array([51.4778, 55.9])
            e1, n1 = proj.get_transformer(927701).forward(lon, lat)
            e2, n2 = proj.get_transformer(27700).forward(lon, lat)
            np.testing.assert_allclose(e1, e2, atol=1e-6)
            np.testing.assert_allclose(n1, n2, atol=1e-6)
        finally:
            proj.CRS_TABLE.pop(927701, None)
            proj.DATUM_TABLE.pop(927701, None)
            proj._XFORM_CACHE.pop(927701, None)

    def test_parse_towgs84_absent_and_zero(self):
        from gdal_spark.crs_wkt import parse_wkt_towgs84

        no_clause = self.OSGB_WKT.replace(
            ",\n            TOWGS84[446.448,-125.157,542.06,"
            "0.1502,0.247,0.8421,-20.4894]", "")
        assert parse_wkt_towgs84(no_clause) is None
        zero = self.OSGB_WKT.replace(
            "TOWGS84[446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894]",
            "TOWGS84[0,0,0,0,0,0,0]")
        assert parse_wkt_towgs84(zero) is None

    def test_export_roundtrip_carries_datum(self):
        from gdal_spark.crs_wkt import export_wkt, parse_wkt_towgs84, \
            register_crs_from_wkt

        wkt = export_wkt(27700)
        assert "TOWGS84[" in wkt
        register_crs_from_wkt(927702, wkt)
        try:
            lon = np.array([-1.25])
            lat = np.array([52.5])
            e1, n1 = proj.get_transformer(927702).forward(lon, lat)
            e2, n2 = proj.get_transformer(27700).forward(lon, lat)
            np.testing.assert_allclose(e1, e2, atol=1e-6)
            np.testing.assert_allclose(n1, n2, atol=1e-6)
            assert parse_wkt_towgs84(wkt) == proj.DATUM_TABLE[27700].towgs84
        finally:
            proj.CRS_TABLE.pop(927702, None)
            proj.DATUM_TABLE.pop(927702, None)
            proj._XFORM_CACHE.pop(927702, None)

    def test_export_without_datum_has_no_clause(self):
        from gdal_spark.crs_wkt import export_wkt

        assert "TOWGS84" not in export_wkt(32631)
