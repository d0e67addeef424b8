"""Geodesic distance/length tests: published Vincenty ground truth,
analytic arcs, properties, and the SQL surface."""

import numpy as np

from gdal_spark import geom
from gdal_spark.geodesic import (
    WGS84_A,
    geodesic_line_length,
    geometry_geodesic_length,
    vincenty_inverse,
)


class TestVincenty:
    def test_geoscience_australia_ground_truth(self):
        # Vincenty's published test line: Flinders Peak -> Buninyong,
        # s = 54972.271 m (Geodetic Datum of Australia technical manual)
        lat1 = -(37 + 57 / 60 + 3.72030 / 3600)
        lon1 = 144 + 25 / 60 + 29.52440 / 3600
        lat2 = -(37 + 39 / 60 + 10.15610 / 3600)
        lon2 = 143 + 55 / 60 + 35.38390 / 3600
        assert abs(float(vincenty_inverse(lon1, lat1, lon2, lat2)) - 54972.271) < 1e-3

    def test_quarter_meridian(self):
        # WGS84 quarter meridian = 10001965.7293 m
        assert abs(float(vincenty_inverse(0, 0, 0, 90)) - 10001965.7293) < 1e-3

    def test_equatorial_arc_exact(self):
        # along the equator the geodesic is the circular arc a * dlon
        for dlon in (0.5, 1.0, 10.0, 90.0):
            exp = WGS84_A * np.radians(dlon)
            assert abs(float(vincenty_inverse(0, 0, dlon, 0)) - exp) < 1e-6

    def test_symmetry_and_zero(self):
        rng = np.random.default_rng(5)
        lon1 = rng.uniform(-179, 179, 50)
        lat1 = rng.uniform(-80, 80, 50)
        lon2 = lon1 + rng.uniform(-20, 20, 50)
        lat2 = np.clip(lat1 + rng.uniform(-20, 20, 50), -85, 85)
        d12 = vincenty_inverse(lon1, lat1, lon2, lat2)
        d21 = vincenty_inverse(lon2, lat2, lon1, lat1)
        assert np.allclose(d12, d21, atol=1e-6)
        assert np.all(vincenty_inverse(lon1, lat1, lon1, lat1) == 0.0)

    def test_vs_spherical_within_flattening(self):
        # geodesic vs great-circle on the mean sphere differ by < ~0.6%
        rng = np.random.default_rng(9)
        lon1 = rng.uniform(-170, 170, 30)
        lat1 = rng.uniform(-70, 70, 30)
        lon2 = lon1 + rng.uniform(-40, 40, 30)
        lat2 = np.clip(lat1 + rng.uniform(-40, 40, 30), -85, 85)
        d = vincenty_inverse(lon1, lat1, lon2, lat2)
        R = 6371008.8
        p1, p2 = np.radians(lat1), np.radians(lat2)
        dl = np.radians(lon2 - lon1)
        gc = R * np.arccos(
            np.clip(
                np.sin(p1) * np.sin(p2) + np.cos(p1) * np.cos(p2) * np.cos(dl),
                -1,
                1,
            )
        )
        mask = d > 1000
        assert np.all(np.abs(d[mask] - gc[mask]) / d[mask] < 0.006)


class TestGeodesicLength:
    def test_polyline_sum(self):
        coords = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        exp = float(vincenty_inverse(0, 0, 1, 0)) + float(
            vincenty_inverse(1, 0, 1, 1)
        )
        assert abs(geodesic_line_length(coords) - exp) < 1e-9

    def test_degenerate(self):
        assert geodesic_line_length(np.zeros((1, 2))) == 0.0
        assert geodesic_line_length(np.zeros((0, 2))) == 0.0

    def test_geometry_polygon_perimeter(self):
        g = geom.parse_wkb(geom.wkb_rect(0.0, 0.0, 1.0, 1.0))
        exp = geodesic_line_length(
            np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
        )
        assert abs(geometry_geodesic_length(g) - exp) < 1e-6

    def test_sql_surface(self, spark):
        from gdal_spark.sql import execute_sql

        df = spark.createDataFrame(
            [
                (0, 0.0, 0.0, 1.0, 0.0, bytearray(geom.wkb_rect(0, 0, 1, 1))),
                (1, None, 0.0, 1.0, 0.0, None),
            ],
            "i long, lon1 double, lat1 double, lon2 double, lat2 double, g binary",
        )
        out = execute_sql(
            spark,
            "SELECT i, st_geodesic_distance(lon1, lat1, lon2, lat2) AS d, "
            "st_geodesic_length(g) AS L FROM t ORDER BY i",
            {"t": df},
        ).collect()
        assert abs(out[0].d - WGS84_A * np.pi / 180.0) < 1e-6
        assert out[0].L > 4 * 110_000  # ~1-degree square perimeter
        assert out[1].d is None and out[1].L is None


class TestGeodesicArea:
    def test_meridian_parallel_band_closed_form(self):
        # meridian + parallel bounded quad: meridians are geodesics in
        # both models and the authalic mapping is exactly equal-area, so
        # (densified) band area == a^2/2 * dlam * (q2 - q1) exactly
        from gdal_spark.geodesic import (
            AUTHALIC_R2,
            authalic_latitude,
            geodesic_ring_area,
        )

        lon1, lon2, lat1, lat2 = 10.0, 35.0, 20.0, 55.0
        n = 2000
        top = [(lo, lat2) for lo in np.linspace(lon1, lon2, n)]
        bot = [(lo, lat1) for lo in np.linspace(lon2, lon1, n)]
        ring = np.array(top + bot + [top[0]])
        got = abs(geodesic_ring_area(ring))
        xi1, xi2 = np.radians(authalic_latitude([lat1, lat2]))
        exp = AUTHALIC_R2 * np.radians(lon2 - lon1) * (np.sin(xi2) - np.sin(xi1))
        assert abs(got - exp) / exp < 1e-9

    def test_pole_enclosing_square(self):
        # 4-vertex ring around the north pole: winding correction path
        from gdal_spark.geodesic import AUTHALIC_R2, authalic_latitude, geodesic_ring_area

        lat = 80.0
        ring = np.array([(0.0, lat), (90.0, lat), (180.0, lat), (270.0, lat), (0.0, lat)])
        got = abs(geodesic_ring_area(ring))
        # exact excess of the spherical square at authalic colatitude
        xi = np.radians(authalic_latitude(lat))

        def xyz(lon, la):
            lon = np.radians(lon)
            return np.array([np.cos(la) * np.cos(lon), np.cos(la) * np.sin(lon), np.sin(la)])

        A, B, C = xyz(270, xi), xyz(0, xi), xyz(90, xi)

        def tangent(P, Q):
            t = Q - np.dot(Q, P) * P
            return t / np.linalg.norm(t)

        ang = np.arccos(np.clip(np.dot(tangent(B, A), tangent(B, C)), -1, 1))
        exp = (4 * ang - 2 * np.pi) * AUTHALIC_R2
        assert abs(got - exp) / exp < 1e-12

    def test_vs_albers_equal_area_projection(self):
        # independent oracle: project the (densified) ring through the
        # engine's ELLIPSOIDAL Albers (exactly equal-area) and shoelace
        from gdal_spark.geodesic import geodesic_ring_area
        from gdal_spark.proj import get_transformer

        verts = [(-100.0, 35.0), (-92.0, 36.5), (-90.0, 43.0), (-103.0, 44.0)]
        dense = []
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
            t = np.linspace(0, 1, 400, endpoint=False)
            dense.extend(zip(x1 + (x2 - x1) * t, y1 + (y2 - y1) * t))
        ring = np.array(dense + [dense[0]])
        got = abs(geodesic_ring_area(ring))
        t5070 = get_transformer(5070)
        ex, ey = t5070.forward(ring[:, 0], ring[:, 1])
        shoelace = 0.5 * abs(
            float(np.dot(ex[:-1], ey[1:]) - np.dot(ex[1:], ey[:-1]))
        )
        assert abs(got - shoelace) / shoelace < 1e-6

    def test_orientation_agnostic_and_holes(self):
        from gdal_spark import geom
        from gdal_spark.geodesic import geodesic_ring_area, geometry_geodesic_area

        outer = np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], dtype=float)
        a_ccw = abs(geodesic_ring_area(outer))
        a_cw = abs(geodesic_ring_area(outer[::-1]))
        assert abs(a_ccw - a_cw) < 1e-6
        # ~1 degree square near the equator ~ (111 km)^2
        assert 1.2e10 < a_ccw < 1.25e10
        g = geom.parse_wkb(geom.wkb_rect(0.0, 0.0, 1.0, 1.0))
        assert abs(geometry_geodesic_area(g) - a_ccw) / a_ccw < 1e-12

    def test_degenerate(self):
        from gdal_spark.geodesic import geodesic_ring_area

        assert geodesic_ring_area(np.array([[0.0, 0.0], [1.0, 1.0]])) == 0.0

    def test_sql_surface_area(self, spark):
        from gdal_spark import geom
        from gdal_spark.sql import execute_sql

        df = spark.createDataFrame(
            [(0, bytearray(geom.wkb_rect(0, 0, 1, 1))), (1, None)],
            "i long, g binary",
        )
        out = execute_sql(
            spark,
            "SELECT i, st_geodesic_area(g) AS a FROM t ORDER BY i",
            {"t": df},
        ).collect()
        assert 1.2e10 < out[0].a < 1.25e10
        assert out[1].a is None
