"""ConvexHull — monotone chain vs an independent gift-wrapping oracle,
distributed reduction parity, st_convexhull SQL surface, footprint
-convex_hull. Reference: ogr/ogrgeometry.cpp:4194 (GEOS ConvexHull),
apps/gdal_footprint_lib.cpp:88-183 (-convex_hull)."""

import numpy as np
import pytest

from gdal_spark import geom
from gdal_spark.operators.hull import (
    convex_hull_wkb,
    convex_hull_xy,
    distributed_convex_hull,
    point_in_convex_hull,
)


def giftwrap_hull(P):
    """Independent O(n*h) Jarvis-march oracle (different algorithm than
    the monotone chain under test). CCW from the lexicographic min."""
    P = np.unique(np.asarray(P, dtype=np.float64), axis=0)
    if len(P) <= 2:
        return P
    hull = []
    start = 0  # lexsorted by np.unique: row 0 is the lexicographic min
    i = start
    while True:
        hull.append(i)
        cand = (i + 1) % len(P)
        for j in range(len(P)):
            if j == i:
                continue
            cr = (P[cand, 0] - P[i, 0]) * (P[j, 1] - P[i, 1]) - (
                P[cand, 1] - P[i, 1]
            ) * (P[j, 0] - P[i, 0])
            d_c = np.hypot(*(P[cand] - P[i]))
            d_j = np.hypot(*(P[j] - P[i]))
            if cr < 0 or (cr == 0 and d_j > d_c):  # j is more clockwise
                cand = j
        i = cand
        if i == start:
            break
        if len(hull) > len(P):
            raise AssertionError("jarvis march did not terminate")
    return P[np.array(hull)]


def shoelace(h):
    x, y = h[:, 0], h[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


class TestMonotoneChain:
    @pytest.mark.parametrize("seed,n", [(1, 8), (2, 40), (3, 300), (4, 1000)])
    def test_matches_giftwrap(self, seed, n):
        rng = np.random.Generator(np.random.PCG64(seed))
        P = np.floor(rng.random((n, 2)) * 1000)  # integer coords: exact area
        got = convex_hull_xy(P)
        want = giftwrap_hull(P)
        # gift-wrap keeps collinear boundary points off (we prefer the
        # farthest); both start at the lexicographic min — compare sets+area
        assert shoelace(got) == shoelace(want)
        assert {tuple(p) for p in got} == {tuple(p) for p in want}
        # CCW from lexicographic min
        assert tuple(got[0]) == tuple(P[np.lexsort((P[:, 1], P[:, 0]))][0])
        assert shoelace(got) > 0

    def test_all_points_inside(self):
        rng = np.random.Generator(np.random.PCG64(9))
        P = rng.standard_normal((500, 2)) * 50
        h = convex_hull_xy(P)
        assert point_in_convex_hull(h, P).all()

    def test_degenerate(self):
        assert len(convex_hull_xy(np.array([[1.0, 2.0]]))) == 1
        seg = convex_hull_xy(np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]]))
        assert len(seg) == 2 and tuple(seg[0]) == (0.0, 0.0)
        assert not point_in_convex_hull(seg, np.array([[0.5, 0.5]])).any()
        dup = convex_hull_xy(np.array([[3.0, 3.0], [3.0, 3.0]]))
        assert len(dup) == 1

    def test_point_in_hull_boundary_and_outside(self):
        h = convex_hull_xy(np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]))
        q = np.array([[2.0, 2.0], [0.0, 2.0], [4.0, 4.0], [-0.001, 2.0], [5.0, 5.0]])
        assert point_in_convex_hull(h, q).tolist() == [True, True, True, False, False]


class TestDistributedHull:
    def test_matches_local(self, spark):
        rng = np.random.Generator(np.random.PCG64(21))
        P = rng.standard_normal((4000, 2)) * 1e5
        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in P], "x double, y double"
        ).repartition(16)
        got = distributed_convex_hull(df)
        want = convex_hull_xy(P)
        assert np.array_equal(got, want)

    def test_empty_and_null(self, spark):
        df = spark.createDataFrame([(None, 1.0)], "x double, y double")
        assert len(distributed_convex_hull(df)) == 0


class TestStConvexHull:
    def test_wkb_surface(self, spark):
        from gdal_spark.sql import execute_sql

        # concave L-shape -> hull is the 4-corner triangle-trimmed square
        ring = np.array(
            [[0.0, 0.0], [4.0, 0.0], [4.0, 1.0], [1.0, 1.0], [1.0, 4.0],
             [0.0, 4.0], [0.0, 0.0]]
        )
        wkb = geom.geometry_to_wkb(geom.Geometry(geom.WKB_POLYGON, [ring]))
        df = spark.createDataFrame([(wkb,)], "g binary")
        out = execute_sql(
            spark,
            "SELECT st_area(st_convexhull(g)) AS a, st_astext(st_convexhull(g)) AS t,"
            " st_convexhull(CAST(NULL AS binary)) AS n FROM layer",
            {"layer": df},
        ).collect()[0]
        # hull of the L = square minus the (3x3)/2 notch triangle: 16-4.5
        assert out.a == pytest.approx(11.5)
        assert out.t.startswith("POLYGON")
        assert out.n is None

    def test_dimension_collapse(self):
        seg = geom.Geometry(geom.WKB_LINESTRING, [np.array([[0.0, 0.0], [2.0, 2.0]])])
        h = geom.parse_wkb(convex_hull_wkb(geom.geometry_to_wkb(seg)))
        assert h.kind == geom.WKB_LINESTRING
        pt = geom.parse_wkb(convex_hull_wkb(geom.wkb_point(5.0, 6.0)))
        assert pt.kind == geom.WKB_POINT


class TestFootprintConvexHull:
    def test_option(self):
        from gdal_spark.operators.footprint import footprint_array

        # plus-shaped mask: footprint is concave; -convex_hull wraps it
        m = np.zeros((9, 9), dtype=np.uint8)
        m[3:6, :] = 1
        m[:, 3:6] = 1
        gt = (0.0, 1.0, 0.0, 9.0, 0.0, -1.0)
        polys, n, _ = footprint_array(m * 255, None, gt, nodata=0.0)
        area, _c = geom.polygon_area_centroid(polys)
        assert area == pytest.approx(9 * 3 + 3 * 3 * 2)
        hp, n2, _ = footprint_array(m * 255, None, gt, nodata=0.0, convex_hull=True)
        ha, _c = geom.polygon_area_centroid(hp)
        # hull of the plus: 9x9 square minus 4 corner triangles (each 3x3/2)
        assert ha == pytest.approx(81 - 4 * 4.5)
        assert n2 == n and len(hp) == 1 and len(hp[0]) == 1
