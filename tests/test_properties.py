"""Property-based tests (hypothesis) for the geometry kernels —
algebraic identities that must hold for ALL inputs, not just fixtures.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from gdal_spark import geom
from gdal_spark.booleans import boolean_area
from gdal_spark.operators.polygonize import label_components
from gdal_spark.operators.rasterize import fill_spans


def rect(x0, y0, w, h):
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype=float,
    )


coords = st.floats(min_value=0.0, max_value=50.0, allow_nan=False)
sizes = st.floats(min_value=0.5, max_value=30.0, allow_nan=False)


rects = st.builds(rect, coords, coords, sizes, sizes)
rect_sets = st.lists(rects, min_size=1, max_size=4)


class TestBooleanIdentities:
    @settings(max_examples=60, deadline=None)
    @given(rect_sets, rect_sets)
    def test_partition_and_demorgan(self, ra, rb):
        a = [[r] for r in ra]
        b = [[r] for r in rb]
        area_a = boolean_area(a, [], "or")
        i = boolean_area(a, b, "and")
        d = boolean_area(a, b, "a_not_b")
        u = boolean_area(a, b, "or")
        x = boolean_area(a, b, "xor")
        area_b = boolean_area(b, [], "or")
        # A = (A∩B) ⊎ (A\B)
        assert i + d == pytest.approx(area_a, rel=1e-9, abs=1e-6)
        # |A∪B| = |A| + |B| − |A∩B|
        assert u == pytest.approx(area_a + area_b - i, rel=1e-9, abs=1e-6)
        # xor = union − intersection
        assert x == pytest.approx(u - i, rel=1e-9, abs=1e-6)
        # symmetry
        assert boolean_area(b, a, "and") == pytest.approx(i, rel=1e-9, abs=1e-6)

    @settings(max_examples=30, deadline=None)
    @given(rect_sets)
    def test_self_identities(self, ra):
        a = [[r] for r in ra]
        area = boolean_area(a, [], "or")
        assert boolean_area(a, a, "and") == pytest.approx(area, rel=1e-9, abs=1e-6)
        assert boolean_area(a, a, "xor") == pytest.approx(0.0, abs=1e-6)
        assert boolean_area(a, a, "a_not_b") == pytest.approx(0.0, abs=1e-6)


class TestWktRoundTrip:
    @settings(max_examples=40, deadline=None)
    @given(rect_sets)
    def test_wkt_geojson_wkb_stable(self, ra):
        g = geom.Geometry(geom.WKB_MULTIPOLYGON, [[r] for r in ra])
        wkb0 = geom.geometry_to_wkb(g)
        via_wkt = geom.geometry_to_wkb(geom.parse_wkt(geom.geometry_to_wkt(g)))
        via_json = geom.geometry_to_wkb(
            geom.parse_geojson(geom.geometry_to_geojson(g))
        )
        assert wkb0 == via_wkt == via_json


class TestRasterizePolygonizeInverse:
    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.tuples(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=2, max_value=10),
        st.integers(min_value=2, max_value=10),
    ), min_size=1, max_size=3))
    def test_burned_pixels_equal_labeled_pixels(self, specs):
        """rasterize -> label_components: total labeled pixel count ==
        burned mask count, for any set of integer-aligned rects."""
        mask = np.zeros((32, 32))
        for x0, y0, w, h in specs:
            ring = rect(float(x0), float(y0), float(w), float(h))
            m = fill_spans([ring], 32, 32)
            mask[m] = 1.0
        labels, n = label_components(mask, exclude=(0.0,))
        assert (labels > 0).sum() == (mask > 0).sum()
        # integer-aligned rects: burned count == clipped area
        if len(specs) == 1:
            x0, y0, w, h = specs[0]
            expect = max(0, min(32, x0 + w) - x0) * max(0, min(32, y0 + h) - y0)
            assert (mask > 0).sum() == expect


class TestLayerAlgebraEdgeCases:
    def test_erase_full_cover_drops_row(self, spark):
        from gdal_spark.operators.layer_algebra import layer_erase

        def layer(fid, r):
            wkb = geom.wkb_polygon([r])
            g = geom.parse_wkb(wkb)
            return (fid, bytearray(wkb), *g.envelope())

        sch = "fid long, wkb binary, minx double, miny double, maxx double, maxy double"
        inputs = spark.createDataFrame([layer(1, rect(2, 2, 4, 4))], sch)
        methods = spark.createDataFrame([layer(9, rect(0, 0, 100, 100))], sch)
        assert layer_erase(inputs, methods).count() == 0

    def test_identical_layers_union_is_pieces_only(self, spark):
        from gdal_spark.operators.layer_algebra import layer_union

        def layer(fid, r):
            wkb = geom.wkb_polygon([r])
            g = geom.parse_wkb(wkb)
            return (fid, bytearray(wkb), *g.envelope())

        sch = "fid long, wkb binary, minx double, miny double, maxx double, maxy double"
        a = spark.createDataFrame([layer(1, rect(0, 0, 10, 10))], sch)
        b = spark.createDataFrame([layer(2, rect(0, 0, 10, 10))], sch)
        out = layer_union(a, b).collect()
        # identical geometry: one intersection piece, no remainders
        assert len(out) == 1
        assert out[0].area == pytest.approx(100.0)
        assert out[0].in_fid == 1 and out[0].m_fid == 2


class TestPolygonizeValueBoundaries:
    def test_different_values_touching_across_tiles_stay_separate(self, spark):
        from gdal_spark.operators.polygonize import polygonize_tiles

        arr = np.zeros((32, 32))
        arr[:, :16] = 1.0
        arr[:, 16:] = 2.0  # touching exactly at the tile boundary
        rows = []
        for ty in range(2):
            for tx in range(2):
                sub = arr[ty * 16 : ty * 16 + 16, tx * 16 : tx * 16 + 16]
                rows.append((tx, ty, 16, 16, bytearray(sub.tobytes())))
        tiles = spark.createDataFrame(
            rows, "tile_x int, tile_y int, w int, h int, data binary"
        )
        out = polygonize_tiles(
            tiles, (0.0, 1.0, 0.0, 32.0, 0.0, -1.0), tile_size=16, exclude=(0.0,)
        ).collect()
        assert len(out) == 2
        assert sorted((r.value, r.n_pixels) for r in out) == [
            (1.0, 512), (2.0, 512)
        ]


class TestGeodesicProperties:
    """Vincenty inverse identities over the non-antipodal domain."""

    pts = st.tuples(
        st.floats(min_value=-179.0, max_value=179.0, allow_nan=False),
        st.floats(min_value=-84.0, max_value=84.0, allow_nan=False),
    )
    deltas = st.tuples(
        st.floats(min_value=-30.0, max_value=30.0, allow_nan=False),
        st.floats(min_value=-30.0, max_value=30.0, allow_nan=False),
    )

    @settings(max_examples=80, deadline=None)
    @given(pts, deltas)
    def test_symmetric_nonnegative_zero_iff_equal(self, p, d):
        from gdal_spark.geodesic import vincenty_inverse

        lon1, lat1 = p
        lon2 = lon1 + d[0]
        lat2 = float(np.clip(lat1 + d[1], -84.0, 84.0))
        d12 = float(vincenty_inverse(lon1, lat1, lon2, lat2))
        d21 = float(vincenty_inverse(lon2, lat2, lon1, lat1))
        assert d12 >= 0.0
        assert abs(d12 - d21) < 1e-6
        if (lon1, lat1) == (lon2, lat2):
            assert d12 == 0.0
        # sandwiched by the ellipsoid's curvature extremes: min meridian
        # radius a(1-e^2) ~ 6335439 (equator), max a^2/b ~ 6399594 (pole)
        # times the auxiliary-sphere central angle (with 0.5% slack for
        # the angle living on the sphere, not the ellipsoid)
        p1, p2 = np.radians([lat1, lat2])
        dl = np.radians(lon2 - lon1)
        # haversine form: stable for tiny separations (arccos loses ~1e-8
        # rad at cos ~ 1, which dwarfs a centimeters-scale distance)
        h = np.sin((p2 - p1) / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
        central = float(2.0 * np.arcsin(np.sqrt(np.clip(h, 0, 1))))
        assert 0.995 * 6335439.0 * central - 1e-3 <= d12
        assert d12 <= 1.005 * 6399594.0 * central + 1e-3


class TestApproxTransformProperties:
    """The -et approximation honors its error bound for smooth random
    quadratic transforms and is exact for affine ones."""

    co = st.floats(min_value=-2.0, max_value=2.0, allow_nan=False)

    @settings(max_examples=40, deadline=None)
    @given(co, co, co, co, co, co)
    def test_quadratic_error_bound(self, a, b, c, d, e, f):
        from gdal_spark.operators.warp import _approx_grid_transform

        def fn(x, y):
            x = np.asarray(x, dtype=np.float64) / 64.0
            y = np.asarray(y, dtype=np.float64) / 64.0
            return (
                a * x * x + b * x * y + c * y + x * 64.0,
                d * y * y + e * x + f * y * x + y * 64.0,
            )

        xv = np.arange(96, dtype=np.float64)
        yv = np.arange(80, dtype=np.float64)
        ax, ay = _approx_grid_transform(fn, xv, yv, max_err=0.25, step=8)
        ex, ey = fn(*np.meshgrid(xv, yv))
        err = np.hypot(ax - ex, ay - ey)
        # quadratic curvature within a cell is bounded by the midpoint
        # deviation the validator measures; allow the standard 2x factor
        # between midpoint error and worst in-cell error
        assert float(err.max()) <= 2.0 * 0.25 + 1e-9
