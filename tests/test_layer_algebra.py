"""Layer algebra (convex intersection/clip) vs analytic oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import geom
from gdal_spark.operators.layer_algebra import (
    clip_ring_convex,
    layer_clip,
    layer_intersection,
)


def rect_ring(minx, miny, maxx, maxy):
    return np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
        dtype=float,
    )


class TestClipKernel:
    def test_rect_rect_intersection_area(self):
        out = clip_ring_convex(rect_ring(0, 0, 4, 4), rect_ring(2, 2, 6, 6))
        a, _ = geom.ring_area_centroid(out)
        assert abs(abs(a) - 4.0) < 1e-12  # 2x2 overlap

    def test_disjoint_is_none(self):
        assert clip_ring_convex(rect_ring(0, 0, 1, 1), rect_ring(5, 5, 6, 6)) is None

    def test_contained_returns_subject(self):
        out = clip_ring_convex(rect_ring(1, 1, 2, 2), rect_ring(0, 0, 10, 10))
        a, _ = geom.ring_area_centroid(out)
        assert abs(abs(a) - 1.0) < 1e-12

    def test_triangle_square(self):
        tri = np.array([[0, 0], [4, 0], [0, 4], [0, 0]], dtype=float)
        out = clip_ring_convex(tri, rect_ring(0, 0, 2, 2))
        a, _ = geom.ring_area_centroid(out)
        # triangle clipped to [0,2]^2: area = 4 - 0.5*2*2/... compute:
        # region x,y>=0, x+y<=4 within [0,2]^2 is the full square (max x+y=4)
        assert abs(abs(a) - 4.0) < 1e-12

    def test_cw_clip_ring_normalized(self):
        cw = rect_ring(2, 2, 6, 6)[::-1].copy()
        out = clip_ring_convex(rect_ring(0, 0, 4, 4), cw)
        a, _ = geom.ring_area_centroid(out)
        assert abs(abs(a) - 4.0) < 1e-12


class TestLayerOps:
    @pytest.fixture(scope="class")
    def layers(self, spark):
        def row(fid, ring):
            wkb = geom.wkb_polygon([ring])
            g = geom.parse_wkb(wkb)
            return (fid, bytearray(wkb), *g.envelope())

        inputs = spark.createDataFrame(
            [
                row(1, rect_ring(0, 0, 4, 4)),
                row(2, rect_ring(10, 10, 14, 14)),
                row(3, np.array([[20, 0], [24, 0], [22, 4], [20, 0]], dtype=float)),
            ],
            "fid long, wkb binary, minx double, miny double, maxx double, maxy double",
        )
        methods = spark.createDataFrame(
            [
                row(100, rect_ring(2, 2, 12, 12)),
                row(200, rect_ring(21, 1, 30, 2)),
            ],
            "fid long, wkb binary, minx double, miny double, maxx double, maxy double",
        )
        return inputs, methods

    def test_intersection_pairs_and_areas(self, spark, layers):
        inputs, methods = layers
        out = layer_intersection(inputs, methods).collect()
        got = {(r.in_fid, r.m_fid): r.area for r in out}
        assert abs(got[(1, 100)] - 4.0) < 1e-9  # [2,4]^2
        assert abs(got[(2, 100)] - 4.0) < 1e-9  # [10,12]^2
        assert (3, 100) not in got  # disjoint
        assert (1, 200) not in got
        # triangle vs thin rect: y in [1,2], x >= 21, under the edges
        assert (3, 200) in got

    def test_intersection_envelopes_within_both(self, spark, layers):
        inputs, methods = layers
        for r in layer_intersection(inputs, methods).collect():
            assert r.minx >= 2 - 1e-9 or r.m_fid == 200
            assert r.area > 0

    def test_clip_keeps_input_fids(self, spark, layers):
        inputs, methods = layers
        out = layer_clip(inputs, methods).collect()
        assert {r.fid for r in out} == {1, 2, 3}

    def test_first_output_geometry_valid_wkb(self, spark, layers):
        inputs, methods = layers
        r = layer_intersection(inputs, methods).orderBy("in_fid", "m_fid").first()
        g = geom.parse_wkb(bytes(r.wkb))
        assert g.kind == geom.WKB_POLYGON and len(g.parts[0]) >= 4
