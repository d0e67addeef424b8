"""Line/point layer algebra vs brute-force oracles.

Reference semantics: OGRLayer Intersection/Clip/Erase on line and point
input layers (ogr/ogrsf_frmts/generic/ogrlayer.cpp, incl. the
KEEP_LOWER_DIMENSION_GEOMETRIES line results; autotest model
ogr/ogr_layeralg.py).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import geom
from gdal_spark.operators.line_algebra import (
    clip_polyline,
    line_layer_clip,
    line_layer_erase,
    line_layer_intersection,
    point_layer_clip,
    wkb_multilinestring,
)


def _rects(n, seed=3):
    """Deterministic rectangles (may overlap)."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        x0, y0 = rng.uniform(0, 80, 2)
        w, h = rng.uniform(5, 20, 2)
        out.append((i, float(x0), float(y0), float(x0 + w), float(y0 + h)))
    return out


def _lines(n, seed=5):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        k = rng.integers(2, 5)
        pts = rng.uniform(-10, 110, (k, 2))
        out.append((1000 + i, pts))
    return out


def _rect_rings(r):
    _i, x0, y0, x1, y1 = r
    return [np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], float)]


def _layer_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "fid long, wkb binary, minx double, miny double, maxx double, maxy double",
    )


@pytest.fixture(scope="module")
def layers(spark):
    rects = _rects(12)
    lines = _lines(20)
    poly_rows = [
        (i, bytearray(geom.wkb_rect(x0, y0, x1, y1)), x0, y0, x1, y1)
        for i, x0, y0, x1, y1 in rects
    ]
    line_rows = []
    for fid, pts in lines:
        line_rows.append(
            (
                fid,
                bytearray(geom.wkb_linestring(pts)),
                float(pts[:, 0].min()),
                float(pts[:, 1].min()),
                float(pts[:, 0].max()),
                float(pts[:, 1].max()),
            )
        )
    return (
        _layer_df(spark, line_rows),
        _layer_df(spark, poly_rows),
        lines,
        rects,
    )


def _brute_len_inside(pts, rect_list):
    polys = [_rect_rings(r) for r in rect_list]
    _pieces, L = clip_polyline(pts, polys, True)
    return L


class TestLineAlgebra:
    def test_clip_lengths_match_brute_force(self, layers):
        ldf, pdf, lines, rects = layers
        got = {
            r["fid"]: r["length"]
            for r in line_layer_clip(ldf, pdf).collect()
        }
        for fid, pts in lines:
            expect = _brute_len_inside(pts, rects)
            if expect <= 0:
                assert fid not in got
            else:
                assert got[fid] == pytest.approx(expect, rel=1e-9), fid

    def test_erase_complements_clip(self, layers):
        ldf, pdf, lines, _rects = layers
        clip = {r["fid"]: r["length"] for r in line_layer_clip(ldf, pdf).collect()}
        erase = {r["fid"]: r["length"] for r in line_layer_erase(ldf, pdf).collect()}
        for fid, pts in lines:
            total = float(np.hypot(*(np.diff(pts, axis=0).T)).sum())
            assert clip.get(fid, 0.0) + erase.get(fid, 0.0) == pytest.approx(
                total, rel=1e-9
            ), fid

    def test_pairwise_intersection(self, layers):
        ldf, pdf, lines, rects = layers
        rows = line_layer_intersection(ldf, pdf).collect()
        got = {(r["in_fid"], r["m_fid"]): r["length"] for r in rows}
        for fid, pts in lines:
            for r in rects:
                expect = _brute_len_inside(pts, [r])
                key = (fid, r[0])
                if expect <= 0:
                    assert key not in got
                else:
                    assert got[key] == pytest.approx(expect, rel=1e-9), key

    def test_output_wkb_parses_and_lengths_agree(self, layers):
        ldf, pdf, _lines, _rects = layers
        for r in line_layer_clip(ldf, pdf).collect():
            g = geom.parse_wkb(bytes(r["wkb"]))
            assert g.kind == geom.WKB_MULTILINESTRING
            L = sum(
                float(np.hypot(*(np.diff(np.asarray(p), axis=0).T)).sum())
                for p in g.parts
            )
            assert L == pytest.approx(r["length"], rel=1e-9)

    def test_hole_polygon(self, spark):
        """Line through a square with a hole: only the annulus counts."""
        outer = geom.wkb_rect(0, 0, 10, 10)
        og = geom.parse_wkb(outer).polygons()[0][0]
        hole = np.array([(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)], float)[::-1]
        poly = geom.wkb_polygon([og, hole])
        pdf = _layer_df(spark, [(0, bytearray(poly), 0.0, 0.0, 10.0, 10.0)])
        pts = np.array([(-5, 5), (15, 5)], float)
        ldf = _layer_df(
            spark, [(1, bytearray(geom.wkb_linestring(pts)), -5.0, 5.0, 15.0, 5.0)]
        )
        out = line_layer_clip(ldf, pdf).collect()
        assert len(out) == 1
        assert out[0]["length"] == pytest.approx(6.0)
        g = geom.parse_wkb(bytes(out[0]["wkb"]))
        assert len(g.parts) == 2  # two annulus crossings


class TestPointAlgebra:
    def test_clip_and_erase_partition_points(self, spark):
        rng = np.random.default_rng(11)
        rects = _rects(8, seed=9)
        poly_rows = [
            (i, bytearray(geom.wkb_rect(x0, y0, x1, y1)), x0, y0, x1, y1)
            for i, x0, y0, x1, y1 in rects
        ]
        pdf = _layer_df(spark, poly_rows)
        pts = rng.uniform(-10, 110, (300, 2))
        pt_rows = [
            (i, bytearray(geom.wkb_point(x, y)), float(x), float(y), float(x), float(y))
            for i, (x, y) in enumerate(pts)
        ]
        ptdf = _layer_df(spark, pt_rows)

        inside = point_layer_clip(ptdf, pdf).collect()
        outside = point_layer_clip(ptdf, pdf, keep_inside=False).collect()
        assert len(inside) + len(outside) == len(pts)

        polys = [_rect_rings(r) for r in rects]
        expect_in = set()
        for i, (x, y) in enumerate(pts):
            if any(geom.points_on_surface([x], [y], rings)[0] for rings in polys):
                expect_in.add(i)
        assert {r["fid"] for r in inside} == expect_in
        assert {r["fid"] for r in outside} == set(range(len(pts))) - expect_in
