"""MicroStation DGN v7 driver tests.

Conformance quoted from autotest/ogr/ogr_dgn.py on smalltest.dgn:
feature 1 = Type 17 / Level 1 text "Demo Text" at
POINT (0.7365 4.2198); feature 2 = Type 15 / Level 2 circle stroked
to a >= 15-point LINESTRING with the quoted envelope; feature 3 =
Type 6 / Level 2 / ColorIndex 83 POLYGON with the exact quoted WKT.
Semantics: ogr/ogrsf_frmts/dgn (the published ISFF description).
Fixture provenance in tests/data/README.md.
"""

import os
import struct

import pytest

from gdal_spark.formats import dgn as D

DATA = os.path.join(os.path.dirname(__file__), "data", "dgn")


@pytest.fixture(scope="module")
def feats():
    with open(os.path.join(DATA, "smalltest.dgn"), "rb") as f:
        return D.parse_dgn(f.read())


def _pts(wkb):
    gtype = struct.unpack_from("<I", wkb, 1)[0]
    if gtype == 1:
        return [struct.unpack_from("<dd", wkb, 5)]
    if gtype == 2:
        n = struct.unpack_from("<I", wkb, 5)[0]
        return [struct.unpack_from("<dd", wkb, 9 + 16 * k)
                for k in range(n)]
    if gtype == 3:
        n = struct.unpack_from("<I", wkb, 9)[0]
        return [struct.unpack_from("<dd", wkb, 13 + 16 * k)
                for k in range(n)]
    raise AssertionError(gtype)


class TestSmalltest:
    def test_count(self, feats):
        assert len(feats) == 4

    def test_text_feature(self, feats):
        f = feats[0]
        assert (f["type"], f["level"]) == (17, 1)
        assert f["text"] == "Demo Text"
        (x, y), = _pts(f["wkb"])
        assert (x, y) == pytest.approx((0.7365, 4.2198), abs=1e-7)

    def test_circle_feature(self, feats):
        f = feats[1]
        assert (f["type"], f["level"]) == (15, 2)
        pts = _pts(f["wkb"])
        assert len(pts) >= 15
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        # the quoted envelope brackets
        assert 0.328593 <= min(xs) <= 0.328594
        assert 9.68780 <= max(xs) <= 9.68781
        assert -0.09611 <= min(ys) <= -0.09610
        assert 9.26310 <= max(ys) <= 9.26311

    def test_shape_feature(self, feats):
        f = feats[2]
        assert (f["type"], f["level"], f["color"]) == (6, 2, 83)
        exp = [(4.5355, 3.317), (4.3832, 2.6517), (4.9441, 2.5235),
               (4.832, 3.3331), (4.5355, 3.317)]
        got = _pts(f["wkb"])
        assert len(got) == 5
        for (gx, gy), (ex, ey) in zip(got, exp):
            assert (gx, gy) == pytest.approx((ex, ey), abs=1e-7)

    def test_line_feature(self, feats):
        f = feats[3]
        assert f["type"] == 3
        assert len(_pts(f["wkb"])) == 2


class TestScan:
    def test_scan(self, spark):
        df = D.scan_dgn(spark, os.path.join(DATA, "smalltest.dgn"))
        rows = sorted(df.collect(), key=lambda r: r.fid)
        assert len(rows) == 4
        assert rows[0].Text == "Demo Text"
        assert rows[0].Type == 17
        assert rows[2].ColorIndex == 83
        assert rows[2].Type == 6
