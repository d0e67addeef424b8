"""AVC E00 driver tests (formats.avce00).

Conformance quoted from autotest/ogr/ogr_avc.py on the checked-in
fixtures (provenance in tests/data/README.md): test.e00 ARC layer
UserIDs 1..7 with the quoted first-arc LINESTRING; testpoly.e00
PAL layer of 3 polygons (universe skipped) whose last feature has
ArcIds [-4,-5], PAT AREA 9939.059 and the quoted POLYGON
vertex-for-vertex; testpoint.e00's 80 label points with
ValueId == WELLS-ID == 80 from the fixed-width IFO table decode;
compressed (EXP 1) exports rejected like the reference.
"""

import os
import struct

import pytest

from gdal_spark.formats.avce00 import (
    e00_features,
    parse_e00,
    scan_avce00,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "avc")


def _feats(name):
    with open(os.path.join(DATA, name), encoding="latin-1") as f:
        return e00_features(f.read())


class TestAvcE00:
    def test_arc_goldens(self):
        arcs = [f for f in _feats("test.e00") if f["layer"] == "ARC"]
        assert [f["attrs"]["UserID"] for f in arcs] == \
            [str(i) for i in range(1, 8)]
        w = arcs[0]["wkb"]
        n = struct.unpack_from("<I", w, 5)[0]
        pts = [struct.unpack_from("<dd", w, 9 + 16 * k)
               for k in range(n)]
        gold = [(340099.875, 4100200.0), (340400.0625, 4100399.5),
                (340900.125, 4100200.0), (340700.03125, 4100199.5)]
        assert len(pts) == 4
        for (x, y), (gx, gy) in zip(pts, gold):
            assert abs(x - gx) < 0.01 and abs(y - gy) < 0.01

    def test_pal_goldens(self):
        pals = [f for f in _feats("testpoly.e00")
                if f["layer"] == "PAL"]
        assert len(pals) == 3
        last = pals[-1]
        assert last["attrs"]["ArcIds"] == "-4,-5"
        assert float(last["attrs"]["AREA"]) == \
            pytest.approx(9939.059, abs=1e-3)
        w = last["wkb"]
        npts = struct.unpack_from("<I", w, 9)[0]
        pts = [struct.unpack_from("<dd", w, 13 + 16 * k)
               for k in range(npts)]
        gold = [(340700.03, 4100199.5), (340500.0, 4100199.8),
                (340599.97, 4100100.2), (340700.03, 4100199.5)]
        assert npts == 4
        for (x, y), (gx, gy) in zip(pts, gold):
            assert abs(x - gx) < 0.01 and abs(y - gy) < 0.01

    def test_point_pat_join(self):
        labs = [f for f in _feats("testpoint.e00")
                if f["layer"] == "LAB"]
        assert len(labs) == 80
        assert labs[-1]["attrs"]["ValueId"] == "80"
        assert labs[-1]["attrs"]["WELLS-ID"] == "80"

    def test_compressed_rejected(self):
        with open(os.path.join(DATA, "compressed.e00"),
                  encoding="latin-1") as f:
            text = f.read()
        with pytest.raises(ValueError, match="compressed"):
            parse_e00(text)

    def test_scan(self, spark):
        df = scan_avce00(spark, os.path.join(DATA, "test*.e00"))
        rows = df.collect()
        by = {}
        for r in rows:
            by.setdefault((r.source, r.layer), []).append(r)
        assert len(by[("testpoint.e00", "LAB")]) == 80
        assert len(by[("testpoly.e00", "PAL")]) == 3
