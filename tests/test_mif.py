"""MapInfo MIF/MID driver tests.

Conformance is pinned against the reference's OWN golden expectations:
autotest/ogr/data/mitab/all_geoms.mif.golden.csv holds the WKT the
reference driver produces for every geometry kind in all_geoms.mif —
including the TABGenerateArc duplicate-endpoint artifacts in
RoundRect/Ellipse/Arc and the rotated-text-box anchor point — so a
match here is bit-level behavioral parity, not approximation.
small.mif/.mid pin attribute parsing (quoted commas, doubled quotes,
Integer/Float casts; the expected NAME value is quoted in
autotest/ogr/ogr_mitab.py test_ogr_mitab_9).
"""

import csv
import os
import re

import numpy as np
import pytest

from gdal_spark import geom
from gdal_spark.formats.mif import parse_mif, parse_mif_header, write_mif

DATA = os.path.join(os.path.dirname(__file__), "data")


def _wkt(g):
    if g.kind == geom.WKB_GEOMETRYCOLLECTION:
        return ("GEOMETRYCOLLECTION ("
                + ",".join(_wkt(s) for s in g.parts) + ")")
    return geom.geometry_to_wkt(g)


def _sig(wkt):
    typ = re.match(r"[A-Z ]+", wkt).group(0).strip()
    nums = np.array([
        float(t) for t in re.findall(r"-?\d+\.?\d*(?:[eE]-?\d+)?", wkt)
    ])
    return typ, nums


class TestGolden:
    def test_all_geoms_vs_reference_golden(self):
        with open(os.path.join(DATA, "all_geoms.mif")) as f:
            _, recs = parse_mif(f.read(), None)
        with open(os.path.join(DATA, "all_geoms.mif.golden.csv")) as f:
            golden = list(csv.DictReader(f))
        assert len(recs) == len(golden) == 16
        for rec, g in zip(recs, golden):
            t1, n1 = _sig(_wkt(geom.parse_wkb(rec["geometry"])))
            t2, n2 = _sig(g["WKT"])
            assert t1 == t2
            assert len(n1) == len(n2)
            np.testing.assert_allclose(n1, n2, atol=1e-9)

    def test_small_attributes(self):
        with open(os.path.join(DATA, "small.mif")) as f:
            mif = f.read()
        with open(os.path.join(DATA, "small.mid")) as f:
            mid = f.read()
        hdr, recs = parse_mif(mif, mid)
        assert [c for c, _ in hdr["columns"]] == [
            "NAME", "DATA", "OWNER", "APPRAISED_VALUE", "TAXES",
            "FLOODZONE", "NUM",
        ]
        assert len(recs) == 2
        # expected values quoted in ogr_mitab.py test_ogr_mitab_9
        assert recs[0]["NAME"] == " S. 11th St."
        assert recs[1]["OWNER"] == 'Guarino "Chucky" Sandra'
        assert recs[1]["APPRAISED_VALUE"] == 62480.53
        assert isinstance(recs[1]["DATA"], int)
        g = geom.parse_wkb(recs[0]["geometry"])
        assert g.kind == geom.WKB_POLYGON
        assert len(g.parts[0]) == 6

    def test_header_defaults(self):
        hdr, data = parse_mif_header(
            "Version 300\nColumns 0\nData\nPoint 1 2\n"
        )
        assert hdr["delimiter"] == "\t" and hdr["columns"] == []
        assert data == ["Point 1 2"]


class TestWrite:
    def test_roundtrip(self, tmp_path):
        # writer round-trips through the parser without Spark
        from gdal_spark.formats.mif import (
            _geometry_mif,
            _mid_field,
        )

        geoms = [
            geom.wkb_point(1.5, -2.25),
            geom.wkb_linestring(np.array([[0.0, 0.0], [3.0, 4.0],
                                          [5.0, 5.0]])),
            geom.wkb_polygon([np.array(
                [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float
            ), np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)]),
            None,
        ]
        attrs = [("a b", 1, 2.5, True), ('say "hi"', None, -0.125, False),
                 ("", 7, 1e10, True), ("x,y", -3, 0.0, False)]
        mif = ('Version 300\nCharset "Neutral"\nDelimiter ","\n'
               "Columns 4\n  name Char (254)\n  n Integer\n  v Float\n"
               "  flag Logical\nData\n\n")
        mid = ""
        for g, a in zip(geoms, attrs):
            mif += ("None" if g is None else _geometry_mif(g)) + "\n"
            mid += ",".join(
                _mid_field(v, t) for v, t in zip(
                    a, ["Char (254)", "Integer", "Float", "Logical"]
                )
            ) + "\n"
        hdr, recs = parse_mif(mif, mid)
        assert len(recs) == 4
        assert recs[0]["name"] == "a b" and recs[0]["n"] == 1
        assert recs[1]["name"] == 'say "hi"' and recs[1]["n"] is None
        assert recs[1]["v"] == -0.125 and recs[1]["flag"] is False
        assert recs[3]["name"] == "x,y"
        assert recs[3]["geometry"] is None
        g0 = geom.parse_wkb(recs[0]["geometry"])
        assert tuple(g0.parts[0]) == (1.5, -2.25)
        g2 = geom.parse_wkb(recs[2]["geometry"])
        assert g2.kind == geom.WKB_POLYGON and len(g2.parts) == 2


class TestSpark:
    def test_scan_and_sink(self, spark, tmp_path):
        from gdal_spark.formats import scan_mif, write_mif

        rows = [
            (geom.wkb_point(float(i), float(-i)), f"f{i}", i, i * 0.5)
            for i in range(6)
        ]
        df = spark.createDataFrame(
            rows, "geometry binary, name string, n int, v double"
        )
        out = tmp_path / "layer.mif"
        paths = write_mif(df, str(out))
        assert len(paths) == 2 and os.path.exists(paths[1])
        back = scan_mif(spark, str(out))
        got = sorted(back.collect(), key=lambda r: r.n)
        assert len(got) == 6
        for i, r in enumerate(got):
            g = geom.parse_wkb(bytes(r.geometry))
            assert tuple(g.parts[0]) == (float(i), float(-i))
            assert r.name == f"f{i}" and r.v == i * 0.5

    def test_scan_autotest_pair(self, spark):
        from gdal_spark.formats import scan_mif

        rows = scan_mif(spark, os.path.join(DATA, "small.mif")).collect()
        assert len(rows) == 2
        assert {r.NAME for r in rows} == {" S. 11th St."}
        assert {r.FLOODZONE for r in rows} == {10}
