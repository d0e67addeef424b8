"""IHO S-57 ENC driver tests (formats.iso8211 + formats.s57).

Conformance quoted from autotest/ogr/ogr_s57.py on the checked-in
fixtures (provenance in tests/data/README.md):

- 1B5X02NE.000: the 13-layer set with exact feature counts; the
  COALNE feature (RCID 1, LNAM FFFF7F4F0FB002D3, OBJL 30, AGEN
  65535) with the quoted 15-point LINESTRING; the M_QUAL POLYGON
  with the quoted 18-vertex ring, vertex-for-vertex; the SOUNDG
  MULTIPOINT Z with the quoted four soundings and QUASOU '1';
- bug1526.000: lexical-level-2 NATF (NINFOM non-empty, UCS-2LE) and
  the quoted INFORM free text;
- bug2147_3R7D0889.000: the ROADWY MULTILINESTRING with 8 parts of
  21/3/12/6/11/5/3/4 points starting at the quoted coordinates;
- fake_s57.000 / fake_s57_variant_C151.000: DSID EXPP == 2, the
  latter through the ISO 8211 C.1.5.1 zero-record-length variant;
- fake_s57_update_dsid.000 + .001: DSID update application yields
  EDTN '0', UPDN '1', UADT '20190211', ISDT '20190212'.

Reference semantics: ogr/ogrsf_frmts/s57/ + frmts/iso8211/, re-derived
from the published IHO S-57 ed. 3.1 and ISO/IEC 8211:1994 standards.
"""

import os
import struct
from collections import Counter

import pytest

from gdal_spark.formats.iso8211 import (
    Iso8211Reader,
    parse_format_controls,
)
from gdal_spark.formats.s57 import parse_s57, scan_s57

DATA = os.path.join(os.path.dirname(__file__), "data", "s57")


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def cell():
    return parse_s57(_read("1B5X02NE.000"))


def _line_pts(wkb, off=0):
    n = struct.unpack_from("<I", wkb, off + 5)[0]
    return [struct.unpack_from("<dd", wkb, off + 9 + 16 * k)
            for k in range(n)], off + 9 + 16 * n


class TestIso8211:
    def test_format_controls(self):
        fmts = parse_format_controls("(b11,b14,2b11,3A,2A(8),R(4),b11,2A)")
        assert fmts[0] == ("bu", 1) and fmts[1] == ("bu", 4)
        assert fmts[2] == fmts[3] == ("bu", 1)
        assert fmts[4] == ("A", None) and fmts[6] == ("A", None)
        assert fmts[7] == fmts[8] == ("A", 8)
        assert fmts[9] == ("A", 4)
        assert len(fmts) == 13
        assert parse_format_controls("(B(40),3b11)") == [
            ("B", 5), ("bu", 1), ("bu", 1), ("bu", 1)]
        assert parse_format_controls("(2b24)") == [("bs", 4)] * 2

    def test_ddr_defns(self):
        rdr = Iso8211Reader(_read("1B5X02NE.000"))
        assert rdr.defns["DSID"].labels[:5] == [
            "RCNM", "RCID", "EXPP", "INTU", "DSNM"]
        assert rdr.defns["SG2D"].repeating
        assert rdr.defns["SG2D"].labels == ["YCOO", "XCOO"]
        assert ("0001", "DSID") in rdr.field_tree

    def test_zero_length_variant_c151(self):
        info, feats = parse_s57(_read("fake_s57_variant_C151.000"))
        assert info.get("EXPP") == 2

    def test_fake_minimal(self):
        info, feats = parse_s57(_read("fake_s57.000"))
        assert info.get("EXPP") == 2


class TestS57Layers:
    EXPECTED = {
        "DEPARE": 4, "DEPCNT": 4, "SOUNDG": 2, "LNDELV": 2,
        "SBDARE": 2, "M_COVR": 1, "M_NSYS": 1, "M_QUAL": 1,
        "COALNE": 1, "LNDARE": 1, "SLCONS": 1, "SLOTOP": 1,
    }

    def test_layer_counts(self, cell):
        info, feats = cell
        assert Counter(f["layer"] for f in feats) == self.EXPECTED

    def test_dsid(self, cell):
        info, _ = cell
        assert info["DSNM"] == "1B5X02NE.000"
        assert info["AGEN"] == 65535
        assert info["COMF"] == 500000.0 and info["SOMF"] == 10.0
        assert info["CSCL"] == 20000

    def test_coalne_golden(self, cell):
        _, feats = cell
        f = [x for x in feats if x["layer"] == "COALNE"][0]
        assert f["rcid"] == 1 and f["objl"] == 30
        assert f["agen"] == 65535
        assert f["lnam"] == "FFFF7F4F0FB002D3"
        assert struct.unpack_from("<I", f["wkb"], 1)[0] == 2
        pts, _ = _line_pts(f["wkb"])
        gold = [(60.976834, -32.494426), (60.977182, -32.494538),
                (60.977424, -32.494774), (60.977748, -32.49504),
                (60.977916, -32.495472), (60.97793, -32.495818),
                (60.977944, -32.496178), (60.978044, -32.496476),
                (60.978002, -32.497038), (60.978002, -32.497266),
                (60.978058, -32.497494), (60.978128, -32.497732),
                (60.97827, -32.497948), (60.979102, -32.498486),
                (60.979426, -32.498666)]
        assert len(pts) == 15
        for (x, y), (gx, gy) in zip(pts, gold):
            assert abs(x - gx) < 1e-8 and abs(y - gy) < 1e-8

    def test_m_qual_golden(self, cell):
        _, feats = cell
        f = [x for x in feats if x["layer"] == "M_QUAL"][0]
        assert f["rcid"] == 15 and f["objl"] == 308
        assert f["agen"] == 65535
        assert struct.unpack_from("<I", f["wkb"], 1)[0] == 3
        nrings = struct.unpack_from("<I", f["wkb"], 5)[0]
        assert nrings == 1
        npts = struct.unpack_from("<I", f["wkb"], 9)[0]
        pts = [struct.unpack_from("<dd", f["wkb"], 13 + 16 * k)
               for k in range(npts)]
        gold = [
            (60.976834, -32.49534), (60.976834, -32.49762),
            (60.976834, -32.498666), (60.97869, -32.498666),
            (60.979426, -32.498666), (60.982152, -32.498666),
            (60.983166, -32.498666), (60.983166, -32.497558),
            (60.983166, -32.49477), (60.983166, -32.4935),
            (60.981468, -32.4935), (60.980298, -32.4935),
            (60.979474, -32.4935), (60.979016, -32.4935),
            (60.976834, -32.4935), (60.976834, -32.494426),
            (60.976834, -32.494698), (60.976834, -32.49534)]
        assert npts == 18
        for (x, y), (gx, gy) in zip(pts, gold):
            assert abs(x - gx) < 1e-8 and abs(y - gy) < 1e-8

    def test_soundg_golden(self, cell):
        _, feats = cell
        f = [x for x in feats if x["layer"] == "SOUNDG"][0]
        assert f["rcid"] == 20 and f["objl"] == 129
        assert f["agen"] == 65535
        assert f["attrs"]["QUASOU"] == "1"
        w = f["wkb"]
        assert struct.unpack_from("<I", w, 1)[0] == 1004  # MultiPoint Z
        n = struct.unpack_from("<I", w, 5)[0]
        assert n == 4
        gold = [(60.981644, -32.49449, 3.4),
                (60.981344, -32.496424, 1.4),
                (60.978142, -32.494874, -3.2),
                (60.980712, -32.495196, 1.2)]
        off = 9
        for gx, gy, gz in gold:
            assert struct.unpack_from("<BI", w, off) == (1, 1001)
            x, y, z = struct.unpack_from("<ddd", w, off + 5)
            assert abs(x - gx) < 1e-8 and abs(y - gy) < 1e-8
            assert abs(z - gz) < 1e-9
            off += 29


class TestS57Extras:
    def test_natf_lexical_level2(self):
        _, feats = parse_s57(_read("bug1526.000"))
        f = [x for x in feats if x["layer"] == "FOGSIG"][0]
        assert f["attrs"]["INFORM"] == (
            "During South winds nautophone is not always heard in S "
            "direction from lighthouse")
        nin = f["natf"].get("NINFOM", "")
        assert len(nin) >= 1
        # UCS-2 Cyrillic/Ukrainian text survived the decode
        assert any(ord(c) > 0x400 for c in nin)

    def test_multilinestring_roadwy(self):
        _, feats = parse_s57(_read("bug2147_3R7D0889.000"))
        f = [x for x in feats if x["layer"] == "ROADWY"][0]
        w = f["wkb"]
        assert struct.unpack_from("<I", w, 1)[0] == 5
        n = struct.unpack_from("<I", w, 5)[0]
        assert n == 8
        off = 9
        sizes = []
        firsts = []
        for _ in range(n):
            pts, off = _line_pts(w, off)
            sizes.append(len(pts))
            firsts.append(pts[0])
        assert sizes == [21, 3, 12, 6, 11, 5, 3, 4]
        assert abs(firsts[0][0] - 22.5659615) < 1e-7
        assert abs(firsts[0][1] - 44.5541942) < 1e-7
        assert abs(firsts[2][0] - 22.5350702) < 1e-7
        assert abs(firsts[7][0] - 22.5093748) < 1e-7

    def test_update_dsid(self):
        base = _read("fake_s57_update_dsid.000")
        upd = _read("fake_s57_update_dsid.001")
        info, _ = parse_s57(base, updates=[upd])
        assert info["EDTN"] == "0"
        assert info["UPDN"] == "1"
        assert info["UADT"] == "20190211"
        assert info["ISDT"] == "20190212"
        info0, _ = parse_s57(base)
        assert info0["EDTN"] == "28" and info0["UPDN"] == "0"


class TestS57Scan:
    def test_scan(self, spark):
        df = scan_s57(spark, os.path.join(DATA, "1B5X02NE.000"))
        rows = df.collect()
        by_layer = Counter(r.layer for r in rows)
        assert by_layer["DSID"] == 1
        for k, v in TestS57Layers.EXPECTED.items():
            assert by_layer[k] == v
        dsid = [r for r in rows if r.layer == "DSID"][0]
        assert dsid.attributes["DSNM"] == "1B5X02NE.000"
        co = [r for r in rows if r.layer == "COALNE"][0]
        assert co.lnam == "FFFF7F4F0FB002D3"
        assert co.geometry is not None

    def test_scan_glob_one_task_per_cell(self, spark):
        df = scan_s57(spark, os.path.join(DATA, "*.000"))
        # 6 base cells (updates folded into their base)
        assert df.rdd.getNumPartitions() == 6
        n = df.count()
        assert n > 100

    def test_scan_applies_updates(self, spark):
        df = scan_s57(spark, os.path.join(DATA, "fake_s57_update_dsid.000"))
        r = df.collect()[0]
        assert r.attributes["UPDN"] == "1"


class TestS57Writer:
    """Mirrors the reference's test_ogr_s57_write_1 contract: copy
    every feature of 1B5X02NE.000 into a new cell, then re-run the
    reader goldens against the copy."""

    @pytest.fixture(scope="class")
    def rewritten(self, tmp_path_factory, cell):
        from gdal_spark.formats.s57 import write_s57

        _, feats = cell
        out = str(tmp_path_factory.mktemp("s57w") / "copy.000")
        write_s57(
            [{"layer": f["layer"], "attrs": f["attrs"],
              "wkb": f["wkb"], "rcid": f["rcid"]}
             for f in feats if f["wkb"] is not None],
            out, comf=500000, somf=10)
        with open(out, "rb") as f:
            return parse_s57(f.read())

    def test_layer_counts_survive(self, rewritten):
        _, feats = rewritten
        assert Counter(f["layer"] for f in feats) == \
            TestS57Layers.EXPECTED

    def test_coalne_golden_survives(self, rewritten):
        _, feats = rewritten
        f = [x for x in feats if x["layer"] == "COALNE"][0]
        pts, _ = _line_pts(f["wkb"])
        assert len(pts) == 15
        assert abs(pts[0][0] - 60.976834) < 1e-8
        assert abs(pts[-1][1] + 32.498666) < 1e-8

    def test_m_qual_ring_survives(self, rewritten):
        _, feats = rewritten
        f = [x for x in feats if x["layer"] == "M_QUAL"][0]
        assert struct.unpack_from("<I", f["wkb"], 1)[0] == 3
        assert struct.unpack_from("<I", f["wkb"], 9)[0] == 18

    def test_soundg_survives(self, rewritten):
        _, feats = rewritten
        f = [x for x in feats if x["layer"] == "SOUNDG"
             and x["attrs"].get("QUASOU") == "1"][0]
        w = f["wkb"]
        assert struct.unpack_from("<I", w, 1)[0] == 1004
        zs = []
        off = 9
        for _ in range(struct.unpack_from("<I", w, 5)[0]):
            zs.append(struct.unpack_from("<ddd", w, off + 5)[2])
            off += 29
        assert sorted(zs) == [-3.2, 1.2, 1.4, 3.4]

    def test_ddr_reparses(self, rewritten):
        info, _ = rewritten
        assert info["COMF"] == 500000.0
        assert info["SOMF"] == 10.0
        assert info["EDTN"] == "1"
