"""MapInfo TAB binary driver tests.

Conformance strategy: the reference's own autotest (ogr_mitab.py
test_ogr_mitab_41) asserts that reading all_geoms.tab produces the SAME
geometry as all_geoms.mif.golden.csv — the golden our MIF driver is
already pinned against bit-level. So the binary path here is compared
feature-by-feature against the MIF parse of the same dataset and must
agree exactly (the .map stores ints at XScale=1000 and every fixture
coordinate is a multiple of 0.001, so quantization is lossless).
all_possible_fields.tab pins the native binary .dat slot decode against
the values quoted in test_ogr_mitab_read_write_all_data_types.
"""

import os
import struct

import numpy as np
import pandas as pd
import pytest

from gdal_spark import geom
from gdal_spark.formats import tab

DATA = os.path.join(os.path.dirname(__file__), "data")


class _FakeDF:
    def __init__(self, pdf):
        self._pdf = pdf

    def toPandas(self):
        return self._pdf


def _flat(wkb):
    g = geom.parse_wkb(wkb)
    return g.kind, np.vstack(list(geom._iter_coords(g)))


class TestAllGeomsConformance:
    """all_geoms.tab (compressed + uncompressed object types, coord
    blocks, a collection) vs the golden-pinned MIF parse."""

    @pytest.fixture(scope="class")
    def pair(self):
        from gdal_spark.formats.mif import parse_mif

        _, trecs = tab.read_tab(os.path.join(DATA, "all_geoms.tab"))
        with open(os.path.join(DATA, "all_geoms.mif")) as f:
            _, mrecs = parse_mif(f.read(), None)
        return trecs, mrecs

    def test_feature_count(self, pair):
        trecs, mrecs = pair
        assert len(trecs) == len(mrecs) == 16

    def test_geometry_parity_bit_exact(self, pair):
        trecs, mrecs = pair
        for t, m in zip(trecs, mrecs):
            tk, tc = _flat(t["geometry"])
            mk, mc = _flat(m["geometry"])
            assert tk == mk
            assert tc.shape == mc.shape
            np.testing.assert_array_equal(tc, mc)

    def test_object_type_mix(self, pair):
        # symbol, custom symbol, font symbol, 3 lines, multipline_C,
        # rect, roundrect, ellipse, 2 arcs, text, multipoint_C,
        # region_C, collection_C — per the .map object walk
        trecs, _ = pair
        kinds = [geom.parse_wkb(r["geometry"]).kind for r in trecs]
        assert kinds == [1, 1, 1, 2, 2, 2, 5, 3, 3, 3, 2, 2, 1, 4, 3, 7]

    def test_collection_parts(self, pair):
        trecs, _ = pair
        g = geom.parse_wkb(trecs[15]["geometry"])
        assert g.kind == geom.WKB_GEOMETRYCOLLECTION
        assert [s.kind for s in g.parts] == [3, 2, 4]


class TestAllPossibleFields:
    """Native .dat binary slots (Integer/SmallInt/LargeInt/Float/
    Decimal/Date/Time/DateTime/Logical), values pinned by
    test_ogr_mitab_read_write_all_data_types."""

    def test_values(self):
        fields, recs = tab.read_tab(
            os.path.join(DATA, "all_possible_fields.tab"))
        assert [f[1] for f in fields] == [
            "char", "integer", "smallint", "largeint", "float",
            "decimal", "date", "time", "datetime", "logical"]
        r = recs[0]
        assert r["geometry"] is None  # aspatial dataset (no .map)
        assert r["field1"] == "test"
        assert r["Field2"] == 120
        assert r["Field3"] == 12345
        assert r["Field4"] == 123456789012345
        assert r["Field5"] == 12.34
        assert r["Field6"] == 12.34
        assert r["Field7"] == "20221231"
        assert r["Field8"] == "235900000"
        assert r["Field9"] == "20220323145600000"
        assert r["Field10"] is True
        assert recs[1]["Field10"] is False


class TestWriterRoundtrip:
    def _frame(self):
        pts = [
            geom.wkb_point(1.25, -2.5),
            geom.wkb_linestring(
                np.array([[0.0, 0.0], [1.5, 2.5], [3.0, -1.0]])),
            geom.wkb_polygon([
                np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
                np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)]),
            None,
            geom.wkb_multipolygon(
                [[np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float)],
                 [np.array([[5, 5], [6, 5], [6, 6], [5, 5]], float)]]),
        ]
        return pd.DataFrame({
            "geometry": pts,
            "name": ["a", "b", "c", None, "e"],
            "k": np.arange(5, dtype=np.int64),
            "v": np.arange(5) * 0.25,
            "flag": [True, False, True, False, True],
        })

    def test_roundtrip(self, tmp_path):
        pdf = self._frame()
        path = str(tmp_path / "rt.tab")
        tab.write_tab(_FakeDF(pdf), path)
        fields, recs = tab.read_tab(path)
        assert len(recs) == 5
        assert recs[3]["geometry"] is None
        for i, want in enumerate(pdf["geometry"]):
            got = recs[i]["geometry"]
            if want is None:
                assert got is None
                continue
            gk, gc = _flat(got)
            wk, wc = _flat(want)
            assert gk == wk
            np.testing.assert_allclose(gc, wc, atol=1e-6)
        assert [r["name"] for r in recs] == ["a", "b", "c", None, "e"]
        assert [r["k"] for r in recs] == [0, 1, 2, 3, 4]
        assert [r["flag"] for r in recs] == [True, False, True, False, True]

    def test_long_coord_stream_spans_blocks(self, tmp_path):
        # 300 vertices = 2400 coord bytes -> 5 chained 512-byte blocks
        t = np.linspace(0, 8 * np.pi, 300)
        line = np.column_stack([np.cos(t) * 100, np.sin(t) * 100])
        pdf = pd.DataFrame({
            "geometry": [geom.wkb_linestring(line)],
            "k": np.array([7], dtype=np.int64)})
        path = str(tmp_path / "long.tab")
        tab.write_tab(_FakeDF(pdf), path)
        with open(str(tmp_path / "long.map"), "rb") as f:
            raw = f.read()
        n_coord_blocks = sum(
            1 for off in range(0, len(raw), 512) if raw[off] == 3)
        assert n_coord_blocks >= 5
        _, recs = tab.read_tab(path)
        _, gc = _flat(recs[0]["geometry"])
        np.testing.assert_allclose(gc, line, atol=1e-5)

    def test_many_objects_span_object_blocks(self, tmp_path):
        n = 120  # 120 * 14-byte SYMBOL records > 492 bytes -> >1 block
        pdf = pd.DataFrame({
            "geometry": [geom.wkb_point(float(i), float(-i))
                         for i in range(n)],
            "k": np.arange(n, dtype=np.int64)})
        path = str(tmp_path / "many.tab")
        tab.write_tab(_FakeDF(pdf), path)
        with open(str(tmp_path / "many.map"), "rb") as f:
            raw = f.read()
        n_obj_blocks = sum(
            1 for off in range(512, len(raw), 512) if raw[off] == 2)
        assert n_obj_blocks >= 2
        _, recs = tab.read_tab(path)
        assert len(recs) == n
        for i, r in enumerate(recs):
            _, gc = _flat(r["geometry"])
            np.testing.assert_allclose(gc, [[float(i), float(-i)]],
                                       atol=1e-6)

    def test_deleted_object_skipped(self, tmp_path):
        # Mark fid 2's object record deleted (id bit 0x40000000) — the
        # reader must return NONE geometry for it (mitab
        # AdvanceToNextObject skips ids with the top bits set).
        pdf = pd.DataFrame({
            "geometry": [geom.wkb_point(1.0, 2.0), geom.wkb_point(3.0, 4.0)],
            "k": np.array([1, 2], dtype=np.int64)})
        path = str(tmp_path / "del.tab")
        tab.write_tab(_FakeDF(pdf), path)
        mp = str(tmp_path / "del.map")
        with open(mp, "rb") as f:
            raw = bytearray(f.read())
        # object block at 512: second SYMBOL record at 20 + 14
        off = 512 + 20 + 14 + 1
        fid, = struct.unpack_from("<i", raw, off)
        assert fid == 2
        struct.pack_into("<i", raw, off, fid | 0x40000000)
        with open(mp, "wb") as f:
            f.write(raw)
        _, recs = tab.read_tab(path)
        assert recs[0]["geometry"] is not None
        assert recs[1]["geometry"] is None


class TestSparkScan:
    def test_scan_all_geoms(self, spark):
        df = tab.scan_tab(spark, os.path.join(DATA, "all_geoms.tab"))
        rows = df.collect()
        assert len(rows) == 16
        assert sum(1 for r in rows if r.geometry is not None) == 16
        assert df.columns == ["geometry", "NAME"]

    def test_scan_typed_fields(self, spark):
        df = tab.scan_tab(spark, os.path.join(DATA,
                                              "all_possible_fields.tab"))
        assert dict(df.dtypes)["Field4"] == "bigint"
        assert dict(df.dtypes)["Field5"] == "double"
        assert dict(df.dtypes)["Field10"] == "boolean"
        rows = df.collect()
        assert rows[0].Field4 == 123456789012345
        assert rows[0].Field10 is True
        assert rows[1].Field10 is False
