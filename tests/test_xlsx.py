"""XLSX vector driver conformance + roundtrip tests.

Conformance fixtures are byte-identical GDAL autotest DATA files (md5
provenance in tests/data/README.md); every expected value below is the
reference's own test expectation in autotest/ogr/ogr_xlsx.py:

- test.xlsx: 8 layers (9 sheets, the empty trailing one pruned),
  Feuille1 26 features (17 <row> elements + 9 r-gap empties, no
  header), Feuille7's exact 12-field type array + first-feature
  values + the unset cell on feature 2, OGR_XLSX_HEADERS=DISABLE → 3
  features, FIELD_TYPES=STRING → all strings (tests 1/2/3).
- inlineStr.xlsx under HEADERS=FORCE: 1 feature, Bl_District_t
  'text6', Lat ≈ 23.6247122 (test 6).
- not_all_columns_present.xlsx: 30 fields from a row with cells at
  A/AB/AC/AD only (test 11).
- absolute_sheet_filename.xlsx: '/xl/...' rels target (test 12, #6733).
- test_missing_row1_data.xlsx: 18 fields, 'Asset Reference' first,
  types picked from the first NON-EMPTY value per column (test 13).
- datetime.xlsx: the 10-value "2020/04/07 09:58:00".."10:42:00"
  golden incl. the 1e-3 round-to-second snap.
- cells_with_inline_formatting.xlsx: rich-text runs concatenated
  ((1,'text 2','text 3'), (2,'text 4','text5')) (#3729).
- row_without_r_attribute.xlsx / with_xml_prefix.xlsx: structural
  tolerance goldens.
"""

import datetime
import hashlib
import os

import pytest

from gdal_spark.formats.xlsx import materialize, parse_xlsx

DATA = os.path.join(os.path.dirname(__file__), "data", "xlsx")

MD5 = {
    "test.xlsx": "b66bd325f73ad12fc9027eeefd7037b7",
    "inlineStr.xlsx": "e49fa8f03cd0f94242aa88bc21963e5d",
    "cells_with_inline_formatting.xlsx":
        "b2ca4c7ca05726ee5cac4b85632c1b7e",
    "row_without_r_attribute.xlsx": "7251544a671d2ea4b2abd6bbf1f4b2b5",
    "test_missing_row1_data.xlsx": "10f9356f6b45945214ee70791d1d9856",
    "absolute_sheet_filename.xlsx": "24b816bca71ca0b286b364735cf92202",
    "with_xml_prefix.xlsx": "6f435ed5c8bb441b806d4f53a01bcb1e",
    "not_all_columns_present.xlsx": "a2bf0b3863da1a074950ce82c65d0344",
    "datetime.xlsx": "da85dca0f1baa15c6c8f52728cba77e2",
}


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def test_fixture_provenance():
    for name, md5 in MD5.items():
        assert hashlib.md5(_read(name)).hexdigest() == md5, name


class TestConformance:
    def test_layer_enumeration(self):
        sheets = parse_xlsx(_read("test.xlsx"))
        assert len(sheets) == 8
        assert sheets[0].name == "Feuille1"
        assert sheets[6].name == "Feuille7"

    def test_feuille1_feature_count(self):
        sheets = parse_xlsx(_read("test.xlsx"))
        assert not sheets[0].has_headers
        assert len(sheets[0].rows) == 26

    def test_feuille7_types_and_values(self):
        s = parse_xlsx(_read("test.xlsx"))[6]
        assert s.types == [
            "string", "integer", "real", "real", "date", "datetime",
            "real", "time", "real", "integer", "real", "datetime",
        ]
        rows = materialize(s)
        f = rows[0]
        assert f[0] == "val"
        assert f[1] == 23
        assert f[2] == 3.45
        assert f[3] == 0.52
        assert f[4] == datetime.date(2012, 1, 22)
        assert f[5] == datetime.datetime(2012, 1, 22, 18, 49, 0)
        # second feature's third field is unset
        assert rows[1][2] is None

    def test_headers_disable(self):
        sheets = parse_xlsx(_read("test.xlsx"), headers="DISABLE")
        s = [x for x in sheets if x.name == "Feuille7"][0]
        assert len(s.rows) == 3

    def test_field_types_string(self):
        sheets = parse_xlsx(_read("test.xlsx"), field_types="STRING")
        s = [x for x in sheets if x.name == "Feuille7"][0]
        assert s.types[1] == "string"

    def test_inline_str_force_headers(self):
        sheets = parse_xlsx(_read("inlineStr.xlsx"), headers="FORCE")
        s = [x for x in sheets if x.name == "inlineStr"][0]
        rows = materialize(s)
        assert len(rows) == 1
        assert rows[0][s.fields.index("Bl_District_t")] == "text6"
        assert float(rows[0][s.fields.index("Lat")]) == pytest.approx(
            23.6247122, abs=1e-5
        )

    def test_not_all_columns_present(self):
        s = parse_xlsx(_read("not_all_columns_present.xlsx"))[0]
        assert len(s.fields) == 30
        rows = materialize(s)
        for i in (0, 27, 28, 29):
            assert rows[0][i] == f"val{i + 1}"

    def test_absolute_sheet_filename(self):
        s = parse_xlsx(_read("absolute_sheet_filename.xlsx"))[0]
        assert len(s.rows) >= 1

    def test_missing_row1_data(self):
        s = parse_xlsx(_read("test_missing_row1_data.xlsx"))[0]
        assert s.name == "Sheet1"
        assert s.fields[0] == "Asset Reference"
        assert len(s.fields) == 18
        assert s.types[:7] == [
            "integer", "string", "string", "integer", "string", "date",
            "string",
        ]

    def test_datetime_golden(self):
        s = parse_xlsx(_read("datetime.xlsx"))[0]
        got = [
            r[0].strftime("%Y/%m/%d %H:%M:%S") for r in materialize(s)
        ]
        assert got == [
            "2020/04/07 09:58:00", "2020/04/07 09:58:01",
            "2020/04/07 09:58:02", "2020/04/07 09:58:03",
            "2020/04/07 09:58:04", "2020/04/07 09:58:05",
            "2020/04/07 10:03:00", "2020/04/07 10:10:00",
            "2020/04/07 10:29:00", "2020/04/07 10:42:00",
        ]

    def test_cells_with_inline_formatting(self):
        s = parse_xlsx(_read("cells_with_inline_formatting.xlsx"))[0]
        rows = materialize(s)
        assert [(r[0], r[1], r[2]) for r in rows] == [
            (1, "text 2", "text 3"),
            (2, "text 4", "text5"),
        ]

    def test_row_without_r_attribute(self):
        s = parse_xlsx(_read("row_without_r_attribute.xlsx"))[0]
        rows = materialize(s)
        assert rows[0][s.fields.index("ID")] == 1
        assert rows[0][s.fields.index("NAME")] == "TEST123"

    def test_xml_element_prefixes(self):
        s = parse_xlsx(_read("with_xml_prefix.xlsx"))[0]
        assert s.fields[:2] == ["Col1", "Col2"]
        rows = materialize(s)
        assert rows[0][0] == "foo" and rows[0][1] == "bar"


class TestSpark:
    def test_scan(self, spark):
        from gdal_spark.formats import scan_xlsx

        df = scan_xlsx(
            spark, os.path.join(DATA, "test.xlsx"), sheet="Feuille7"
        )
        types = [f.dataType.simpleString() for f in df.schema.fields]
        assert types == [
            "string", "int", "double", "double", "date", "timestamp",
            "double", "string", "double", "int", "double", "timestamp",
        ]
        rows = df.collect()
        assert len(rows) == 2
        assert rows[0][0] == "val" and rows[0][1] == 23

    def test_roundtrip(self, spark, tmp_path):
        from gdal_spark.formats import scan_xlsx, write_xlsx

        src = spark.createDataFrame(
            [
                (1, 'a<&"x', 2.5, datetime.date(2012, 1, 22),
                 datetime.datetime(2020, 4, 7, 9, 58, 3)),
                (2, "b'>", None, datetime.date(1999, 12, 31),
                 datetime.datetime(1970, 1, 1, 0, 0, 1)),
                (3, None, -0.125, None, None),
            ],
            "k int, name string, v double, d date, ts timestamp",
        ).repartition(3)
        path = str(tmp_path / "out.xlsx")
        write_xlsx(src, path, sheet_name="S1")
        back = scan_xlsx(spark, path)
        got = {r["k"]: r for r in back.collect()}
        assert got[1]["name"] == 'a<&"x'
        assert got[1]["ts"] == datetime.datetime(2020, 4, 7, 9, 58, 3)
        assert got[2]["name"] == "b'>"
        assert got[2]["v"] is None
        assert got[2]["d"] == datetime.date(1999, 12, 31)
        assert got[3]["name"] is None
        assert got[3]["v"] == -0.125

    def test_write_reads_like_reference_parts(self, spark, tmp_path):
        """The sink emits the reference writer's exact part set."""
        import zipfile

        from gdal_spark.formats import write_xlsx

        src = spark.createDataFrame([(1, "x")], "k int, s string")
        path = str(tmp_path / "parts.xlsx")
        write_xlsx(src, path)
        names = set(zipfile.ZipFile(path).namelist())
        assert {
            "[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels", "xl/styles.xml",
            "xl/sharedStrings.xml", "xl/worksheets/sheet1.xml",
        } <= names
        # and our own reader accepts it with header detection
        sheets = parse_xlsx(open(path, "rb").read())
        assert sheets[0].has_headers
        assert sheets[0].fields == ["k", "s"]
