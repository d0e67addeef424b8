"""ODS vector driver conformance + roundtrip tests.

Conformance fixtures are byte-identical GDAL autotest DATA files (md5
provenance asserted below); every expected value is the reference's
own test expectation in autotest/ogr/ogr_ods.py:

- test.ods: 8 layers (empty sheets removed), Feuille1 26 features no
  header, Feuille7's 12-type array + first-feature values + the unset
  cell on feature 2, HEADERS=DISABLE → 3 features, FIELD_TYPES=STRING
  (tests 1/2/3).
- test_kspread.ods: the datetime columns are STRING (kspread writes
  them as text — "22/01/2012 18:49:00"), PT-with-repeated-hour time
  workaround (kspread_1).
- testrepeatedcolatendofrow.ods: trailing repeated empty cells
  dropped; f2["vbz"]==1002, f2["b"]==0.
- multiple_text_p_elements.ods: "First line\\nSecond line".
- content_formulas.xml (bare content.xml, the reference's
  ODS:-prefix form): 32 Field%d columns, formula cells fall back to
  the formula text ("of:=[.B1]") (test 6).
"""

import datetime
import hashlib
import os

from gdal_spark.formats.ods import materialize, parse_ods

DATA = os.path.join(os.path.dirname(__file__), "data", "ods")

MD5 = {
    "test.ods": "00b40a8c5f692a8e977e18be27c7fc99",
    "test_kspread.ods": "70ff89eb2bad78f860f9df5f45927910",
    "testrepeatedcolatendofrow.ods":
        "5608376ea57dd696ebdba7c21066960f",
    "multiple_text_p_elements.ods":
        "a7ea7ea633f4d6e7236976a3774323a4",
    "content_formulas.xml": "524c3060f699c3d5fefb0329a4d6b781",
}


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def test_fixture_provenance():
    for name, md5 in MD5.items():
        assert hashlib.md5(_read(name)).hexdigest() == md5, name


class TestConformance:
    def test_layers_and_feature_counts(self):
        sheets = parse_ods(_read("test.ods"))
        assert len(sheets) == 8
        assert sheets[0].name == "Feuille1"
        assert not sheets[0].has_headers
        assert len(sheets[0].rows) == 26
        assert sheets[6].name == "Feuille7"

    def test_feuille7_types_and_values(self):
        s = parse_ods(_read("test.ods"))[6]
        assert s.types == [
            "string", "integer", "real", "real", "date", "datetime",
            "real", "time", "real", "integer", "real", "datetime",
        ]
        rows = materialize(s)
        f = rows[0]
        assert f[0] == "val" and f[1] == 23
        assert f[2] == 3.45 and f[3] == 0.52
        assert f[4] == datetime.date(2012, 1, 22)
        assert f[5] == datetime.datetime(2012, 1, 22, 18, 49, 0)
        assert f[7] == "12:34:56"
        assert rows[1][2] is None

    def test_headers_disable_and_string_types(self):
        sheets = parse_ods(_read("test.ods"), headers="DISABLE")
        s = [x for x in sheets if x.name == "Feuille7"][0]
        assert len(s.rows) == 3
        sheets = parse_ods(_read("test.ods"), field_types="STRING")
        s = [x for x in sheets if x.name == "Feuille7"][0]
        assert s.types[1] == "string"

    def test_kspread_datetimes_are_strings(self):
        sheets = parse_ods(_read("test_kspread.ods"))
        assert len(sheets) == 8
        s = sheets[6]
        assert s.types[4] == "date"
        assert s.types[5] == "string" and s.types[11] == "string"
        rows = materialize(s)
        assert rows[0][0] == "val" and rows[0][1] == 23
        assert rows[0][5] == "22/01/2012 18:49:00"

    def test_repeated_col_at_end_of_row(self):
        s = parse_ods(_read("testrepeatedcolatendofrow.ods"))[0]
        rows = materialize(s)
        assert rows[1][s.fields.index("vbz")] == 1002
        assert rows[1][s.fields.index("b")] == 0

    def test_multiple_text_p_elements(self):
        s = parse_ods(_read("multiple_text_p_elements.ods"))[0]
        rows = materialize(s)
        assert rows[1][s.fields.index("value")] == (
            "First line\nSecond line"
        )

    def test_bare_content_xml_formulas(self):
        s = parse_ods(_read("content_formulas.xml"))[0]
        assert len(s.fields) == 32
        assert s.fields[0] == "Field1"
        rows = materialize(s)
        assert rows[0][:3] == ["of:=[.B1]", "of:=[.C1]", "of:=[.A1]"]
        assert rows[3][:2] == ["1", "a"] and rows[3][2] is None


class TestSpark:
    def test_scan(self, spark):
        from gdal_spark.formats import scan_ods

        df = scan_ods(
            spark, os.path.join(DATA, "test.ods"), sheet="Feuille7"
        )
        types = [f.dataType.simpleString() for f in df.schema.fields]
        assert types == [
            "string", "int", "double", "double", "date", "timestamp",
            "double", "string", "double", "int", "double", "timestamp",
        ]
        rows = df.collect()
        assert len(rows) == 2 and rows[0][1] == 23

    def test_roundtrip(self, spark, tmp_path):
        from gdal_spark.formats import scan_ods, write_ods

        src = spark.createDataFrame(
            [
                (1, 'a<&"x', 2.5, datetime.date(2012, 1, 22),
                 datetime.datetime(2020, 4, 7, 9, 58, 3)),
                (2, "multi\nline", None, datetime.date(1999, 12, 31),
                 datetime.datetime(1970, 1, 1, 0, 0, 1)),
                (3, None, -0.125, None, None),
            ],
            "k int, name string, v double, d date, ts timestamp",
        ).repartition(2)
        path = str(tmp_path / "out.ods")
        write_ods(src, path, sheet_name="S1")
        back = scan_ods(spark, path)
        got = {r["k"]: r for r in back.collect()}
        assert got[1]["name"] == 'a<&"x'
        assert got[1]["ts"] == datetime.datetime(2020, 4, 7, 9, 58, 3)
        assert got[2]["v"] is None
        assert got[2]["d"] == datetime.date(1999, 12, 31)
        assert got[3]["name"] is None and got[3]["v"] == -0.125

    def test_package_shape(self, spark, tmp_path):
        """mimetype is the FIRST member and STORED uncompressed, per
        the OpenDocument package rules."""
        import zipfile

        from gdal_spark.formats import write_ods

        src = spark.createDataFrame([(1, "x")], "k int, s string")
        path = str(tmp_path / "p.ods")
        write_ods(src, path)
        zf = zipfile.ZipFile(path)
        infos = zf.infolist()
        assert infos[0].filename == "mimetype"
        assert infos[0].compress_type == zipfile.ZIP_STORED
        assert zf.read("mimetype") == (
            b"application/vnd.oasis.opendocument.spreadsheet"
        )
        assert "META-INF/manifest.xml" in zf.namelist()
