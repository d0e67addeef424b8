"""OpenFileGDB read-driver conformance tests, pinned against REAL
reference autotest FileGDB datasets (tests/data/filegdb/, md5
provenance in tests/data/README.md) and the feature content the
reference's own test suite documents (autotest/ogr/ogr_openfilegdb.py
creation script: 5 features per geometry layer with id 1..5,
str 'foo_é', smallint -13, int 123, float 1.5, real 4.56,
adate 2013-12-26T12:34:56, guid {12345678-9ABC-DEF0-1234-567890ABCDEF},
binary 00FF7F, nullint NULL)."""

import datetime
import os

import numpy as np
import pytest

from gdal_spark import geom
from gdal_spark.formats import filegdb as F

GDB = os.path.join(os.path.dirname(__file__), "data", "filegdb",
                   "testopenfilegdb.gdb")
SPARSE = os.path.join(os.path.dirname(__file__), "data", "filegdb",
                      "sparse.gdb")
GOLDEN = os.path.join(os.path.dirname(__file__), "data", "filegdb",
                      "polygon_golden.gdb")


def wkt_of(path, meta, row):
    gf = meta["geom_field"]
    w = F.shape_to_wkb(row[gf["name"]], gf)
    return None if w is None else geom.geometry_to_wkt(geom.parse_wkb(w))


class TestCatalog:
    def test_list_layers(self):
        layers = F.list_layers(GDB)
        for expected in ("point", "linestring", "polygon", "multipolygon",
                         "several_polygons", "hole", "big_layer",
                         "testnotnullable"):
            assert expected in layers
        assert not any(n.startswith("GDB_") for n in layers)

    def test_layer_info(self):
        info = F.layer_info(GDB, "polygon")
        assert info["features"] == 5
        assert info["extent"] == (0.0, 0.0, 1.0, 1.0)
        assert "GCS_WGS_1984" in info["srs_wkt"]
        names = [n for n, _t, _n in info["fields"]]
        assert names[:4] == ["SHAPE", "OBJECTID", "id", "str"]


class TestAttributes:
    def test_documented_values(self):
        layers = F.list_layers(GDB)
        fid, row = next(F.read_rows(layers["point"]))
        assert fid == 1
        assert row["id"] == 1 and row["str"] == "foo_é"
        assert row["smallint"] == -13 and row["int"] == 123
        assert row["float"] == 1.5 and row["real"] == 4.56
        assert row["guid"] == "{12345678-9ABC-DEF0-1234-567890ABCDEF}"
        assert row["xml"] == "<foo></foo>"
        assert row["binary"] == b"\x00\xff\x7f"
        assert row["binary2"] == b"\x12\x34\x56"
        assert row["nullint"] is None
        assert datetime.datetime.fromtimestamp(
            row["adate"], datetime.timezone.utc
        ) == datetime.datetime(2013, 12, 26, 12, 34, 56,
                               tzinfo=datetime.timezone.utc)

    def test_big_layer_real_cycle(self):
        # big_layer: 341 rows, real = i % 4 (creation script)
        layers = F.list_layers(GDB)
        rows = list(F.read_rows(layers["big_layer"]))
        assert len(rows) == 341
        for fid, row in rows:
            assert row["real"] == (fid - 1) % 4

    def test_deleted_feature_skipped(self):
        # 'hole' layer: DeleteFeature(1) in the creation script
        layers = F.list_layers(GDB)
        fids = [fid for fid, _ in F.read_rows(layers["hole"])]
        assert 1 not in fids and fids[0] == 2 and len(fids) == 12


class TestGeometries:
    @pytest.mark.parametrize(
        "layer,expected",
        [
            ("point", "POINT (1 2)"),
            ("linestring", "LINESTRING (1 2, 3 4)"),
            ("polygon", "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
            ("multipoint", "MULTIPOINT ((1 2), (3 4))"),
            (
                "multilinestring_multipart",
                "MULTILINESTRING ((1 2, 3 4), (5 6, 7 8))",
            ),
            (
                "multipolygon",
                "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0), "
                "(0.25 0.25, 0.75 0.25, 0.75 0.75, 0.25 0.75, 0.25 0.25)), "
                "((2 0, 2 1, 3 1, 3 0, 2 0)))",
            ),
            # Z/M variants parse as their XY base (engine convention)
            ("point25D", "POINT (1 2)"),
            ("pointzm", "POINT (1 2)"),
            ("linestringzm", "LINESTRING (1 2, 5 6)"),
            ("polygonzm", "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
        ],
    )
    def test_geometry_parity(self, layer, expected):
        layers = F.list_layers(GDB)
        meta = F.parse_table_meta(layers[layer])
        fid, row = next(F.read_rows(layers[layer]))
        got = wkt_of(layers[layer], meta, row)
        ge = geom.parse_wkt(expected)
        gg = geom.parse_wkb(
            F.shape_to_wkb(row[meta["geom_field"]["name"]],
                           meta["geom_field"])
        )
        assert gg.kind == ge.kind, (layer, got)
        ca = np.concatenate([np.asarray(c).ravel() for c in _coords(gg)])
        cb = np.concatenate([np.asarray(c).ravel() for c in _coords(ge)])
        np.testing.assert_allclose(ca, cb, atol=1e-9), (layer, got)

    def test_null_and_empty(self):
        layers = F.list_layers(GDB)
        for lyr in ("null_polygon", "empty_polygon", "empty_multipoint"):
            meta = F.parse_table_meta(layers[lyr])
            fid, row = next(F.read_rows(layers[lyr]))
            gf = meta["geom_field"]
            assert F.shape_to_wkb(row[gf["name"]], gf) is None

    def test_multipatch_reads_as_null(self):
        layers = F.list_layers(GDB)
        meta = F.parse_table_meta(layers["multipatch"])
        fid, row = next(F.read_rows(layers["multipatch"]))
        gf = meta["geom_field"]
        assert F.shape_to_wkb(row[gf["name"]], gf) is None

    def test_several_polygons_grid(self):
        # creation script: unit squares at (2i, 2j), i,j in 0..2
        layers = F.list_layers(GDB)
        meta = F.parse_table_meta(layers["several_polygons"])
        for fid, row in F.read_rows(layers["several_polygons"]):
            g = geom.parse_wkb(
                F.shape_to_wkb(row[meta["geom_field"]["name"]],
                               meta["geom_field"])
            )
            area, (cx, cy) = geom.polygon_area_centroid(g.polygons())
            i, j = (fid - 1) // 3, (fid - 1) % 3
            assert abs(area - 1.0) < 1e-9
            assert abs(cx - (2 * i + 0.5)) < 1e-9
            assert abs(cy - (2 * j + 0.5)) < 1e-9


def _coords(g):
    out = []
    if g.kind in (geom.WKB_POLYGON, geom.WKB_MULTIPOLYGON):
        for poly in g.polygons():
            out.extend(poly)
    else:
        parts = g.parts
        if g.kind == geom.WKB_POINT:
            return [np.asarray(parts, dtype=np.float64).ravel()]
        out = [np.asarray(p, dtype=np.float64) for p in parts]
    return out


class TestSparseBlockMap:
    def test_sparse_fids_match_reference(self):
        # ogr_openfilegdb.py test_ogr_openfilegdb_16 expected sequence
        layers = F.list_layers(SPARSE)
        path = layers["ogr_fgdb_20"]
        total, osize, bm, nb = F.read_tablx_meta(
            path.replace(".gdbtable", ".gdbtablx")
        )
        assert bm is not None and total == 10000001
        fids = [fid for fid, _ in F.read_rows(path)]
        assert fids == [2, 3, 4, 7, 8, 9, 10, 2049, 8191, 16384,
                        10000000, 10000001]

    def test_range_reads_compose(self):
        layers = F.list_layers(SPARSE)
        path = layers["ogr_fgdb_20"]
        fids = []
        for lo in range(0, 10000001, 2500000):
            hi = min(lo + 2500000, 10000001)
            fids += [fid for fid, _ in F.read_rows(path, lo, hi)]
        assert fids == [2, 3, 4, 7, 8, 9, 10, 2049, 8191, 16384,
                        10000000, 10000001]


class TestGolden:
    def test_polygon_golden(self):
        layers = F.list_layers(GOLDEN)
        meta = F.parse_table_meta(layers["OGRGeoJSON"])
        rows = list(F.read_rows(layers["OGRGeoJSON"]))
        assert len(rows) == 1
        fid, row = rows[0]
        assert row["foo"] == "bar"
        got = wkt_of(layers["OGRGeoJSON"], meta, row)
        assert got == "POLYGON ((0 0, 0 1, 1 0, 0 0))"


class TestScan:
    def test_scan_distributed(self, spark):
        from gdal_spark.formats.filegdb import scan_filegdb

        df = scan_filegdb(spark, GDB, "point", num_partitions=3)
        pdf = df.orderBy("fid").toPandas()
        assert list(pdf["fid"]) == [1, 2, 3, 4, 5]
        assert list(pdf["id"]) == [1, 2, 3, 4, 5]
        assert set(pdf["str"]) == {"foo_é"}
        assert set(pdf["guid"]) == {"{12345678-9ABC-DEF0-1234-567890ABCDEF}"}
        xs = [geom.parse_wkb(bytes(w)).parts for w in pdf["geometry"]]
        assert all(abs(float(np.asarray(p).ravel()[0]) - 1) < 1e-9
                   for p in xs)

    def test_scan_sparse_distributed(self, spark):
        from gdal_spark.formats.filegdb import scan_filegdb

        df = scan_filegdb(spark, SPARSE, "ogr_fgdb_20", num_partitions=16)
        fids = [r.fid for r in df.select("fid").orderBy("fid").collect()]
        assert fids == [2, 3, 4, 7, 8, 9, 10, 2049, 8191, 16384,
                        10000000, 10000001]

    def test_scan_partition_invariance(self, spark):
        from gdal_spark.formats.filegdb import scan_filegdb

        a = scan_filegdb(spark, GDB, "several_polygons",
                         num_partitions=1).orderBy("fid").toPandas()
        b = scan_filegdb(spark, GDB, "several_polygons",
                         num_partitions=7).orderBy("fid").toPandas()
        assert list(a["fid"]) == list(b["fid"])
        assert all(bytes(x) == bytes(y)
                   for x, y in zip(a["geometry"], b["geometry"]))
