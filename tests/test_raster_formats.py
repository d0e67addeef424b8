"""PNM codec + AAIGrid driver: spec conformance and round-trips."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import codecs, fixtures, geom

pytestmark = pytest.mark.usefixtures("spark")


class TestPNM:
    def test_p5_p6_roundtrip(self):
        rng = np.random.default_rng(3)
        g = rng.integers(0, 255, size=(13, 9)).astype(np.uint8)
        rgb = rng.integers(0, 255, size=(7, 11, 3)).astype(np.uint8)
        assert np.array_equal(codecs.decode_pnm(codecs.encode_pnm(g)), g)
        assert np.array_equal(codecs.decode_pnm(codecs.encode_pnm(rgb)), rgb)

    def test_16bit_and_comments(self):
        a = (np.arange(12, dtype=np.uint16) * 4000).reshape(3, 4)
        enc = codecs.encode_pnm(a)
        assert enc.startswith(b"P5") and b"65535" in enc
        assert np.array_equal(codecs.decode_pnm(enc), a)
        # spec: comments between header tokens
        commented = b"P5\n# a comment\n4 3\n# more\n65535\n" + enc.split(b"\n", 3)[3]
        assert np.array_equal(codecs.decode_pnm(commented), a)

    def test_dispatch(self):
        g = np.zeros((4, 4), dtype=np.uint8)
        assert np.array_equal(
            codecs.decode_image(codecs.encode_image(g, "pgm"), "pnm"), g
        )
        with pytest.raises(ValueError):
            codecs.decode_pnm(b"P1\n1 1\n1\n")  # ASCII PNM not supported


class TestAAIGrid:
    GRID = (
        "ncols 4\nnrows 3\nxllcorner 100.0\nyllcorner 200.0\n"
        "cellsize 0.5\nNODATA_value -9999\n"
        "1 2 3 4\n5 -9999 7 8\n9 10 11 12\n"
    )

    def test_parse_semantics(self):
        from gdal_spark.formats.aaigrid import parse_aaigrid

        arr, gt, nodata = parse_aaigrid(self.GRID)
        assert arr.shape == (3, 4) and np.isnan(arr[1, 1])
        assert arr[0, 0] == 1.0 and arr[2, 3] == 12.0  # top row first
        # north-up gt anchored at the TOP-left corner
        assert gt == (100.0, 0.5, 0.0, 200.0 + 3 * 0.5, 0.0, -0.5)
        assert nodata == -9999.0

    def test_llcenter_shift(self):
        from gdal_spark.formats.aaigrid import parse_aaigrid

        txt = self.GRID.replace("xllcorner", "xllcenter").replace(
            "yllcorner", "yllcenter"
        )
        _a, gt, _n = parse_aaigrid(txt)
        assert gt[0] == 100.0 - 0.25 and gt[3] == 200.0 - 0.25 + 1.5

    def test_distributed_roundtrip(self, spark, tmp_path):
        from gdal_spark.formats import scan_aaigrid, write_aaigrid

        src = tmp_path / "in"
        src.mkdir()
        for i in range(5):
            rows = "\n".join(
                " ".join(str(i * 100 + y * 4 + x) for x in range(4))
                for y in range(3)
            )
            (src / f"dem{i}.asc").write_text(
                f"ncols 4\nnrows 3\nxllcorner {i * 10}\nyllcorner 0\n"
                f"cellsize 1.0\n{rows}\n"
            )
        df = scan_aaigrid(spark, str(src / "*.asc"), srid=32633)
        rows = {r.image_id: r for r in df.collect()}
        assert len(rows) == 5
        a0 = codecs.decode_image(bytes(rows["dem2"].bytes), "raw")
        assert float(a0[0, 0]) == 200.0 and float(a0[2, 3]) == 211.0
        assert rows["dem2"].gt0 == 20.0 and rows["dem2"].gt5 == -1.0
        # write back out (distributed file-per-row sink) and re-scan
        out = tmp_path / "out"
        paths = write_aaigrid(df, str(out), nodata=None)
        assert len(paths) == 5
        back = scan_aaigrid(spark, str(out / "*.asc"), srid=32633)
        b = {r.image_id: r for r in back.collect()}
        for k in rows:
            x = codecs.decode_image(bytes(rows[k].bytes), "raw")
            y = codecs.decode_image(bytes(b[k].bytes), "raw")
            assert np.array_equal(x, y)
            assert all(
                getattr(rows[k], f"gt{j}") == getattr(b[k], f"gt{j}")
                for j in range(6)
            )

    def test_dem_operator_composes(self, spark, tmp_path):
        """An AAIGrid-scanned DEM flows straight into the existing DEM
        stencil operator — the composition the driver exists for."""
        from gdal_spark.formats import scan_aaigrid
        from gdal_spark.operators.dem import dem_images

        rows = "\n".join(
            " ".join(str(x + y) for x in range(8)) for y in range(8)
        )
        (tmp_path / "p.asc").write_text(
            f"ncols 8\nnrows 8\nxllcorner 0\nyllcorner 0\ncellsize 1.0\n{rows}\n"
        )
        df = scan_aaigrid(spark, str(tmp_path / "p.asc"))
        out = dem_images(df, "slope").collect()
        assert len(out) == 1


class TestGeoParquet:
    def test_write_read_metadata_and_pushdown(self, spark, tmp_path):
        from gdal_spark.formats import (
            geoparquet_metadata,
            scan_geoparquet,
            write_geoparquet,
        )

        rows = []
        for i in range(200):
            if i % 2:
                g = geom.wkb_point(i * 1.0, -i * 0.5)
            else:
                g = geom.wkb_polygon(
                    [np.array([[i, 0], [i + 1, 0], [i + 1, 1], [i, 1]], float)]
                )
            rows.append((i, g, f"f{i}"))
        df = spark.createDataFrame(
            rows, "id bigint, geometry binary, name string"
        ).repartition(4)
        p = str(tmp_path / "gp")
        n = write_geoparquet(df, p, srid=3857)
        assert n == 200
        import glob

        files = sorted(glob.glob(p + "/part-*.parquet"))
        assert len(files) == 4  # one file per partition, task-written
        meta = geoparquet_metadata(p)
        assert meta["version"] == "1.1.0"
        assert meta["primary_column"] == "geometry"
        col = meta["columns"]["geometry"]
        assert col["encoding"] == "WKB"
        assert set(col["geometry_types"]) <= {"Point", "Polygon"}
        assert col["crs"]["id"] == {"authority": "EPSG", "code": 3857}
        assert col["covering"]["bbox"]["xmin"] == ["bbox", "xmin"]
        # per-FILE bbox covers exactly that file's rows
        import pyarrow.parquet as pq
        import json as J

        for f in files:
            t = pq.read_table(f)
            m = J.loads(
                (pq.ParquetFile(f).schema_arrow.metadata or {})[b"geo"]
            )
            bb = m["columns"]["geometry"]["bbox"]
            xs = t.column("bbox").to_pylist()
            assert min(v["xmin"] for v in xs) == bb[0]
            assert max(v["xmax"] for v in xs) == bb[2]
        back = scan_geoparquet(spark, p)
        got = {r.id: r for r in back.collect()}
        assert len(got) == 200 and got[7].name == "f7"
        g7 = geom.parse_wkb(bytes(got[7].geometry))
        assert g7.parts.ravel().tolist() == [7.0, -3.5]
        # the covering bbox column reaches the parquet scan as a pushed
        # filter (the reason the spec defines it)
        q = back.where("bbox.xmin > 100.0").select("id")
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        assert "PushedFilters" in plan and "bbox.xmin" in plan

    def test_wgs84_omits_crs_and_null_geoms(self, spark, tmp_path):
        from gdal_spark.formats import geoparquet_metadata, write_geoparquet

        df = spark.createDataFrame(
            [(1, geom.wkb_point(1.0, 2.0)), (2, None)],
            "id bigint, geometry binary",
        ).coalesce(1)
        p = str(tmp_path / "w")
        write_geoparquet(df, p, srid=4326)
        col = geoparquet_metadata(p)["columns"]["geometry"]
        assert "crs" not in col  # reference-default WGS84 omission
        assert col["bbox"] == [1.0, 2.0, 1.0, 2.0]


class TestKML:
    def test_roundtrip_and_extended_data(self, spark, tmp_path):
        from gdal_spark.formats import scan_kml, write_kml

        rows = [
            (0, geom.wkb_point(12.5, -3.25), "pt & name", "desc<1>", "a0"),
            (1, geom.wkb_linestring([[0, 0], [2, 3], [5, 3]]), None, None, "a1"),
            (
                2,
                geom.wkb_polygon(
                    [np.array([[0, 0], [8, 0], [8, 8], [0, 8]], float),
                     np.array([[3, 3], [5, 3], [5, 5], [3, 5]], float)]
                ),
                "poly", None, None,
            ),
            (
                3,
                geom.wkb_multipolygon(
                    [[np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)],
                     [np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)]]
                ),
                "mp", "d", "a3",
            ),
        ]
        df = spark.createDataFrame(
            rows, "id bigint, geometry binary, name string, "
                  "description string, tag string"
        ).drop("id").withColumn("tag2", F.lit("x"))
        p = str(tmp_path / "t.kml")
        n = write_kml(df, p, name="layer<1>")
        assert n == 4
        back = scan_kml(spark, p)
        got = sorted(back.collect(), key=lambda r: (r.name is None, r.name or ""))
        by_name = {r.name: r for r in got}
        pt = by_name["pt & name"]
        assert pt.description == "desc<1>" and pt.tag == "a0" and pt.tag2 == "x"
        g = geom.parse_wkb(bytes(pt.geometry))
        assert g.parts.ravel().tolist() == [12.5, -3.25]
        assert _poly_area_kml(by_name["poly"].geometry) == 64.0 - 4.0
        mp = geom.parse_wkb(bytes(by_name["mp"].geometry))
        assert mp.kind == geom.WKB_MULTIPOLYGON and len(mp.parts) == 2
        ln = [r for r in got if r.name is None][0]
        lg = geom.parse_wkb(bytes(ln.geometry))
        assert lg.kind == geom.WKB_LINESTRING

    def test_multi_file_fanout(self, spark, tmp_path):
        from gdal_spark.formats import scan_kml, write_kml

        for i in range(3):
            df = spark.createDataFrame(
                [(geom.wkb_point(i * 1.0, 0.0), f"f{i}")],
                "geometry binary, name string",
            )
            write_kml(df, str(tmp_path / f"k{i}.kml"))
        back = scan_kml(spark, str(tmp_path / "*.kml"))
        assert sorted(r.name for r in back.collect()) == ["f0", "f1", "f2"]


def _poly_area_kml(wkb):
    g = geom.parse_wkb(bytes(wkb))
    total = 0.0
    for rings in g.polygons():
        for j, r in enumerate(rings):
            a = 0.5 * float(
                np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
            )
            total += abs(a) if j == 0 else -abs(a)
    return total


class TestReviewFixes:
    def test_kml_google_namespace_and_edge_cases(self, spark, tmp_path):
        """2.1-namespace files, empty coordinates, MultiGeometry points,
        colliding Data names (all review findings)."""
        doc = (
            '<kml xmlns="http://earth.google.com/kml/2.1"><Document>'
            "<Placemark><name>a</name>"
            '<ExtendedData><Data name="geometry"><value>x</value></Data>'
            '<Data name="tag"><value>ok</value></Data></ExtendedData>'
            "<Point><coordinates>3,4</coordinates></Point></Placemark>"
            "<Placemark><name>b</name>"
            "<Point><coordinates></coordinates></Point></Placemark>"
            "<Placemark><name>c</name><MultiGeometry>"
            "<Point><coordinates>1,1</coordinates></Point>"
            "<Point><coordinates>2,2</coordinates></Point>"
            "</MultiGeometry></Placemark>"
            "</Document></kml>"
        )
        p = tmp_path / "g.kml"
        p.write_text(doc)
        from gdal_spark.formats import scan_kml

        rows = {r.name: r for r in scan_kml(spark, str(p)).collect()}
        assert len(rows) == 3
        ga = geom.parse_wkb(bytes(rows["a"].geometry))
        assert ga.parts.ravel().tolist() == [3.0, 4.0]  # not clobbered
        assert rows["a"].tag == "ok"
        assert rows["b"].geometry is None  # empty coords -> null, no crash
        gc = geom.parse_wkb(bytes(rows["c"].geometry))
        assert gc.kind == geom.WKB_MULTIPOINT

    def test_kml_attr_name_quoting(self, spark, tmp_path):
        from gdal_spark.formats import scan_kml, write_kml

        df = spark.createDataFrame(
            [(geom.wkb_point(1.0, 2.0), "n", 'v"q')],
            'geometry binary, name string, `a"b` string',
        )
        p = str(tmp_path / "q.kml")
        write_kml(df, p)
        r = scan_kml(spark, p).collect()[0]
        assert getattr(r, 'a"b') == 'v"q'

    def test_geoparquet_mode_and_covering_false(self, spark, tmp_path):
        from gdal_spark.formats import (
            geoparquet_metadata,
            scan_geoparquet,
            write_geoparquet,
        )

        df8 = spark.createDataFrame(
            [(i, geom.wkb_point(i * 1.0, 0.0)) for i in range(80)],
            "id bigint, geometry binary",
        ).repartition(8)
        p = str(tmp_path / "m")
        write_geoparquet(df8, p)
        import pytest as _pt

        with _pt.raises(ValueError, match="part files"):
            write_geoparquet(df8, p)  # stale parts refuse by default
        df4 = df8.where("id < 40").repartition(4)
        write_geoparquet(df4, p, mode="overwrite")
        assert scan_geoparquet(spark, p).count() == 40  # no stale rows
        # covering=False: no bbox column AND no covering in the footer
        p2 = str(tmp_path / "nc")
        write_geoparquet(df4, p2, covering=False)
        meta = geoparquet_metadata(p2)["columns"]["geometry"]
        assert "covering" not in meta and "bbox" in meta
        assert "bbox" not in scan_geoparquet(spark, p2).columns

    def test_aaigrid_per_row_nodata_roundtrip(self, spark, tmp_path):
        from gdal_spark.formats import scan_aaigrid, write_aaigrid

        # nodata -32768; the grid CONTAINS legitimate -9999 values
        (tmp_path / "g.asc").write_text(
            "ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1\n"
            "NODATA_value -32768\n-9999 5\n-32768 7\n"
        )
        df = scan_aaigrid(spark, str(tmp_path / "g.asc"))
        out = tmp_path / "o"
        write_aaigrid(df, str(out))  # must honor the row's own nodata
        back = scan_aaigrid(spark, str(out / "g.asc")).collect()[0]
        a = codecs.decode_image(bytes(back.bytes), "raw")
        assert a[0, 0] == -9999.0 and np.isnan(a[1, 0]) and a[1, 1] == 7.0

    def test_augment_lossy_checksum_matches_stored_bytes(self, spark):
        from gdal_spark.checksum import gdal_checksum
        from gdal_spark.functions.augment import augment_images

        imgs = fixtures.images_df(spark, 2, tier="t2", partitions=1)
        out = augment_images(imgs, ops=("flip_h",), out_fmt="jpg").collect()
        for r in out:
            dec = codecs.decode_image(bytes(r.bytes), r.fmt)
            if dec.ndim == 2:
                dec = dec[:, :, None]
            assert r.checksum == gdal_checksum(dec[:, :, 0].astype(np.float64))


def test_vector_tile_index(spark, tmp_path):
    """ogrtindex analog: per-file extents from HEADER bytes only (shp bbox
    words, fgb envelope, gpkg_contents, geoparquet footer)."""
    from gdal_spark.formats import (
        write_flatgeobuf,
        write_geopackage,
        write_geoparquet,
        write_shapefile,
    )
    from gdal_spark.operators.vector import vector_tile_index

    def pts(x0):
        return spark.createDataFrame(
            [(i, geom.wkb_point(x0 + i * 1.0, i * 2.0)) for i in range(10)],
            "id bigint, geometry binary",
        )

    shp = str(tmp_path / "a.shp")
    write_shapefile(pts(0.0), shp)
    fgb = str(tmp_path / "b.fgb")
    write_flatgeobuf(pts(100.0), fgb, index_node_size=16)
    gpkg = str(tmp_path / "c.gpkg")
    write_geopackage(pts(200.0), gpkg, "pts", srid=3857)
    gpq = str(tmp_path / "d")
    write_geoparquet(pts(300.0).coalesce(1), gpq)

    idx = vector_tile_index(spark, [shp, fgb, gpkg, gpq])
    rows = {r.name: r for r in idx.collect()}
    assert rows["a.shp"].minx == 0.0 and rows["a.shp"].maxx == 9.0
    assert rows["b.fgb"].minx == 100.0 and rows["b.fgb"].feature_count == 10
    assert rows["c.gpkg"].minx == 200.0 and rows["c.gpkg"].feature_count == 10
    assert rows["d"].minx == 300.0 and rows["d"].maxy == 18.0
    assert all(r.footprint.startswith("POLYGON") for r in rows.values())


class TestBMP:
    def test_roundtrip_24bit(self):
        rng = np.random.default_rng(9)
        a = rng.integers(0, 255, size=(11, 7, 3)).astype(np.uint8)  # odd width -> row pad
        enc = codecs.encode_bmp(a)
        assert enc[:2] == b"BM"
        assert np.array_equal(codecs.decode_bmp(enc), a)
        g = rng.integers(0, 255, size=(5, 6)).astype(np.uint8)
        dec = codecs.decode_bmp(codecs.encode_bmp(g))
        assert np.array_equal(dec[:, :, 0], g) and dec.shape == (5, 6, 3)

    def test_8bit_palette_and_topdown(self):
        import struct as S

        # hand-build: 2x2 8-bit palette BMP, top-down (negative height)
        pal = b"".join(bytes([b, g, r, 0]) for r, g, b in
                       [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)])
        rows = bytes([0, 1, 0, 0]) + bytes([2, 3, 0, 0])  # padded to 4
        off = 14 + 40 + len(pal)
        buf = (b"BM" + S.pack("<IHHI", off + len(rows), 0, 0, off)
               + S.pack("<IiiHHIIiiII", 40, 2, -2, 1, 8, 0, len(rows),
                        0, 0, 4, 0) + pal + rows)
        a = codecs.decode_bmp(buf)
        assert a.shape == (2, 2, 3)
        assert a[0, 0].tolist() == [255, 0, 0] and a[0, 1].tolist() == [0, 255, 0]
        assert a[1, 0].tolist() == [0, 0, 255] and a[1, 1].tolist() == [9, 9, 9]

    def test_dispatch_and_rejects(self):
        a = np.zeros((4, 4, 3), dtype=np.uint8)
        assert np.array_equal(
            codecs.decode_image(codecs.encode_image(a, "bmp"), "bmp"), a
        )
        with pytest.raises(ValueError):
            codecs.decode_bmp(b"XX")


class TestGPX:
    def test_waypoints_and_tracks_roundtrip(self, spark, tmp_path):
        from gdal_spark.formats import scan_gpx, write_gpx

        wpts = spark.createDataFrame(
            [
                (geom.wkb_point(12.5, 47.25), "summit", 1234.5, "2020-01-01T00:00:00Z"),
                (geom.wkb_point(-3.125, 50.0), None, None, None),
            ],
            "geometry binary, name string, ele double, time string",
        )
        p = str(tmp_path / "w.gpx")
        assert write_gpx(wpts, p, layer="waypoints") == 2
        back = scan_gpx(spark, p, layer="waypoints").collect()
        by = {round(geom.parse_wkb(bytes(r.geometry)).parts[0][0], 3): r for r in back}
        assert by[12.5].name == "summit" and by[12.5].ele == 1234.5
        assert by[-3.125].name is None and by[-3.125].ele is None

        mls = (
            b"\x01" + (5).to_bytes(4, "little") + (2).to_bytes(4, "little")
            + geom.wkb_linestring(np.array([[0.0, 0.0], [1.0, 1.0]]))
            + geom.wkb_linestring(np.array([[2.0, 2.0], [3.0, 3.0], [4.0, 4.0]]))
        )
        trks = spark.createDataFrame(
            [(mls, "ride")], "geometry binary, name string"
        )
        p2 = str(tmp_path / "t.gpx")
        write_gpx(trks, p2, layer="tracks")
        t = scan_gpx(spark, p2, layer="tracks").collect()[0]
        assert t.name == "ride" and t.n_points == 5
        g = geom.parse_wkb(bytes(t.geometry))
        assert g.kind == geom.WKB_MULTILINESTRING and len(g.parts) == 2

    def test_gpx10_namespace_and_routes(self, spark, tmp_path):
        doc = (
            '<gpx version="1.0" xmlns="http://www.topografix.com/GPX/1/0">'
            '<rte><name>r1</name>'
            '<rtept lat="1" lon="2"/><rtept lat="3" lon="4"/></rte></gpx>'
        )
        p = tmp_path / "r.gpx"
        p.write_text(doc)
        from gdal_spark.formats import scan_gpx

        r = scan_gpx(spark, str(p), layer="routes").collect()[0]
        assert r.name == "r1" and r.n_points == 2
        g = geom.parse_wkb(bytes(r.geometry))
        np.testing.assert_array_equal(g.parts[0], [[2.0, 1.0], [4.0, 3.0]])


class TestGML:
    def test_ogr_roundtrip(self, spark, tmp_path):
        from gdal_spark.formats import scan_gml, write_gml

        rows = [
            (0, geom.wkb_point(2.5, -7.25), "alpha", "10"),
            (1, geom.wkb_polygon(
                [np.array([[0, 0], [8, 0], [8, 8], [0, 8]], float),
                 np.array([[3, 3], [5, 3], [5, 5], [3, 5]], float)]
            ), None, "20"),
            (2, geom.wkb_multipolygon(
                [[np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)],
                 [np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)]]
            ), "gamma", None),
        ]
        df = spark.createDataFrame(
            rows, "id bigint, geometry binary, name string, v string"
        ).drop("id")
        p = str(tmp_path / "t.gml")
        assert write_gml(df, p, layer="things") == 3
        back = scan_gml(spark, p)
        got = sorted(back.collect(), key=lambda r: (r.name is None, r.name or ""))
        by = {r.name: r for r in got}
        g0 = geom.parse_wkb(bytes(by["alpha"].geometry))
        assert g0.parts.ravel().tolist() == [2.5, -7.25]
        assert by["alpha"].v == "10"
        poly = [r for r in got if r.name is None][0]
        assert _poly_area_kml(poly.geometry) == 64.0 - 4.0
        gm = geom.parse_wkb(bytes(by["gamma"].geometry))
        assert gm.kind == geom.WKB_MULTIPOLYGON and len(gm.parts) == 2

    def test_gml2_coordinates_and_urn_axis_swap(self, spark, tmp_path):
        doc = (
            '<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs" '
            'xmlns:gml="http://www.opengis.net/gml">'
            "<gml:featureMember><app:f xmlns:app='http://x/'>"
            "<app:geom><gml:Point "
            'srsName="urn:ogc:def:crs:EPSG::4326">'
            "<gml:pos>51.5 -0.12</gml:pos></gml:Point></app:geom>"
            "<app:label>urnpt</app:label></app:f></gml:featureMember>"
            "<gml:featureMember><app:f xmlns:app='http://x/'>"
            '<app:geom><gml:LineString srsName="EPSG:4326">'
            "<gml:coordinates>1,2 3,4</gml:coordinates>"
            "</gml:LineString></app:geom>"
            "<app:label>gml2</app:label></app:f></gml:featureMember>"
            "</wfs:FeatureCollection>"
        )
        p = tmp_path / "w.gml"
        p.write_text(doc)
        from gdal_spark.formats import scan_gml

        rows = {r.label: r for r in scan_gml(spark, str(p)).collect()}
        # urn: srsName -> lat,lon input swapped to x=lon, y=lat
        gp = geom.parse_wkb(bytes(rows["urnpt"].geometry))
        assert gp.parts.ravel().tolist() == [-0.12, 51.5]
        gl = geom.parse_wkb(bytes(rows["gml2"].geometry))
        np.testing.assert_array_equal(gl.parts[0], [[1.0, 2.0], [3.0, 4.0]])

    def test_urn_projected_crs_not_swapped(self, spark, tmp_path):
        # ADVICE r4: urn-form PROJECTED CRS (easting/northing, e.g. UTM
        # 32632) must be read as written — only lat/long CRS invert.
        doc = (
            '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">'
            "<gml:featureMember><app:f xmlns:app='http://x/'>"
            "<app:geom><gml:Point "
            'srsName="urn:ogc:def:crs:EPSG::32632">'
            "<gml:pos>500000 4649776</gml:pos></gml:Point></app:geom>"
            "</app:f></gml:featureMember></gml:FeatureCollection>"
        )
        p = tmp_path / "utm.gml"
        p.write_text(doc)
        from gdal_spark.formats import scan_gml

        r = scan_gml(spark, str(p)).collect()[0]
        g = geom.parse_wkb(bytes(r.geometry))
        assert g.parts.ravel().tolist() == [500000.0, 4649776.0]

    def test_repeated_pos_accumulates(self, spark, tmp_path):
        # GML3 LineString written as repeated <gml:pos> siblings (legal;
        # the reference's gml2ogrgeometry concatenates them).
        doc = (
            '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">'
            "<gml:featureMember><app:f xmlns:app='http://x/'>"
            "<app:geom><gml:LineString>"
            "<gml:pos>1 2</gml:pos><gml:pos>3 4</gml:pos>"
            "<gml:pos>5 6</gml:pos>"
            "</gml:LineString></app:geom>"
            "</app:f></gml:featureMember></gml:FeatureCollection>"
        )
        p = tmp_path / "mp.gml"
        p.write_text(doc)
        from gdal_spark.formats import scan_gml

        r = scan_gml(spark, str(p)).collect()[0]
        g = geom.parse_wkb(bytes(r.geometry))
        np.testing.assert_array_equal(
            g.parts[0], [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
        )

    def test_write_rejects_non_ncname_columns(self, spark, tmp_path):
        from gdal_spark.formats import write_gml

        df = spark.createDataFrame(
            [(geom.wkb_point(0.0, 0.0), "v")],
            "geometry binary, `bad name` string",
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="NCName"):
            write_gml(df, str(tmp_path / "bad.gml"))
