"""OSM PBF driver tests — conformance on reference autotest DATA files
(byte-identical copies, see tests/data/README.md) plus distributed
scan / way-assembly / sink round-trips. Reference behavior:
ogr/ogrsf_frmts/osm; expected features quoted from
autotest/ogr/ogr_osm.py (test_ogr_osm_1)."""

import json
import os

import pytest

from gdal_spark.formats import osm as O

DATA = os.path.join(os.path.dirname(__file__), "data")


def _p(name):
    return os.path.join(DATA, name)


class TestConformance:
    def test_test_pbf_nodes(self):
        d = O.read_osm(_p("test.pbf"))
        assert len(d["nodes"]) == 9
        by_id = {n[0]: n for n in d["nodes"]}
        # the points-layer feature the reference test pins
        nid, lon, lat, tags = by_id[3]
        assert (lon, lat) == (3.0, 49.5)
        assert tags == {"name": "Some interesting point",
                        "foo": "bar", "bar": "baz"}
        assert by_id[1][1:3] == (2.0, 49.0)
        # untagged nodes carry no tags
        assert by_id[4][3] == {}

    def test_test_pbf_ways_and_relations(self):
        d = O.read_osm(_p("test.pbf"))
        ways = {w[0]: w for w in d["ways"]}
        assert ways[1][1] == [1, 2]
        assert ways[1][2] == {"highway": "motorway", "foo": "bar"}
        assert ways[6][1] == [1, 4, 2, 5, 900, 1]  # 900 doesn't exist
        rels = {r[0]: r for r in d["relations"]}
        assert rels[1][1] == [("way", 2, "outer"), ("way", 3, "inner")]
        assert rels[1][2] == {"type": "multipolygon",
                              "natural": "forest"}
        assert rels[4][1] == [("node", 1, ""), ("way", 1, "")]

    def test_uncompressed_and_nondense_variants(self):
        # raw (non-zlib) blobs, plain Node messages instead of dense
        a = O.read_osm(_p("test_uncompressed_dense_false.pbf"))
        b = O.read_osm(_p("test_uncompressed_dense_true_nometadata.pbf"))
        c = O.read_osm(_p("test.pbf"))
        assert sorted(a["nodes"]) == sorted(c["nodes"])
        assert sorted(b["nodes"]) == sorted(c["nodes"])
        assert sorted(w[:2] for w in a["ways"]) == \
            sorted(w[:2] for w in c["ways"])

    def test_two_points(self):
        d = O.read_osm(_p("two_points.pbf"))
        assert d["nodes"] == [(1, 2.0, 49.0, {"foo": "bar"}),
                              (2, 2.0, 49.1, {"foo": "baz"})]

    def test_blob_spans_touch_headers_only(self):
        spans = O.osm_blob_spans(_p("test.pbf"))
        types = [t for _, _, t in spans]
        assert types[0] == "OSMHeader" and "OSMData" in types
        size = os.path.getsize(_p("test.pbf"))
        # spans cover the file exactly (framing walk is consistent)
        last_off, last_len, _ = spans[-1]
        assert last_off + last_len == size

    def test_unknown_codec_rejected(self):
        # a blob carrying only an lzma_data field must name the codec
        payload = O._enc_field(4, 2, b"\x00")
        with pytest.raises(ValueError, match="lzma"):
            O._blob_payload(payload)


class TestSpark:
    def test_points_layer(self, spark):
        rows = O.osm_points(spark, _p("test.pbf")).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.osm_id == 3 and r.wkt == "POINT (3.0 49.5)"
        assert json.loads(r.tags)["name"] == "Some interesting point"

    def test_way_lines_layer(self, spark):
        # the reference's lines layer: way 1 LINESTRING (2 49,3 50);
        # way 6 skips the nonexistent node 900 and closes the ring —
        # exactly test_ogr_osm_1's expected geometries
        lines = {r.osm_id: r.wkt
                 for r in O.osm_way_lines(spark, _p("test.pbf"))
                 .collect()}
        assert lines[1] == "LINESTRING (2.0 49.0,3.0 50.0)"
        assert lines[6] == ("LINESTRING (2.0 49.0,3.0 49.0,"
                            "3.0 50.0,2.0 50.0,2.0 49.0)")
        # way 5 has a single (existing) node -> not a line
        assert 5 not in lines
        # way 4 references only missing nodes -> not a line
        assert 4 not in lines

    def test_scan_kinds(self, spark):
        assert O.scan_osm(spark, _p("test.pbf"), "nodes").count() == 9
        assert O.scan_osm(spark, _p("test.pbf"), "ways").count() == 8
        rels = O.scan_osm(spark, _p("test.pbf"), "relations").collect()
        assert len(rels) == 5
        r1 = {r.osm_id: r for r in rels}[1]
        assert list(r1.member_types) == ["way", "way"]
        assert list(r1.member_refs) == [2, 3]
        assert list(r1.member_roles) == ["outer", "inner"]

    def test_write_roundtrip_partition_invariant(self, spark, tmp_path):
        nodes = spark.createDataFrame(
            [(i, 2.0 + i * 0.25, 49.0 + i * 0.5,
              json.dumps({"n": str(i)}) if i % 3 == 0 else None)
             for i in range(1, 41)],
            "osm_id long, lon double, lat double, tags string",
        )
        ways = spark.createDataFrame(
            [(100 + i, [i, i + 1, i + 2], json.dumps({"highway": "x"}))
             for i in range(1, 11)],
            "osm_id long, refs array<long>, tags string",
        )
        ref = None
        for parts in (1, 8):
            p = str(tmp_path / f"t{parts}.pbf")
            nblobs = O.write_osm_pbf(nodes.repartition(parts),
                                     ways.repartition(parts), p)
            assert nblobs >= 2
            back = O.read_osm(p)
            got = (sorted(back["nodes"]),
                   sorted((w[0], tuple(w[1]), tuple(sorted(w[2].items())))
                          for w in back["ways"]))
            if ref is None:
                ref = got
            else:
                assert got == ref  # content invariant to parallelism
        assert ref[0][2] == (3, 2.75, 50.5, {"n": "3"})
        # and the distributed scan agrees
        p1 = str(tmp_path / "t8.pbf")
        assert O.scan_osm(spark, p1, "nodes").count() == 40
        assert O.scan_osm(spark, p1, "ways").count() == 10
