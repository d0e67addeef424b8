"""SpatiaLite driver tests — conformance on a reference autotest DATA
database (byte-identical copy, see tests/data/README.md) incl. a
cross-format pin against the independent FlatGeobuf reader on the same
`poly` layer. Reference behavior: ogr/ogrsf_frmts/sqlite
(ogrsqlitelayer.cpp SpatiaLite geometry import); layer extent quoted
from the reference's own poly-layer tests."""

import os
import struct

import numpy as np
import pytest

from gdal_spark.formats import spatialite as S

DATA = os.path.join(os.path.dirname(__file__), "data")
POLY = os.path.join(DATA, "poly_spatialite.sqlite")


def _rings(wkb):
    """Parse one 2-D WKB polygon -> list of (n,2) arrays."""
    bo, base, _z, i = S._wkb_read_header(wkb, 0)
    assert base == 3
    (nr,) = struct.unpack_from(bo + "I", wkb, i)
    i += 4
    rings = []
    for _ in range(nr):
        (n,) = struct.unpack_from(bo + "I", wkb, i)
        i += 4
        rings.append(np.frombuffer(wkb[i:i + 16 * n],
                                   "<f8").reshape(n, 2))
        i += 16 * n
    return rings


class TestConformance:
    def test_catalog(self):
        assert S.spatialite_layers(POLY) == [
            {"table": "poly", "geometry": "GEOMETRY", "srid": 32631}
        ]

    def test_poly_extent_and_attrs(self):
        import sqlite3

        con = sqlite3.connect(POLY)
        rows = con.execute(
            "SELECT OGC_FID, GEOMETRY, area, eas_id, prfedea FROM poly "
            "ORDER BY OGC_FID"
        ).fetchall()
        con.close()
        assert len(rows) == 10
        assert rows[0][2:] == (215229.266, 168.0, "35043411")
        assert S.spatialite_srid(rows[0][1]) == 32631
        wkbs = [S.spatialite_to_wkb(r[1]) for r in rows]
        xy = np.concatenate(
            [np.frombuffer(bytes(S._collect_xy(w)), "<f8") for w in wkbs]
        )
        xs, ys = xy[0::2], xy[1::2]
        # the reference's quoted poly-layer extent (ogr_flatgeobuf /
        # ogr_sqlite tests over the same source layer)
        assert (xs.min(), xs.max()) == (478315.53125, 481645.3125)
        assert (ys.min(), ys.max()) == (4762880.5, 4765610.5)

    def test_cross_format_vs_flatgeobuf(self, spark):
        """Two from-scratch readers of two foreign containers must
        agree on the same layer: ring structure + endpoint vertices
        exactly (doubles in both), intermediate vertices to the
        SpatiaLite compressed format's float32-delta precision."""
        from gdal_spark.formats import scan_flatgeobuf

        fgb = {
            i: r
            for i, r in enumerate(
                scan_flatgeobuf(
                    spark, os.path.join(DATA, "poly.fgb"),
                    num_partitions=1,
                ).collect()
            )
        }
        import sqlite3

        con = sqlite3.connect(POLY)
        rows = con.execute(
            "SELECT GEOMETRY, eas_id FROM poly ORDER BY OGC_FID"
        ).fetchall()
        con.close()
        # match features by eas_id (fid orders differ between files)
        by_eas_fgb = {}
        for r in fgb.values():
            by_eas_fgb[float(r.EAS_ID)] = bytes(r.geometry)
        matched = 0
        for blob, eas in rows:
            if float(eas) not in by_eas_fgb:
                continue
            a = _rings(S.spatialite_to_wkb(blob))
            b = _rings(by_eas_fgb[float(eas)])
            assert len(a) == len(b)
            for ra, rb in zip(a, b):
                assert ra.shape == rb.shape
                # endpoints are stored as full doubles -> exact
                assert np.array_equal(ra[0], rb[0])
                assert np.array_equal(ra[-1], rb[-1])
                # intermediate: float32 delta quantization only
                assert np.abs(ra - rb).max() < 0.01
            matched += 1
        assert matched == 10

    def test_unsupported_classes_rejected(self):
        # XYM body (class 2001..2007 family) must be named in the
        # rejection, not mis-decoded
        head = struct.pack("<BBi4dB", 0, 1, 0, 0.0, 0.0, 1.0, 1.0, 0x7C)
        body = struct.pack("<I", 2001) + b"\x00" * 24
        with pytest.raises(ValueError, match="unsupported"):
            S.spatialite_to_wkb(head + body + b"\xfe")
        with pytest.raises(ValueError, match="SpatiaLite"):
            S.spatialite_to_wkb(b"\x01" + b"\x00" * 60)


class TestRoundTrip:
    def test_wkb_spatialite_wkb(self):
        from gdal_spark.geom import (
            wkb_linestring,
            wkb_multipolygon,
            wkb_point,
            wkb_polygon,
        )

        mpoint = (struct.pack("<BII", 1, 4, 2)
                  + wkb_point(1, 2) + wkb_point(3, 4))
        cases = [
            wkb_point(3, 49.5),
            wkb_linestring([(2, 49), (3, 50), (3.25, 50.5)]),
            wkb_polygon([
                [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                [(1, 1), (2, 1), (1, 2), (1, 1)],
            ]),
            wkb_multipolygon([
                [[(0, 0), (1, 0), (1, 1), (0, 0)]],
                [[(5, 5), (6, 5), (6, 6), (5, 5)]],
            ]),
            mpoint,
        ]
        for wkb in cases:
            blob = S.wkb_to_spatialite(wkb, 4326)
            assert blob[0] == 0 and blob[-1] == 0xFE
            assert S.spatialite_srid(blob) == 4326
            assert S.spatialite_to_wkb(blob) == wkb

    def test_spark_scan_and_write(self, spark, tmp_path):
        rows = S.scan_spatialite(spark, POLY, "poly",
                                 num_partitions=4).collect()
        assert len(rows) == 10
        assert {type(r.geometry) for r in rows} == {bytes} or all(
            r.geometry is not None for r in rows
        )
        eas = sorted(r.eas_id for r in rows)
        assert eas[0] == 158.0 and len(eas) == 10
        # export what we scanned, scan it back
        df = S.scan_spatialite(spark, POLY, "poly")
        out = str(tmp_path / "o.sqlite")
        n = S.write_spatialite(df, out, "poly", srid=32631,
                               geometry_type="POLYGON")
        assert n == 10
        assert S.spatialite_layers(out) == [
            {"table": "poly", "geometry": "geometry", "srid": 32631}
        ]
        back = S.scan_spatialite(spark, out, "poly",
                                 num_partitions=3).collect()
        assert len(back) == 10
        a = {r.eas_id: bytes(r.geometry) for r in rows}
        b = {r.eas_id: bytes(r.geometry) for r in back}
        assert a == b  # uncompressed write -> exact WKB round-trip
