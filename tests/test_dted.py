"""DTED driver conformance + roundtrip tests.

Conformance fixtures are byte-identical GDAL autotest DATA files (md5
provenance in tests/data/README.md); expected values come from the
reference's own test expectations in autotest/gdrivers/dted.py:

- n43.dt0: band checksum 49187, the quoted geotransform, Int16,
  nodata -32767 (test_dted_1/2).
- n43_partial_cols.dt0 / n43_sparse_cols.dt0: files carrying only 2 of
  121 column records — missing columns read as nodata; checksums
  56006 / 56369 (test_dted_13/14).
- n43_coord_inverted.dt0: UHL lon/lat fields swapped by the producer;
  same geotransform as n43.dt0 (test_dted_9).
- n43_wgs72.dt0: DSI horizontal datum WGS72 (test_dted_4a).
- n43_bad_crc.dt0: corrupted record checksum must error
  (test_dted_4b).
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.dted import NODATA, format_dted, parse_dted

DATA = os.path.join(os.path.dirname(__file__), "data")

N43_GT = (-80.004166666666663, 0.0083333333333333332, 0.0,
          44.00416666666667, 0.0, -0.0083333333333333332)


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


class TestConformance:
    def test_n43(self):
        arr, gt, srid, nodata = parse_dted(_read("n43.dt0"))
        assert arr.shape == (121, 121) and arr.dtype == np.int16
        assert gdal_checksum(arr) == 49187
        np.testing.assert_allclose(gt, N43_GT, atol=1e-9)
        assert srid == 4326 and nodata == -32767.0

    @pytest.mark.parametrize(
        "name,checksum",
        [("n43_partial_cols.dt0", 56006), ("n43_sparse_cols.dt0", 56369)],
    )
    def test_partial_and_sparse_columns(self, name, checksum):
        arr, _, _, _ = parse_dted(_read(name))
        assert arr.shape == (121, 121)
        assert gdal_checksum(arr) == checksum
        # the unrecorded columns must be nodata
        assert (arr[:, 100] == NODATA).all()

    def test_coordinate_inverted_header(self):
        _, gt, _, _ = parse_dted(_read("n43_coord_inverted.dt0"))
        np.testing.assert_allclose(gt, N43_GT, atol=1e-9)

    def test_wgs72_datum(self):
        _, _, srid, _ = parse_dted(_read("n43_wgs72.dt0"))
        assert srid == 4322

    def test_bad_crc_errors(self):
        with pytest.raises(ValueError, match="checksum"):
            parse_dted(_read("n43_bad_crc.dt0"))

    def test_rejects_non_dted(self):
        with pytest.raises(ValueError, match="UHL1"):
            parse_dted(b"II*\x00" + b"\x00" * 100)


class TestWrite:
    def test_reencode_n43_exact(self):
        arr, gt, srid, _ = parse_dted(_read("n43.dt0"))
        a2, g2, s2, n2 = parse_dted(format_dted(arr, gt, srid=srid))
        assert np.array_equal(a2, arr) and g2 == gt
        assert s2 == 4326 and n2 == -32767.0
        assert gdal_checksum(a2) == 49187

    def test_roundtrip_negative_and_wgs72(self):
        rng = np.random.default_rng(3)
        a = rng.integers(-500, 4000, (61, 45)).astype(np.int16)
        gt = (10.0 - 1 / 240, 1 / 120, 0.0, 20.0 + 1 / 240, 0.0, -1 / 120)
        a2, g2, s2, _ = parse_dted(format_dted(a, gt, srid=4322))
        assert np.array_equal(a2, a) and s2 == 4322
        np.testing.assert_allclose(g2, gt, atol=1e-12)

    def test_rejects_rotation_and_odd_interval(self):
        a = np.zeros((4, 4), np.int16)
        with pytest.raises(ValueError, match="axis-aligned"):
            format_dted(a, (0, 1 / 120, 0.001, 0, 0, -1 / 120))
        with pytest.raises(ValueError, match="tenths"):
            format_dted(a, (0, 0.0001, 0, 0, 0, -0.0001))


class TestSpark:
    def test_distributed_scan_and_sink(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_dted, write_dted

        rng = np.random.default_rng(11)
        rows = []
        for i in range(5):
            a = rng.integers(-100, 3000, (25, 25)).astype(np.int16)
            rows.append((
                f"cell{i}", codecs.encode_raw(a), 25, 25, "raw",
                float(i) - 1 / 240, 1 / 120, 0.0,
                40.0 + 1 / 240, 0.0, -1 / 120, 4326, NODATA,
            ))
        df = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
            "gt5 double, srid int, nodata double",
        )
        paths = write_dted(df, str(tmp_path / "cells"))
        assert len(paths) == 5
        back = scan_dted(spark, str(tmp_path / "cells" / "*.dt0"))
        got = {r.image_id: r for r in back.collect()}
        src = {r.image_id: r for r in df.collect()}
        assert set(got) == set(src)
        for iid in got:
            a = codecs.decode_image(bytes(got[iid].bytes), got[iid].fmt)
            b = codecs.decode_image(bytes(src[iid].bytes), src[iid].fmt)
            np.testing.assert_array_equal(a, b)
            assert got[iid].srid == 4326
            np.testing.assert_allclose(
                [getattr(got[iid], f"gt{k}") for k in range(6)],
                [getattr(src[iid], f"gt{k}") for k in range(6)],
                atol=1e-12,
            )

    def test_scan_autotest_cell(self, spark):
        from gdal_spark.formats import scan_dted

        row = scan_dted(spark, os.path.join(DATA, "n43.dt0")).collect()[0]
        from gdal_spark import codecs

        arr = codecs.decode_image(bytes(row.bytes), row.fmt)
        assert gdal_checksum(arr.reshape(121, 121)) == 49187
        assert row.srid == 4326 and row.nodata == -32767.0
