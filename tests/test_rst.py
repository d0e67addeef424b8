"""Idrisi RST driver tests.

Conformance quoted from autotest/gdrivers/idrisi.py: byte.rst
checksum 5044 (test_idrisi_1), real.rst checksum 5275
(test_idrisi_2). Semantics: frmts/idrisi/IdrisiDataset.cpp
(top-down rows, BGR rgb24 interleave, pixel-is-area georef).
Fixture provenance in tests/data/README.md (renamed rst_byte.* /
rst_real.* to avoid clashing with the byte.tif family).
"""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import rst as R

DATA = os.path.join(os.path.dirname(__file__), "data")


def _load(stem):
    with open(os.path.join(DATA, stem + ".rdc")) as f:
        rdc = R.parse_rdc(f.read())
    with open(os.path.join(DATA, stem + ".rst"), "rb") as f:
        return R.decode_rst(f.read(), rdc)


class TestConformance:
    def test_byte(self):
        arr, gt, srid, nodata = _load("rst_byte")
        assert arr.shape == (21, 21) and arr.dtype == np.uint8
        assert gdal_checksum(arr) == 5044
        # plane ref system: 50..70 over 21 cells, pixel-is-area
        assert gt == pytest.approx(
            (50.0, 20 / 21, 0.0, 70.0, 0.0, -20 / 21), abs=1e-12)
        assert srid == 0 and nodata is None

    def test_real(self):
        arr, gt, srid, nodata = _load("rst_real")
        assert arr.shape == (21, 21) and arr.dtype == np.float32
        assert gdal_checksum(arr) == 5275

    def test_top_down_orientation(self):
        # rows are stored top-down: the first byte of the file is the
        # NW cell of the array (no flip, unlike Surfer/GTX)
        with open(os.path.join(DATA, "rst_byte.rst"), "rb") as f:
            first = f.read(1)[0]
        arr, *_ = _load("rst_byte")
        assert arr[0, 0] == first


class TestRoundTrip:
    GT = (100.0, 2.0, 0.0, 60.0, 0.0, -2.0)

    @pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
    def test_single_band(self, dtype):
        arr = (np.arange(24).reshape(4, 6) * 3 + 1).astype(dtype)
        data, rdc = R.format_rst(arr, self.GT, srid=32633,
                                 nodata=-5.0)
        a2, gt2, srid2, nd2 = R.decode_rst(data, R.parse_rdc(rdc))
        assert a2.dtype == dtype
        assert np.array_equal(a2, arr)
        assert gt2 == pytest.approx(self.GT, abs=1e-6)
        assert srid2 == 32633 and nd2 == -5.0

    def test_rgb24_bgr_interleave(self):
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 255, (3, 4, 3), np.uint8).astype(np.uint8)
        data, rdc = R.format_rst(arr, self.GT)
        # on disk: B,G,R per pixel
        assert data[0] == arr[0, 0, 2] and data[2] == arr[0, 0, 0]
        a2, *_ = R.decode_rst(data, R.parse_rdc(rdc))
        assert np.array_equal(a2, arr)

    def test_latlong_and_utm_s(self):
        arr = np.zeros((2, 2), np.uint8)
        _, rdc = R.format_rst(arr, self.GT, srid=4326)
        assert R.parse_rdc(rdc)["ref. system"] == "latlong"
        _, rdc = R.format_rst(arr, self.GT, srid=32723)
        p = R.parse_rdc(rdc)
        assert p["ref. system"] == "utm-23s"
        assert R._ref_srid(p["ref. system"]) == 32723

    def test_reject_rotation_and_dtype(self):
        with pytest.raises(ValueError, match="rotated"):
            R.format_rst(np.zeros((2, 2), np.uint8),
                         (0, 1, 0.5, 0, 0, -1))
        with pytest.raises(ValueError, match="dtype"):
            R.format_rst(np.zeros((2, 2), np.int32), self.GT)


class TestSpark:
    def test_scan_write_round_trip(self, spark, tmp_path):
        rows = []
        for i in range(3):
            arr = (np.arange(12, dtype=np.int16).reshape(3, 4)
                   - 5 + 10 * i)
            rows.append((
                f"r{i}", bytearray(codecs.encode_raw(arr)), 4, 3,
                "raw", float(i), 0.5, 0.0, 40.0, 0.0, -0.5,
                32601 + i, float(-99),
            ))
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(3)
        out = str(tmp_path / "rst")
        assert len(R.write_rst(src, out)) == 3
        got = {r.image_id: r for r in R.scan_rst(
            spark, os.path.join(out, "*.rst")).collect()}
        assert set(got) == {"r0", "r1", "r2"}
        for i in range(3):
            r = got[f"r{i}"]
            a = codecs.decode_image(bytes(r.bytes), "raw")
            assert np.array_equal(
                a, np.arange(12, dtype=np.int16).reshape(3, 4)
                - 5 + 10 * i)
            assert r.srid == 32601 + i
            assert r.nodata == -99.0
            assert (r.gt0, r.gt5) == pytest.approx((float(i), -0.5),
                                                   abs=1e-6)

    def test_scan_fixture(self, spark):
        r = R.scan_rst(
            spark, os.path.join(DATA, "rst_byte.rst")).collect()[0]
        arr = codecs.decode_image(bytes(r.bytes), "raw")
        assert gdal_checksum(arr) == 5044
