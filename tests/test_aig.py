"""Esri Arc/Info Binary Grid (AIG) driver tests.

Conformance quoted from autotest/gdrivers/aigrid.py: abc3x1 and its
upper-case twin ABC3X1UC open at checksum 3 as Byte with nodata 255
(test_aigrid_1/2/4/5), statistics min 0 / max 2 (test_aigrid_6).
Tile-type decode paths (0xE0/F0/FC/DF/D7/CF/nodata markers, raw
1/4/8/16/32-bit, constant) are exercised on hand-built spec blocks.
Semantics: frmts/aigrid/{gridlib.c,aigopen.c,aigdataset.cpp}.
Fixture provenance in tests/data/README.md.
"""

import os
import struct

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import aig as A

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestConformance:
    @pytest.mark.parametrize("name", ["abc3x1", "ABC3X1UC"])
    def test_abc3x1(self, name):
        arr, gt, nodata, proj = A.parse_aig(
            os.path.join(DATA, "aigrid", name))
        assert arr.shape == (1, 3)
        assert arr.dtype == np.uint8  # sta range 0..2 promotes
        assert gdal_checksum(arr) == 3
        assert nodata == 255.0
        assert gt == (-0.5, 1.0, 0.0, 0.5, 0.0, -1.0)
        assert list(arr[0]) == [0, 1, 2]
        assert "UTM Zone 55" in proj

    def test_stats_promotion_thresholds(self):
        # the byte promotion comes from sta.adf min/max per the
        # reference (aigdataset.cpp:101-106)
        with open(os.path.join(DATA, "aigrid", "abc3x1",
                               "sta.adf"), "rb") as f:
            dmin, dmax = struct.unpack_from(">dd", f.read())
        assert (dmin, dmax) == (0.0, 2.0)


def _block(magic, minsize, nmin_bytes, payload):
    body = bytes([magic, minsize]) + nmin_bytes + payload
    return body


class TestTileTypes:
    def _dec(self, body, bw=4, bh=2):
        return A._decode_int_block(body, bw, bh)

    def test_const(self):
        out = self._dec(_block(0x00, 1, b"\x07", b""))
        assert list(out) == [7] * 8

    def test_raw8(self):
        out = self._dec(_block(0x08, 1, b"\x05", bytes(range(8))))
        assert list(out) == [5 + i for i in range(8)]

    def test_raw4(self):
        payload = bytes([0x12, 0x34, 0x56, 0x78])
        out = self._dec(_block(0x04, 0, b"", payload))
        assert list(out) == [1, 2, 3, 4, 5, 6, 7, 8]

    def test_raw1(self):
        out = self._dec(_block(0x01, 1, b"\x09", bytes([0b10110001])))
        assert list(out) == [10, 9, 10, 10, 9, 9, 9, 10]

    def test_raw16_raw32(self):
        p16 = b"".join(struct.pack(">H", v) for v in range(8))
        out = self._dec(_block(0x10, 1, b"\x02", p16))
        assert list(out) == [2 + i for i in range(8)]
        p32 = b"".join(struct.pack(">i", v - 3) for v in range(8))
        out = self._dec(_block(0x20, 1, b"\x03", p32))
        assert list(out) == list(range(8))

    def test_rle_families(self):
        # 0xFC: run of 8 with one-byte value
        out = self._dec(_block(0xFC, 1, b"\x01", bytes([8, 41])))
        assert list(out) == [42] * 8
        # 0xF0: two-byte value
        out = self._dec(_block(0xF0, 0, b"", bytes([8, 1, 4])))
        assert list(out) == [260] * 8
        # 0xE0: four-byte value
        out = self._dec(_block(
            0xE0, 0, b"", bytes([8]) + struct.pack(">i", -12)))
        assert list(out) == [-12] * 8
        # 0xDF: run of min
        out = self._dec(_block(0xDF, 1, b"\x2a", bytes([8])))
        assert list(out) == [42] * 8
        # 0xD7: literals
        out = self._dec(_block(0xD7, 1, b"\x01",
                               bytes([8]) + bytes(range(8))))
        assert list(out) == [1 + i for i in range(8)]
        # 0xCF: 16-bit literals
        p = bytes([8]) + b"".join(struct.pack(">H", v) for v in range(8))
        out = self._dec(_block(0xCF, 0, b"", p))
        assert list(out) == list(range(8))

    def test_nodata_marker(self):
        # marker > 128 inserts (256 - marker) nodata cells
        body = _block(0xD7, 0, b"", bytes([252, 4, 1, 2, 3, 4]))
        out = self._dec(body)
        assert list(out[:4]) == [A.NO_DATA_INT] * 4
        assert list(out[4:]) == [1, 2, 3, 4]

    def test_negative_min_sign_extension(self):
        # 2-byte min with high bit -> sign-extended
        out = self._dec(_block(0x08, 2, struct.pack(">H", 0xFFF6),
                               bytes([0] * 8)))
        assert list(out) == [-10] * 8

    def test_ccitt_tile_fills_nodata(self):
        out = self._dec(_block(0xFF, 0, b"", b"\x00\x01\x02"))
        assert list(out) == [A.NO_DATA_INT] * 8


class TestRoundTrip:
    GT = (-100.0, 25.0, 0.0, 5000.0, 0.0, -25.0)

    def _write(self, tmp_path, arr, name="cov"):
        cov = tmp_path / name
        cov.mkdir()
        for n, b in A.format_aig(arr, self.GT).items():
            (cov / n).write_bytes(b)
        return str(cov)

    def test_int(self, tmp_path):
        rng = np.random.default_rng(4)
        arr = rng.integers(-50000, 50000, (6, 9)).astype(np.int32)
        a2, gt2, nd, _ = A.parse_aig(self._write(tmp_path, arr))
        assert a2.dtype == np.int32  # range exceeds int16
        assert np.array_equal(a2, arr)
        assert gt2 == self.GT

    def test_int16_promotion(self, tmp_path):
        arr = np.array([[-5, 3000], [-3000, 5]], np.int32)
        a2, _, nd, _ = A.parse_aig(self._write(tmp_path, arr))
        assert a2.dtype == np.int16
        assert nd == -32768.0
        assert np.array_equal(a2, arr.astype(np.int16))

    def test_float(self, tmp_path):
        rng = np.random.default_rng(5)
        arr = rng.normal(0, 400, (6, 9)).astype(np.float32)
        a2, gt2, nd, _ = A.parse_aig(self._write(tmp_path, arr))
        assert a2.dtype == np.float32
        assert np.array_equal(a2, arr)
        assert nd == pytest.approx(A.NO_DATA_FLOAT)


class TestScan:
    def test_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(6)
        from gdal_spark import codecs
        arrs = {f"cov{i}": rng.integers(-40000, 40000, (4, 5))
                .astype(np.int32) for i in range(3)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 5, 4, "raw",
                 0.0, 1.0, 0.0, 4.0, 0.0, -1.0, 0, None)
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        A.write_aig(src, str(tmp_path))
        df = A.scan_aig(spark, str(tmp_path / "cov*"))
        got = {r.image_id: r for r in df.collect()}
        assert set(got) == set(arrs)
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)
