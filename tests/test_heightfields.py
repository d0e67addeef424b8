"""Terragen + Leveller heightfield driver tests.

Conformance fixtures are byte-identical GDAL autotest DATA files;
expected values are the reference's own autotest expectations:

- terragen/float32.ter (here terragen_float32.ter): band checksum
  1128 over the raw int16 elevations (test_terragen_1); SCAL 60, ALTW
  scale/offset through GetScale/GetOffset.
- leveller/ter6test.ter: version 6, float32 body, checksum 33441
  (test_leveller_1); legacy hf_worldspacing centers the grid.
- the Terragen writer parity check mirrors test_terragen_2: byte data
  written with MINUSERPIXELVALUE=74 / MAXUSERPIXELVALUE=255 must be
  recovered exactly by unscale-and-round (the reference pins checksum
  4672 on the recovered byte raster).
"""

import hashlib
import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.leveller import (
    format_leveller, parse_leveller,
)
from gdal_spark.formats.terragen import (
    format_terragen, parse_terragen,
)

DATA = os.path.join(os.path.dirname(__file__), "data")

MD5 = {
    "terragen_float32.ter": "8c9c6a6e86d7b3bc7fd7eb112e6b744b",
    "ter6test.ter": "1f649dac2de049967cfc4d2dcba70b92",
}


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def test_fixture_provenance():
    for name, md5 in MD5.items():
        assert hashlib.md5(_read(name)).hexdigest() == md5, name


class TestTerragen:
    def test_conformance(self):
        arr, gt, scale, offset, scal = parse_terragen(
            _read("terragen_float32.ter")
        )
        assert arr.shape == (20, 20)
        assert gdal_checksum(arr.astype(np.int16)) == 1128
        assert scal == 60.0
        # gt is the reference's positive-gt5 scale matrix
        assert gt == (0.0, 60.0, 0.0, 0.0, 0.0, 60.0)
        assert offset == 60.0 * 2  # baseHeight 2

    def test_unscale_recovery(self):
        """test_terragen_2 analog: byte data written with span
        (74, 255) is recovered exactly after unscale + round."""
        rng = np.random.default_rng(42)
        byte = rng.integers(74, 256, size=(20, 20)).astype(np.float64)
        enc = format_terragen(byte, scal=30.0, span=(74, 255))
        arr, gt, scale, offset, scal = parse_terragen(enc)
        assert np.array_equal(np.round(arr * scale + offset), byte)

    def test_raw_roundtrip(self):
        phys = np.arange(12, dtype=np.float64).reshape(3, 4) - 5
        enc = format_terragen(phys, scal=32.0, raw=(2048, 1))
        arr, gt, scale, offset, scal = parse_terragen(enc)
        np.testing.assert_array_equal(arr, phys)
        assert scale == 32.0 * 2048 / 65536  # exactly 1.0
        assert offset == 32.0
        assert gt[1] == 32.0

    def test_rectangular(self):
        a = np.zeros((3, 5))
        enc = format_terragen(a, span=(0, 10))
        arr, *_ = parse_terragen(enc)
        assert arr.shape == (3, 5)

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="Terragen"):
            parse_terragen(b"NOTTERRAGENATALL" + b"\x00" * 64)


class TestLeveller:
    def test_conformance(self):
        arr, gt, scale, offset, wkt, v = parse_leveller(
            _read("ter6test.ter")
        )
        assert v == 6
        assert arr.shape == (96, 64)
        assert gdal_checksum(arr.astype(np.float32)) == 33441
        # legacy worldspacing: centered grid, positive gt5
        assert gt == (-315.0, 10.0, 0.0, -475.0, 0.0, 10.0)
        assert scale == 10.0 and offset == 0.0

    def test_v7_roundtrip(self):
        arr = (np.arange(12, dtype=np.float64) * 0.5).reshape(3, 4)
        gt = (100.0, 2.0, 0.0, 50.0, 0.0, -2.0)
        enc = format_leveller(arr, gt, scale=3.0, offset=-1.5)
        arr2, gt2, scale, offset, wkt, v = parse_leveller(enc)
        assert v == 7
        np.testing.assert_array_equal(arr2, arr)
        assert gt2 == gt
        assert scale == 3.0 and offset == -1.5

    def test_version_bounds(self):
        with pytest.raises(ValueError, match="version"):
            parse_leveller(b"trrn\x0d" + b"\x00" * 64)

    def test_too_small(self):
        with pytest.raises(ValueError, match="too small"):
            parse_leveller(format_leveller(
                np.zeros((1, 4)), (0, 1, 0, 0, 0, 1)
            ) if False else b"trrn\x07" +
                b"\x04hf_w\x04\x00\x00\x00\x01\x00\x00\x00" +
                b"\x04hf_b\x04\x00\x00\x00\x04\x00\x00\x00")


class TestSpark:
    def test_scan_both(self, spark):
        from gdal_spark.formats import scan_leveller, scan_terragen

        r = scan_terragen(
            spark, os.path.join(DATA, "terragen_float32.ter")
        ).collect()[0]
        assert (r["w"], r["h"]) == (20, 20) and r["gt1"] == 60.0
        r = scan_leveller(
            spark, os.path.join(DATA, "ter6test.ter")
        ).collect()[0]
        assert (r["w"], r["h"]) == (64, 96) and r["scale"] == 10.0

    def test_roundtrip(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import (
            scan_leveller, scan_terragen, write_leveller,
            write_terragen,
        )

        arrs = [
            (np.arange(12, dtype=np.float64).reshape(3, 4) + 10 * k)
            for k in range(3)
        ]
        rows = [
            (f"h{k}", bytearray(codecs.encode_raw(a)), 4, 3, "raw",
             5.0 * k, 2.0, 0.0, 80.0, 0.0, -2.0, 0, None, 1.0, 0.0)
            for k, a in enumerate(arrs)
        ]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double, "
            "scale double, offset double",
        ).repartition(2)
        d1 = str(tmp_path / "ter")
        write_terragen(src, d1, scal=32.0, height_scale=2048)
        back = {r["image_id"]: r for r in
                scan_terragen(spark, d1 + "/*.ter").collect()}
        a1 = codecs.decode_image(bytes(back["h1"]["bytes"]), "raw")
        np.testing.assert_array_equal(np.squeeze(a1), arrs[1])
        assert back["h1"]["scale"] == 1.0

        d2 = str(tmp_path / "lev")
        write_leveller(src, d2)
        back = {r["image_id"]: r for r in
                scan_leveller(spark, d2 + "/*.ter").collect()}
        a2 = codecs.decode_image(bytes(back["h2"]["bytes"]), "raw")
        np.testing.assert_array_equal(np.squeeze(a2), arrs[2])
        assert back["h2"]["gt0"] == 10.0 and back["h2"]["gt5"] == -2.0
