"""BSB/KAP nautical chart driver tests.

Conformance quoted from autotest/gdrivers/bsb.py: rgbsmall.kap, its
scanline-index twin, and the line-break variant all at the
reference's index-band checksum 30321 (after the reference's
nonzero-values-minus-one downshift); the two truncated variants
open with partial rows; transverse_mercator.kap carries 3 REF GCPs.
Semantics: frmts/bsb/bsb_read.c (the expired patent 5,727,090).
Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import bsb as B

DATA = os.path.join(os.path.dirname(__file__), "data", "bsb")


def _b(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


class TestConformance:
    @pytest.mark.parametrize("name", [
        "rgbsmall.kap", "rgbsmall_index.kap",
        "rgbsmall_with_line_break.kap"])
    def test_rgbsmall_variants(self, name):
        arr, pal, gcps, meta = B.parse_bsb(_b(name))
        assert arr.shape == (50, 50)
        assert gdal_checksum(arr) == 30321

    @pytest.mark.parametrize("name,cs", [
        ("rgbsmall_truncated.kap", 29696),
        ("rgbsmall_truncated2.kap", 30307)])
    def test_truncated_partial(self, name, cs):
        # autotest only requires these to open (-1 checksum); our
        # own partial-decode checksums are pinned for stability
        arr, *_ = B.parse_bsb(_b(name))
        assert arr.shape == (50, 50)
        assert gdal_checksum(arr) == cs

    def test_australia4c(self):
        arr, pal, gcps, meta = B.parse_bsb(_b("australia4c.kap"))
        assert arr.shape == (480, 625)
        assert len(gcps) == 4
        assert "KNP" in meta

    def test_gcps(self):
        arr, pal, gcps, meta = B.parse_bsb(_b("transverse_mercator.kap"))
        assert len(gcps) == 3
        assert gdal_checksum(arr) == 30321

    def test_not_bsb(self):
        with pytest.raises(ValueError, match="not a BSB"):
            B.parse_bsb(b"nonsense" * 10)


class TestRoundTrip:
    def test_basic(self):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 100, (23, 37)).astype(np.uint8)
        pal = rng.integers(0, 256, (100, 3)).astype(np.uint8)
        a2, p2, _, _ = B.parse_bsb(B.format_bsb(arr, pal))
        assert np.array_equal(a2, arr)
        assert np.array_equal(p2[:100], pal)

    def test_long_runs_multibyte_counts(self):
        pal = np.zeros((16, 3), np.uint8)
        arr = np.full((5, 1000), 3, np.uint8)
        arr[2, 500:] = 9
        a2, *_ = B.parse_bsb(B.format_bsb(arr, pal))
        assert np.array_equal(a2, arr)

    def test_gcps_roundtrip(self):
        pal = np.zeros((4, 3), np.uint8)
        arr = np.ones((4, 4), np.uint8)
        gcps = [(0.0, 0.0, 50.0, -1.0), (3.0, 3.0, 49.0, 0.0)]
        _, _, g2, _ = B.parse_bsb(B.format_bsb(arr, pal, gcps=gcps))
        assert g2 == gcps

    def test_rejects_8bit(self):
        with pytest.raises(ValueError, match="7-bit"):
            B.format_bsb(np.full((2, 2), 200, np.uint8),
                         np.zeros((4, 3), np.uint8))


class TestScan:
    def test_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(4)
        from gdal_spark import codecs
        arrs = {f"c{i}": rng.integers(0, 60, (8, 9)).astype(np.uint8)
                for i in range(3)}
        pal = rng.integers(0, 256, (64, 3)).astype(np.uint8)
        from gdal_spark.formats.gif import _pal_str
        rows = [(k, bytearray(codecs.encode_raw(v)), 9, 8, "raw",
                 0.0, 1.0, 0.0, 0.0, 0.0, -1.0, 4326, None,
                 _pal_str(pal))
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double, "
            "palette string")
        B.write_bsb(src, str(tmp_path))
        df = B.scan_bsb(spark, str(tmp_path / "*.kap"))
        got = {r.image_id: r for r in df.collect()}
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)
