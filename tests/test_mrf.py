"""MRF driver tests (formats.mrf).

Conformance on the checked-in autotest fixtures (provenance in
tests/data/README.md): the byte dataset decodes to checksum 4672
through FIVE page codecs — NONE, PNG (the reference's default when
the Compression tag is absent), DEFLATE, TIF, and the from-scratch
LERC v1 decoder (CntZImage mask RLE + bit-stuffed quanta blocks) —
with the byte.tif UTM bounding-box geotransform; the lossy JPEG
variant is regression-pinned at 4658.
"""

import os

import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.mrf import decode_lerc1, read_mrf, scan_mrf

DATA = os.path.join(os.path.dirname(__file__), "data", "mrf")


class TestMrf:
    @pytest.mark.parametrize("sub,want", [
        ("none", 4672), ("png", 4672), ("deflate", 4672),
        ("tif", 4672), ("lerc_v1", 4672), ("jpeg", 4658),
    ])
    def test_checksums(self, sub, want):
        arr, gt, meta = read_mrf(os.path.join(DATA, sub,
                                              "byte.mrf"))
        assert arr.shape == (20, 20)
        assert gdal_checksum(arr) == want
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)

    def test_lerc1_direct(self):
        with open(os.path.join(DATA, "lerc_v1", "byte.lrc"),
                  "rb") as f:
            z = decode_lerc1(f.read())
        assert z.shape == (512, 512)
        assert gdal_checksum(z[:20, :20].astype("uint8")) == 4672

    def test_lerc2_rejected(self):
        with pytest.raises(ValueError, match="LERC2"):
            decode_lerc1(b"Lerc2 garbage data here.....")

    def test_scan(self, spark):
        from gdal_spark import codecs

        df = scan_mrf(spark, os.path.join(DATA, "*", "byte.mrf"))
        rows = {r.image_id: r for r in df.collect()}
        assert len(rows) == 6
        for key in ("none/byte.mrf", "lerc_v1/byte.mrf",
                    "png/byte.mrf"):
            arr = codecs.decode_raw(bytes(rows[key].bytes))
            assert gdal_checksum(arr) == 4672
