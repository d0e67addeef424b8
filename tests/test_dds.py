"""DDS driver tests (formats.dds).

Conformance per autotest/gdrivers/dds.py's contract on the
checked-in fixtures (provenance in tests/data/README.md): the
uncompressed DDS must decode to per-band checksums EQUAL to its
stefan_full_rgba.tif ground truth (12603/58561/36064/10807, TIFF
side decoded by the conformance-pinned gtiff driver). The DXT1/DXT5
S3TC codecs are validated by exact palette-math block tests and a
full-image round-trip PSNR bound (the reference's crunch encoder
output is not byte-replicated — our encoder is a deterministic
min/max-endpoint one, as documented).
"""

import os

import numpy as np

from gdal_spark.checksum import gdal_checksum
from gdal_spark.codecs import psnr
from gdal_spark.formats.dds import format_dds, parse_dds, scan_dds
from gdal_spark.formats.gtiff import parse_gtiff

DATA = os.path.join(os.path.dirname(__file__), "data", "dds")


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _ref():
    return parse_gtiff(_read("stefan_full_rgba.tif"))[0]


class TestDds:
    def test_uncompressed_equals_tiff(self):
        rgba, comp = parse_dds(
            _read("stefan_full_rgba_no_compression.dds"))
        ref = _ref()
        assert comp == "NONE"
        assert rgba.shape == ref.shape == (150, 162, 4)
        assert [gdal_checksum(rgba[:, :, i]) for i in range(4)] == \
            [gdal_checksum(ref[:, :, i]) for i in range(4)] == \
            [12603, 58561, 36064, 10807]

    def test_none_roundtrip_exact(self):
        ref = _ref()
        dec, _ = parse_dds(format_dds(ref, "NONE"))
        assert np.array_equal(ref, dec)

    def test_dxt_roundtrip_psnr(self):
        ref = _ref()
        for comp in ("DXT1", "DXT5"):
            dec, got = parse_dds(format_dds(ref, comp))
            assert got == comp
            assert psnr(ref[:, :, :3].astype(np.float64),
                        dec[:, :, :3].astype(np.float64)) >= 30.0
        # DXT5 preserves alpha closely
        dec, _ = parse_dds(format_dds(ref, "DXT5"))
        err = np.abs(ref[:, :, 3].astype(int) -
                     dec[:, :, 3].astype(int)).mean()
        assert err < 2.0

    def test_dxt1_palette_math(self):
        # one flat block: endpoints equal -> palette[0] everywhere
        block = np.full((4, 4, 4), 200, np.uint8)
        block[:, :, 3] = 255
        dec, _ = parse_dds(format_dds(block, "DXT1"))
        # 565 quantization error bound: (v<<3)|(v>>2) replication
        assert np.all(np.abs(dec[:, :, :3].astype(int) - 200) <= 8)

    def test_scan(self, spark):
        from gdal_spark import codecs

        df = scan_dds(
            spark,
            os.path.join(DATA, "*.dds"))
        r = df.collect()[0]
        arr = codecs.decode_raw(bytes(r.bytes))
        assert gdal_checksum(arr[:, :, 0]) == 12603
        assert r.compression == "NONE"
