"""RMF + PDS4 driver tests (formats.rmf, formats.pds4).

Conformance quoted from autotest/gdrivers/{rmf,pds4}.py on the
checked-in fixtures (provenance in tests/data/README.md): all
ELEVEN quoted RMF band checksums — byte 4672, byte-lzw 40503,
float64.mtw 4672, rgbsmall 21212/21053/21349, rgbsmall-lzw
40503/41429/40238 (the from-scratch 12-bit hash-table LZW), big-
endian 7782, 1bit 34325, 4bit(+lzw) 55221 — and the PDS4 label
quartet (IM 1.7/1.B/1.D/1.G) at cs 4672 with the quoted
km->m-normalized geotransform.
"""

import glob
import os

import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.pds4 import read_pds4, scan_pds4
from gdal_spark.formats.rmf import parse_rmf, scan_rmf

DATA = os.path.join(os.path.dirname(__file__), "data")


def _rmf(name):
    with open(os.path.join(DATA, "rmf", name), "rb") as f:
        return parse_rmf(f.read())


class TestRmf:
    @pytest.mark.parametrize("name,want", [
        ("byte.rsw", [4672]),
        ("byte-lzw.rsw", [40503]),
        ("float64.mtw", [4672]),
        ("rgbsmall.rsw", [21212, 21053, 21349]),
        ("rgbsmall-lzw.rsw", [40503, 41429, 40238]),
        ("1bit.rsw", [34325]),
        ("4bit.rsw", [55221]),
        ("4bit-lzw.rsw", [55221]),
    ])
    def test_quoted_checksums(self, name, want):
        bands, gt, info = _rmf(name)
        assert [gdal_checksum(b) for b in bands] == want

    def test_big_endian(self):
        bands, gt, info = _rmf("big-endian.rsw")
        assert gdal_checksum(bands[0]) == 7782
        assert len(bands) == 3

    def test_byte_georef(self):
        bands, gt, info = _rmf("byte.rsw")
        assert gt[0] == 440720.0 and gt[1] == 60.0
        assert gt[3] == 3751320.0

    def test_mtw_dtype(self):
        import numpy as np

        bands, gt, info = _rmf("float64.mtw")
        assert bands[0].dtype == np.float64
        assert info["mtw"] is True

    def test_palette_present(self):
        bands, gt, info = _rmf("4bit.rsw")
        assert info["color_table"] is not None
        assert info["color_table"].shape == (16, 3)


class TestPds4:
    def test_all_label_versions(self):
        for xml in sorted(glob.glob(
                os.path.join(DATA, "pds4", "*.xml"))):
            bands, gt, info = read_pds4(xml)
            assert gdal_checksum(bands[0]) == 4672, xml
            assert gt == (-59280.0, 60.0, 0.0, 3751320.0, 0.0,
                          -60.0), xml


class TestScan:
    def test_scan_rmf(self, spark):
        from gdal_spark import codecs

        df = scan_rmf(spark, os.path.join(DATA, "rmf", "*.rsw"))
        rows = {r.image_id: r for r in df.collect()}
        arr = codecs.decode_raw(bytes(rows["byte.rsw#0"].bytes))
        assert gdal_checksum(arr) == 4672
        assert rows["rgbsmall.rsw#1"] is not None

    def test_scan_pds4(self, spark):
        from gdal_spark import codecs

        df = scan_pds4(spark, os.path.join(DATA, "pds4", "*.xml"))
        rows = df.collect()
        assert len(rows) == 4
        for r in rows:
            arr = codecs.decode_raw(bytes(r.bytes))
            assert gdal_checksum(arr) == 4672
            assert r.gt0 == -59280.0
