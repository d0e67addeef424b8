"""Generic CEOS driver tests (formats.ceos).

Conformance quoted from autotest/gdrivers/ceos.py on the
checked-in fixture (provenance in tests/data/README.md): the
IMAGERY-75K.L-3 truncated IRS transfer — band 4, window
(0,0,5932,3), checksum 9956 — through the little-endian record
prefixes (the reference's nonzero-leading-byte probe), the ASCII
FDR layout fields and the band-interleaved-by-line addressing.
"""

import os

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.ceos import (
    parse_ceos_header,
    read_ceos_window,
    scan_ceos,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "ceos")


def _buf():
    with open(os.path.join(DATA, "IMAGERY-75K.L-3"), "rb") as f:
        return f.read()


class TestCeos:
    def test_header(self):
        h = parse_ceos_header(_buf())
        assert (h["bands"], h["lines"], h["pixels"]) == (4, 5936,
                                                         5932)
        assert h["bits"] == 8 and h["prefix"] == 32
        assert h["fdr_len"] == 540  # little-endian record length

    def test_quoted_window_checksum(self):
        arr = read_ceos_window(_buf(), 4, 0, 3, 0, 5932)
        assert arr.shape == (3, 5932)
        assert gdal_checksum(arr) == 9956

    def test_scan_truncated(self, spark):
        from gdal_spark import codecs

        df = scan_ceos(spark, os.path.join(DATA, "*.L-3"),
                       max_lines=3)
        rows = {r.band: r for r in df.collect()}
        assert len(rows) == 4
        assert rows[4].declared_lines == 5936
        a = codecs.decode_raw(bytes(rows[4].bytes))
        assert gdal_checksum(a[:3, :5932]) == 9956
