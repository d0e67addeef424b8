"""DIMAP v1/v2 + TIL composite-product tests (formats.dimap).

Conformance quoted from autotest/gdrivers/{dimap,til}.py on the
checked-in fixtures (provenance in tests/data/README.md):

- DIMAP v1: 6000x6000 single band via the VRT-in-.TIF indirection,
  100x100-window checksum 21586, PROCESSING_LEVEL == "1A",
  SPECTRAL_PHYSICAL_BIAS == "0.000000", 4 corner tie-point GCPs;
- DIMAP v2 bundle: 20x30x4 from R1C1+R2C1 components, band-1
  checksum 7024;
- TIL: checksum 4672 (byte.tif ramp) with satId "WV03" from the
  sibling .imd.
"""

import os

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.dimap import (
    read_dimap,
    read_til,
    scan_dimap,
    scan_til,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestDimapV1:
    def test_window_checksum_and_metadata(self):
        arr, info = read_dimap(
            os.path.join(DATA, "dimap", "METADATA.DIM"))
        assert arr.shape == (6000, 6000, 1)
        assert gdal_checksum(arr[:100, :100, 0]) == 21586
        assert info["PROCESSING_LEVEL"] == "1A"
        assert info["SPECTRAL_PHYSICAL_BIAS"] == "0.000000"
        assert len(info["gcps"]) == 4
        assert info["srid"] == 4326


class TestDimapV2:
    def test_bundle_checksum(self):
        arr, info = read_dimap(os.path.join(DATA, "dimap2",
                                            "bundle"))
        assert arr.shape == (30, 20, 4)
        assert gdal_checksum(arr[:, :, 0]) == 7024

    def test_single_component(self):
        arr, info = read_dimap(
            os.path.join(DATA, "dimap2", "single_component"))
        assert arr.shape == (30, 20, 4)
        assert info["NBANDS"] == 4


class TestTil:
    def test_checksum_and_imd(self):
        arr, md = read_til(os.path.join(DATA, "til", "testtil.til"))
        assert arr.shape == (20, 20)
        assert gdal_checksum(arr) == 4672
        assert md["satId"] == "WV03"
        assert "cloudCover" in md


class TestScan:
    def test_scan_dimap(self, spark):
        from gdal_spark import codecs

        df = scan_dimap(
            spark, os.path.join(DATA, "dimap2", "bundle"))
        rows = sorted(df.collect(), key=lambda r: r.band)
        assert len(rows) == 4
        arr = codecs.decode_raw(bytes(rows[0].bytes))
        assert gdal_checksum(arr) == 7024

    def test_scan_til(self, spark):
        from gdal_spark import codecs

        df = scan_til(spark, os.path.join(DATA, "til", "*.til"))
        r = df.collect()[0]
        assert gdal_checksum(
            codecs.decode_raw(bytes(r.bytes))) == 4672
        assert r.sat_id == "WV03"
