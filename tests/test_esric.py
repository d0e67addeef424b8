"""Esri Compact Cache V2 / tpkx tests (formats.esric).

Conformance quoted from autotest/gdrivers/esric.py on the
checked-in fixtures (provenance in tests/data/README.md): the
Layers.tar LOD-1 512x512 band-2 checksum 46857 (four PNG tiles,
one grayscale); the Usa.tpkx top-level (8192, LOD 5) band
checksums 61275/57672/61542/19476 and the LOD-3 band-2 checksum
53503; the quoted full-web-mercator geotransform anchors; missing
levels/tiles read as zeros.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.esric import read_esric_level, scan_esric

DATA = os.path.join(os.path.dirname(__file__), "data", "esric")


class TestEsric:
    def test_layers_tar_lod1(self):
        arr, gt = read_esric_level(
            os.path.join(DATA, "Layers.tar"), 1)
        assert arr.shape == (512, 512, 4)
        assert gdal_checksum(arr[:, :, 1]) == 46857

    def test_layers_missing_level_black(self):
        # LOD 0 has no bundle in the fixture tree at full coverage
        arr, gt = read_esric_level(
            os.path.join(DATA, "Layers.tar"), 0)
        assert arr.shape == (256, 256, 4)

    def test_layers_geotransform(self):
        arr, gt = read_esric_level(
            os.path.join(DATA, "Layers.tar"), 3)
        assert gt[0] == pytest.approx(-20037508, abs=1)
        assert gt[1] == pytest.approx(20037508 / 1024, abs=1)
        assert gt[3] == pytest.approx(20037508, abs=1)

    def test_tpkx_top_level(self):
        arr, gt = read_esric_level(os.path.join(DATA, "Usa.tpkx"),
                                   5)
        assert arr.shape == (8192, 8192, 4)
        assert [gdal_checksum(arr[:, :, i]) for i in range(4)] == \
            [61275, 57672, 61542, 19476]
        assert gt[1] == pytest.approx(20037508 / 4096, abs=1)

    def test_tpkx_lod3(self):
        arr, gt = read_esric_level(os.path.join(DATA, "Usa.tpkx"),
                                   3)
        assert gdal_checksum(arr[:, :, 1]) == 53503

    def test_scan_bundles(self, spark):
        from gdal_spark import codecs

        df = scan_esric(spark, os.path.join(DATA, "Layers.tar"), 1)
        rows = df.collect()
        assert len(rows) == 1  # one 128x128-tile bundle covers LOD1
        arr = codecs.decode_raw(bytes(rows[0].bytes))
        # the bundle canvas covers the whole 512px level here
        assert gdal_checksum(arr[:512, :512, 1]) == 46857
        assert rows[0].srid == 3857
