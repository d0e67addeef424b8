"""ADRG driver tests (formats.adrg over formats.iso8211).

Conformance quoted from autotest/gdrivers/adrg.py on the checked-in
fixtures (provenance in tests/data/README.md): SMALL_ADRG band-1
checksum 62833; the ZNA9 (north polar) and ZNA18 (south polar)
quoted geotransforms at 1e-5 (we match exactly); 128x128 tile
assembly with the TIM empty-tile index.
"""

import os

import numpy as np

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.adrg import parse_adrg, parse_gen, scan_adrg

DATA = os.path.join(os.path.dirname(__file__), "data", "adrg")


def _pair(sub):
    with open(os.path.join(DATA, sub, "ABCDEF01.GEN"), "rb") as f:
        gen = f.read()
    with open(os.path.join(DATA, sub, "ABCDEF01.IMG"), "rb") as f:
        img = f.read()
    return gen, img


class TestAdrg:
    def test_small_adrg_checksum(self):
        rgb, gt, d = parse_adrg(*_pair("SMALL_ADRG"))
        assert rgb.shape == (128, 128, 3)
        assert gdal_checksum(rgb[:, :, 0]) == 62833
        assert d["nam"] == "ABCDEF01"
        # geographic zone: gt from LSO/PSO and ARV/BRV
        assert abs(gt[1] - 360.0 / 46067) < 1e-12
        assert abs(gt[3] - (48 + 0.5 / 3600)) < 1e-9

    def test_zna9_geotransform(self):
        rgb, gt, d = parse_adrg(*_pair("SMALL_ADRG_ZNA9"))
        exp = (-307675.73602473765, 100.09145391818853, 0.0,
               -179477.5051066006, 0.0, -100.09145391818853)
        assert max(abs(a - b) for a, b in zip(gt, exp)) <= 1e-5
        assert d["zna"] == 9

    def test_zna18_geotransform(self):
        rgb, gt, d = parse_adrg(*_pair("SMALL_ADRG_ZNA18"))
        exp = (-307675.73602473765, 100.09145391818853, 0.0,
               179477.5051066006, 0.0, -100.09145391818853)
        assert max(abs(a - b) for a, b in zip(gt, exp)) <= 1e-5
        assert d["zna"] == 18

    def test_gen_metadata(self):
        gen, _ = _pair("SMALL_ADRG")
        d = parse_gen(gen)[0]
        assert d["sca"] == 8691341
        assert d["tif"] is True
        assert d["tile_index"] == [1]
        assert d["bad"] == "ABCDEF01.IMG"

    def test_scan(self, spark):
        from gdal_spark import codecs

        df = scan_adrg(
            spark, os.path.join(DATA, "*", "ABCDEF01.GEN"))
        rows = df.collect()
        # 3 products x 3 bands
        assert len(rows) == 9
        r = [x for x in rows if x.zna not in (9, 18) and x.band == 0][0]
        arr = codecs.decode_raw(bytes(r.bytes))
        assert gdal_checksum(arr) == 62833
        assert r.srid == 4326
