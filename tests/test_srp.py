"""SRP (USRP) driver tests (formats.srp over formats.iso8211).

Conformance quoted from autotest/gdrivers/srp.py on the checked-in
fixtures (provenance in tests/data/README.md): the FKUSRP01 product
in PCB 0/4/8 compression modes — checksum 24576 each, the quoted
UTM zone 17 geotransform (500000, 5, 0, 5000000, 0, -5), the
quoted 4-entry QAL color table ((0,0,0), (255,0,0), (0,255,0),
(0,0,255)), and the SRP_NAM/SCA/ZNA/PSP metadata goldens.
"""

import json
import os

import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.srp import parse_srp, parse_srp_gen, scan_srp

DATA = os.path.join(os.path.dirname(__file__), "data", "srp")


def _triple(pcb):
    d = os.path.join(DATA, f"USRP_PCB{pcb}")
    out = []
    for ext in ("GEN", "IMG", "QAL"):
        with open(os.path.join(d, f"FKUSRP01.{ext}"), "rb") as f:
            out.append(f.read())
    return out


class TestSrp:
    @pytest.mark.parametrize("pcb", (0, 4, 8))
    def test_checksum_gt_palette(self, pcb):
        gen, img, qal = _triple(pcb)
        arr, gt, ct, d = parse_srp(gen, img, qal)
        assert arr.shape == (128, 128)
        assert gdal_checksum(arr) == 24576
        assert gt == (500000.0, 5.0, 0.0, 5000000.0, 0.0, -5.0)
        assert ct[:4] == [(0, 0, 0, 0), (1, 255, 0, 0),
                          (2, 0, 255, 0), (3, 0, 0, 255)]
        assert d["pcb"] == pcb

    def test_gen_metadata(self):
        gen, _, _ = _triple(0)
        d = parse_srp_gen(gen)
        assert d["nam"] == "FKUSRP"
        assert d["product"] == "USRP"
        assert d["sca"] == 50000
        assert d["zna"] == 17
        assert d["psp"] == 100.0

    def test_scan(self, spark):
        from gdal_spark import codecs

        df = scan_srp(
            spark, os.path.join(DATA, "*", "FKUSRP01.GEN"))
        rows = df.collect()
        assert len(rows) == 3
        for r in rows:
            arr = codecs.decode_raw(bytes(r.bytes))
            assert gdal_checksum(arr) == 24576
            assert r.srid == 32617
            assert (r.gt0, r.gt1, r.gt3, r.gt5) == (
                500000.0, 5.0, 5000000.0, -5.0)
            ct = json.loads(r.color_table)
            assert ct[1] == [1, 255, 0, 0]
