"""NDF + FAST Landsat driver tests.

Conformance quoted from autotest/gdrivers/{ndf,fast}.py:
LE7134052000500350 first row at checksum 6510 + the quoted gt
(320325.75, 14.25, 0, 1383062.25, 0, -14.25); the HPN FAST product's
first 5000x1 at 60323 with the ACQUISITION_DATE/SATELLITE/SENSOR
metadata goldens; the two-band HTM product's band-2 first 7000x1 at
19110. Semantics: frmts/raw/{ndfdataset,fastdataset}.cpp.
Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import landsat as L

DATA = os.path.join(os.path.dirname(__file__), "data", "landsat")


def _b(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _t(name):
    with open(os.path.join(DATA, name), encoding="latin-1") as f:
        return f.read()


class TestNdf:
    def test_le7(self):
        arr, gt, nd, meta = L.parse_ndf(
            _t("LE7134052000500350.H3"),
            [_b("LE7134052000500350.I8")])
        assert arr.shape == (14680, 15620)
        # the autotest window: first full row of band 1
        assert gdal_checksum(arr[0:1, :15620]) == 6510
        assert gt == (320325.75, 14.25, 0.0, 1383062.25, 0.0, -14.25)
        assert meta == "LANDSAT_7|EDC_ETM+|UTM|46"
        # truncated band file zero-fills past row 1
        assert int(arr[2].max()) == 0

    def test_byte_only(self):
        hdr = _t("LE7134052000500350.H3").replace(
            "PIXEL_FORMAT=BYTE", "PIXEL_FORMAT=WORD")
        with pytest.raises(ValueError, match="BYTE"):
            L.parse_ndf(hdr, [b""])


class TestFast:
    def test_hpn(self):
        text = _t("L71118038_03820020111_HPN.FST")
        kv, names, corners = L.parse_fast_header(text)
        assert kv["ACQUISITION_DATE"] == "20020111"
        assert kv["SATELLITE"] == "LANDSAT7"
        assert kv["SENSOR"] == "ETM+"
        assert names == ["L71118038_03820020111_B80.FST"]
        arr, gt, nd, meta = L.parse_fast(
            text, [_b("L71118038_03820020111_B80.FST")])
        assert arr.shape == (14351, 15971)
        assert gdal_checksum(arr[0:1, :5000]) == 60323

    def test_htm_two_bands(self):
        text = _t("L71230079_07920021111_HTM.FST")
        _kv, names, corners = L.parse_fast_header(text)
        assert names == ["L71230079_07920021111_B61.FST",
                         "L72230079_07920021111_B62.FST"]
        arr, *_ = L.parse_fast(
            text, [_b("L71230079_07920021111_B61.FST"),
                   _b("L72230079_07920021111_B62.FST")])
        assert arr.shape[2] == 2
        assert gdal_checksum(arr[0:1, :7000, 1]) == 19110
        # corner projection coordinates parse
        assert corners["UL"] == (3528432.25, 7071172.0)
        assert corners["LR"] == (3751242.25, 6860842.0)


class TestScans:
    def test_ndf_scan(self, spark):
        df = L.scan_ndf(spark, os.path.join(DATA, "*.H3"))
        rows = df.collect()
        assert len(rows) == 1
        assert rows[0].gt0 == 320325.75
        assert rows[0].w == 15620

    def test_fast_scan(self, spark):
        df = L.scan_fast(spark, os.path.join(DATA, "*_HPN.FST"))
        rows = df.collect()
        assert len(rows) == 1
        assert rows[0].meta.split("|")[0] == "20020111"
