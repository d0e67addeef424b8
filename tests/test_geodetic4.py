"""Geodetic/GIS raw family IV tests: ILWIS / NGSGEOID / LOSLAS /
SIGDEM.

Conformance quoted from autotest/gdrivers/{ilwis,ngsgeoid,loslas}.py:
LanduseSmall.mpr at checksum 2351 with the corner-derived 20 m
georef; both NGSGEOID truncated fixtures at 65534 (each byte order)
with the half-cell-centered georef; wyhpgn.los at the quoted gt AND
the quoted min/max/mean statistics. SIGDEM pinned by roundtrip
(the autotest fixture is a VRT wrapper).
Semantics: frmts/ilwis, frmts/ngsgeoid, frmts/raw/loslasdataset.cpp,
frmts/sigdem. Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import geodetic4 as G4

DATA = os.path.join(os.path.dirname(__file__), "data", "geodetic4")


def _b(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _t(name):
    with open(os.path.join(DATA, name), encoding="latin-1") as f:
        return f.read()


class TestIlwis:
    def test_landuse(self):
        arr, gt, nd, meta = G4.parse_ilwis(
            _t("LanduseSmall.mpr"), _b("LanduseSmall.mp#"),
            _t("LanduseSmall.grf"))
        assert arr.dtype == np.uint8 and arr.shape == (75, 75)
        assert gdal_checksum(arr) == 2351
        assert gt == (795480.0, 20.0, 0.0, 8090520.0, 0.0, -20.0)

    @pytest.mark.parametrize("dt", [np.uint8, np.int16, np.int32,
                                    np.float32, np.float64])
    def test_roundtrip(self, dt):
        rng = np.random.default_rng(9)
        arr = (rng.normal(0, 40, (5, 7)).astype(dt)
               if np.issubdtype(dt, np.floating)
               else rng.integers(0, 100, (5, 7)).astype(dt))
        gt = (-10.0, 0.25, 0.0, 45.0, 0.0, -0.25)
        mpr, data, grf = G4.format_ilwis(arr, gt)
        a2, g2, *_ = G4.parse_ilwis(mpr, data, grf)
        assert np.array_equal(a2, arr)
        assert g2 == pytest.approx(gt, abs=1e-9)


class TestNgsgeoid:
    @pytest.mark.parametrize("name,endian", [
        ("g2009u01_le_truncated.bin", "little"),
        ("g2009u01_be_truncated.bin", "big")])
    def test_truncated(self, name, endian):
        arr, gt, nd, meta = G4.parse_ngsgeoid(_b(name))
        assert gdal_checksum(arr) == 65534
        assert meta == endian
        assert gt[1] == pytest.approx(1 / 60, abs=1e-12)

    def test_roundtrip(self):
        rng = np.random.default_rng(10)
        arr = rng.normal(0, 2, (6, 8)).astype(np.float32)
        gt = (-10.0, 0.25, 0.0, 45.0, 0.0, -0.25)
        a2, g2, *_ = G4.parse_ngsgeoid(G4.format_ngsgeoid(arr, gt))
        assert np.array_equal(a2, arr)
        assert g2 == pytest.approx(gt, abs=1e-9)


class TestLoslas:
    def test_wyhpgn(self):
        arr, gt, nd, meta = G4.parse_loslas(_b("wyhpgn.los"))
        assert meta == "NADGRD"
        assert gt == pytest.approx(
            (-111.625, 0.25, 0.0, 45.625, 0.0, -0.25), abs=1e-9)
        # the quoted statistics golden
        assert arr.min() == pytest.approx(-0.027868999, abs=1e-8)
        assert arr.max() == pytest.approx(0.033906999, abs=1e-8)
        assert arr.mean() == pytest.approx(0.009716129, abs=1e-8)

    def test_roundtrip(self):
        rng = np.random.default_rng(11)
        arr = rng.normal(0, 2, (6, 30)).astype(np.float32)
        gt = (-10.0, 0.25, 0.0, 45.0, 0.0, -0.25)
        a2, g2, *_ = G4.parse_loslas(G4.format_loslas(arr, gt))
        assert np.array_equal(a2, arr)
        assert g2 == pytest.approx(gt, abs=1e-6)

    def test_narrow_rejected(self):
        with pytest.raises(ValueError, match=">= 23"):
            G4.format_loslas(np.zeros((2, 4), np.float32),
                             (0, 1, 0, 2, 0, -1))


class TestSigdem:
    def test_roundtrip_with_nodata(self):
        rng = np.random.default_rng(12)
        arr = np.round(rng.normal(100, 10, (6, 8)), 3)
        arr[0, 0] = np.nan
        gt = (-10.0, 0.25, 0.0, 45.0, 0.0, -0.25)
        a2, g2, nd, srid = G4.parse_sigdem(G4.format_sigdem(arr, gt))
        assert np.isnan(a2[0, 0])
        m = np.isfinite(arr)
        assert np.allclose(a2[m], arr[m], atol=1e-9)
        assert g2 == gt

    def test_magic_rejected(self):
        with pytest.raises(ValueError, match="not a SIGDEM"):
            G4.parse_sigdem(b"NOPEDEM" + b"\0" * 200)


class TestScans:
    def test_ilwis_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(13)
        from gdal_spark import codecs
        arrs = {f"i{i}": rng.integers(0, 200, (5, 6))
                .astype(np.uint8) for i in range(3)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 6, 5, "raw",
                 100.0, 20.0, 0.0, 900.0, 0.0, -20.0, 0, None)
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        G4.write_ilwis(src, str(tmp_path))
        df = G4.scan_ilwis(spark, str(tmp_path / "*.mpr"))
        got = {r.image_id: r for r in df.collect()}
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)
            assert got[k].gt0 == 100.0

    def test_loslas_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(14)
        from gdal_spark import codecs
        arrs = {f"g{i}": rng.normal(0, 1, (4, 25))
                .astype(np.float32) for i in range(2)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 25, 4, "raw",
                 -100.0, 0.25, 0.0, 44.0, 0.0, -0.25, 4326, None)
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        G4.write_loslas(src, str(tmp_path))
        df = G4.scan_loslas(spark, str(tmp_path / "*.los"))
        got = {r.image_id: r for r in df.collect()}
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)
