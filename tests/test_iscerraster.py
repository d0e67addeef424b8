"""ISCE + RRASTER driver tests.

Conformance quoted from autotest/gdrivers/{isce,rraster}.py:
isce.slc (CFLOAT BIL) at the complex-interleave checksum 350;
byte_rraster(.1).grd at checksum 4672 + the byte.tif gt golden;
rgba_rraster's four bands at the quoted 19/27/22/7 checksums.
Semantics: frmts/raw/{iscedataset,rrasterdataset}.cpp.
Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import iscerraster as IR

DATA = os.path.join(os.path.dirname(__file__), "data", "iscerraster")


def _b(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _t(name):
    with open(os.path.join(DATA, name), encoding="latin-1") as f:
        return f.read()


class TestIsce:
    def test_slc(self):
        arr, gt, nd, meta = IR.parse_isce(_b("isce.slc"),
                                          _t("isce.slc.xml"))
        assert arr.dtype == np.complex64 and arr.shape == (10, 12)
        h, w = arr.shape
        inter = np.empty((h, 2 * w), np.float64)
        inter[:, 0::2] = arr.real
        inter[:, 1::2] = arr.imag
        assert gdal_checksum(inter) == 350
        assert meta == "slc"

    @pytest.mark.parametrize("dt", [np.uint8, np.int16, np.int32,
                                    np.float32, np.float64,
                                    np.complex64])
    def test_roundtrip(self, dt):
        rng = np.random.default_rng(2)
        if dt == np.complex64:
            arr = (rng.normal(0, 1, (4, 6))
                   + 1j * rng.normal(0, 1, (4, 6))).astype(dt)
        elif np.issubdtype(dt, np.floating):
            arr = rng.normal(0, 40, (4, 6, 2)).astype(dt)
        else:
            arr = rng.integers(0, 100, (4, 6, 2)).astype(dt)
        data, xml = IR.format_isce(arr)
        a2, *_ = IR.parse_isce(data, xml)
        assert a2.dtype == np.dtype(dt)
        assert np.array_equal(a2, arr)


class TestRraster:
    @pytest.mark.parametrize("name", ["byte_rraster", "byte_rraster1"])
    def test_byte(self, name):
        arr, gt, nd, meta = IR.parse_rraster(
            _t(name + ".grd"), _b(name + ".gri"))
        assert arr.dtype == np.uint8 and arr.shape == (20, 20)
        assert gdal_checksum(arr) == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert nd is None  # NA / NaN both mean unset
        assert meta.split("|")[0] == "byte"

    def test_rgba(self):
        arr, *_ = IR.parse_rraster(_t("rgba_rraster.grd"),
                                   _b("rgba_rraster.gri"))
        assert arr.shape == (2, 2, 4)
        cs = [gdal_checksum(arr[:, :, b]) for b in range(4)]
        assert cs == [19, 27, 22, 7]

    @pytest.mark.parametrize("dt", [np.uint8, np.int16, np.int32,
                                    np.float32, np.float64])
    def test_roundtrip(self, dt):
        rng = np.random.default_rng(3)
        arr = (rng.normal(0, 40, (5, 7, 2)).astype(dt)
               if np.issubdtype(dt, np.floating)
               else rng.integers(0, 100, (5, 7, 2)).astype(dt))
        gt = (-10.0, 0.5, 0.0, 40.0, 0.0, -0.5)
        grd, gri = IR.format_rraster(arr, gt, nodata=-9)
        a2, g2, nd, _ = IR.parse_rraster(grd, gri)
        assert np.array_equal(a2, arr)
        assert g2 == gt
        assert nd == -9.0


class TestScans:
    def test_isce_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(4)
        from gdal_spark import codecs
        arrs = {f"s{i}": rng.integers(0, 100, (4, 6))
                .astype(np.int16) for i in range(3)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 6, 4, "raw",
                 0.0, 1.0, 0.0, 4.0, 0.0, -1.0, 0, None)
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        IR.write_isce(src, str(tmp_path))
        df = IR.scan_isce(spark, str(tmp_path / "*.slc"))
        got = {r.image_id: r for r in df.collect()}
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)

    def test_rraster_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(5)
        from gdal_spark import codecs
        arrs = {f"r{i}": rng.normal(0, 5, (4, 6)).astype(np.float32)
                for i in range(3)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 6, 4, "raw",
                 10.0, 2.0, 0.0, 90.0, 0.0, -2.0, 0, -99.0)
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        IR.write_rraster(src, str(tmp_path))
        df = IR.scan_rraster(spark, str(tmp_path / "*.grd"))
        got = {r.image_id: r for r in df.collect()}
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)
            assert got[k].nodata == -99.0
            assert got[k].gt0 == 10.0
