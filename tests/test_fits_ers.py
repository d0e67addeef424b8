"""FITS + ERS driver tests.

Conformance quoted from autotest/gdrivers/fits.py
(test_fits_read_georef_merc: byte_merc.fits gt golden at 1e-3;
test_fits_offscale: BZERO -0.0039525691699605 / BSCALE 1.00395256917;
the multi-HDU walk tests) and autotest/gdrivers/ers.py (test_ers_1:
srtm checksum 64074 + the Stats metadata; test_ers_4: ers_dem
checksum 56588 + the DMS gt golden with HeaderOffset 512;
test_ers_5: Signed8BitInteger; test_ers_7: all-lowercase header).
Semantics: frmts/fits/fitsdataset.cpp, frmts/ers/ersdataset.cpp.
Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import ers as E
from gdal_spark.formats import fits as FT

DATA = os.path.join(os.path.dirname(__file__), "data")


def _bytes(sub, name):
    with open(os.path.join(DATA, sub, name), "rb") as f:
        return f.read()


def _text(sub, name):
    with open(os.path.join(DATA, sub, name), "r",
              encoding="latin-1") as f:
        return f.read()


class TestFitsConformance:
    def test_byte_merc(self):
        arr, gt, nodata, scale, offset, proj, _ = FT.parse_fits(
            _bytes("fits", "byte_merc.fits"))[0]
        assert arr.shape == (20, 20) and arr.dtype == np.uint8
        # autotest quotes the gt at abs=1e-3; checksum is our own
        # golden (the fixture is not checksum-pinned upstream)
        exp = (-13095897.481058259, 72.23522015778646, 0.0,
               3991653.2130816197, 0.0, -72.23522015778646)
        assert gt == pytest.approx(exp, abs=1e-3)
        assert gdal_checksum(arr) == 4855
        assert nodata == -9999.0
        assert proj.split("|")[:2] == ["MER", "Earth"]
        assert float(proj.split("|")[2]) == 6378206.4

    def test_offset_scale(self):
        arr, gt, nodata, scale, offset, *_ = FT.parse_fits(
            _bytes("fits", "offset_scale_no_georef.fits"))[0]
        assert gt is None
        assert scale == 1.00395256917
        assert offset == -0.0039525691699605

    def test_image_in_second_hdu(self):
        hdus = FT.parse_fits(_bytes("fits", "image_in_second_hdu.fits"))
        assert len(hdus) == 1
        assert hdus[0][0].shape == (2, 1)

    def test_two_image_hdus(self):
        hdus = FT.parse_fits(
            _bytes("fits", "image_in_first_and_second_hdu.fits"))
        assert [h[0].shape for h in hdus] == [(2, 1), (3, 1)]
        assert hdus[0][6] == "FIRST_IMAGE"

    def test_table_hdu_skipped(self):
        hdus = FT.parse_fits(_bytes(
            "fits", "image_in_second_and_fourth_hdu_table_in_third.fits"))
        assert [h[0].shape for h in hdus] == [(2, 1), (3, 1)]

    @pytest.mark.parametrize("name", ["empty_primary_hdu.fits",
                                      "binary_table.fits"])
    def test_no_image_raises(self, name):
        with pytest.raises(ValueError, match="no image HDU"):
            FT.parse_fits(_bytes("fits", name))


class TestFitsRoundTrip:
    GT = (-100.0, 25.0, 0.0, 5000.0, 0.0, -25.0)

    @pytest.mark.parametrize("dt", [np.uint8, np.int16, np.int32,
                                    np.int64, np.float32, np.float64])
    def test_write_parse(self, dt):
        rng = np.random.default_rng(3)
        arr = (rng.normal(0, 40, (5, 7)).astype(dt)
               if np.issubdtype(dt, np.floating)
               else rng.integers(0, 120, (5, 7)).astype(dt))
        a2, gt2, nd, *_ = FT.parse_fits(
            FT.format_fits(arr, self.GT, nodata=7))[0]
        assert a2.dtype == np.dtype(dt)
        assert np.array_equal(a2, arr)
        assert gt2 == pytest.approx(self.GT, abs=1e-6)
        assert nd == 7.0

    def test_multiband(self):
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 255, (4, 6, 3)).astype(np.uint8)
        a2, *_ = FT.parse_fits(FT.format_fits(arr, self.GT))[0]
        assert np.array_equal(a2, arr)

    def test_rejects_rotation(self):
        with pytest.raises(ValueError, match="north-up"):
            FT.format_fits(np.zeros((2, 2), np.uint8),
                           (0, 1, 0.1, 0, 0, -1))


class TestErsConformance:
    def test_srtm(self):
        arr, gt, nodata, proj, stats = E.parse_ers(
            _text("ers", "srtm.ers"), _bytes("ers", "srtm"))
        assert arr.dtype == np.int16 and arr.shape == (10, 12)
        assert gdal_checksum(arr) == 64074
        assert nodata == 9999.0
        # test_ers_1's STATISTICS_* metadata golden
        assert stats == "-4315|-3744|-4020.25|-4000"
        assert proj.split("|")[:2] == ["GEODETIC", "WGS84"]
        # DMS registration at cell (1,1)
        assert gt == pytest.approx(
            (-180.00833333, 0.00833333, 0.0,
             -59.99166667, 0.0, -0.00833333), abs=1e-9)

    def test_ers_dem_headeroffset(self):
        arr, gt, nodata, proj, _ = E.parse_ers(
            _text("ers", "ers_dem.ers"), _bytes("ers", "ers_dem"))
        assert arr.dtype == np.float32 and arr.shape == (36, 30)
        assert gdal_checksum(arr) == 56588
        assert gt == pytest.approx(
            (143.59625, 0.025, 0.0, -39.38125, 0.0, -0.025), abs=1e-9)
        assert nodata == -9999.0
        assert proj.split("|")[1] == "GDA94"

    def test_signed8bit(self):
        arr, *_ = E.parse_ers(_text("ers", "8s.ers"), _bytes("ers", "8s"))
        assert arr.dtype == np.int8
        assert arr.shape == (10, 10, 3)

    def test_caseinsensitive(self):
        # all-lowercase keys; zero-length companion zero-fills
        arr, *_ = E.parse_ers(
            _text("ers", "caseinsensitive.ers"),
            _bytes("ers", "caseinsensitive"))
        assert arr.dtype == np.float32
        assert arr.shape == (5366, 2662)
        assert int(arr[0].max()) == 0


class TestErsRoundTrip:
    GT = (-100.0, 25.0, 0.0, 5000.0, 0.0, -25.0)

    @pytest.mark.parametrize("dt", [np.uint8, np.int8, np.int16,
                                    np.uint16, np.int32, np.uint32,
                                    np.float32, np.float64])
    def test_write_parse(self, dt):
        rng = np.random.default_rng(5)
        arr = (rng.normal(0, 40, (5, 7)).astype(dt)
               if np.issubdtype(dt, np.floating)
               else rng.integers(0, 120, (5, 7)).astype(dt))
        hdr, data = E.format_ers(arr, self.GT, nodata=3)
        a2, gt2, nd, *_ = E.parse_ers(hdr, data)
        assert a2.dtype == np.dtype(dt)
        assert np.array_equal(a2, arr)
        assert gt2 == self.GT
        assert nd == 3.0

    def test_multiband_bil(self):
        rng = np.random.default_rng(6)
        arr = rng.integers(0, 255, (4, 6, 3)).astype(np.uint8)
        hdr, data = E.format_ers(arr, self.GT)
        a2, *_ = E.parse_ers(hdr, data)
        assert np.array_equal(a2, arr)
        # BIL: first w bytes of line 0 are band 0's row 0
        assert data[:6] == bytes(arr[0, :, 0])


class TestScans:
    def test_fits_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(9)
        arrs = {f"f{i}": rng.integers(0, 255, (5, 6)).astype(np.uint8)
                for i in range(4)}
        rows = []
        from gdal_spark import codecs
        for name, arr in arrs.items():
            rows.append((name, bytearray(codecs.encode_raw(arr)),
                         6, 5, "raw", 1.0, 2.0, 0.0, 50.0, 0.0, -2.0,
                         0, None))
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        FT.write_fits(src, str(tmp_path))
        df = FT.scan_fits(spark, str(tmp_path / "*.fits"))
        got = {r.image_id: r for r in df.collect()}
        assert set(got) == set(arrs)
        for name, arr in arrs.items():
            dec = codecs.decode_image(bytes(got[name].bytes), "raw")
            assert np.array_equal(dec, arr)
            assert got[name].gt0 == pytest.approx(1.0, abs=1e-6)

    def test_ers_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(10)
        arrs = {f"e{i}": rng.normal(0, 4, (4, 7)).astype(np.float32)
                for i in range(3)}
        rows = []
        from gdal_spark import codecs
        for name, arr in arrs.items():
            rows.append((name, bytearray(codecs.encode_raw(arr)),
                         7, 4, "raw", 0.0, 1.0, 0.0, 4.0, 0.0, -1.0,
                         0, -9.0))
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        E.write_ers(src, str(tmp_path))
        df = E.scan_ers(spark, str(tmp_path / "*.ers"))
        got = {r.image_id: r for r in df.collect()}
        for name, arr in arrs.items():
            dec = codecs.decode_image(bytes(got[name].bytes), "raw")
            assert np.array_equal(dec, arr)
            assert got[name].nodata == -9.0
