"""Raw-header grid family II tests: MFF / PAux / DOQ2 / CTG / EIR.

Conformance quoted from autotest/gdrivers/{mff,paux,doq2,ctg,eir}.py:
bytemff at checksum 4672, fakemff + tiled twin at 1, small16.raw
band-2 at 12816 with the Swapped-means-little-endian convention,
C3607614_truncated.NWS first-row band checksums 4201/4010/5820 +
the quoted gt + the QUADRANGLE_NAME metadata golden, fake_grid_cell
band-1 at 21, fakeeir at 1.
Semantics: frmts/raw/{mffdataset,pauxdataset,doq2dataset,
eirdataset}.cpp + frmts/ctg/ctgdataset.cpp.
Provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import rawgrids2 as R

DATA = os.path.join(os.path.dirname(__file__), "data", "rawgrids2")


def _b(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _t(name):
    with open(os.path.join(DATA, name), "r", encoding="latin-1") as f:
        return f.read()


class TestMff:
    def test_bytemff(self):
        arr, gt, nd, meta = R.parse_mff(
            _t("bytemff.hdr"), [("b00", _b("bytemff.b00"))])
        assert arr.shape == (20, 20) and arr.dtype == np.uint8
        assert gdal_checksum(arr) == 4672
        assert meta.split("|")[2] == "UTM"

    def test_fakemff_plain_and_tiled(self):
        for hdr, band in (("fakemff.hdr", "fakemff.b0"),
                          ("fakemfftiled.hdr", "fakemfftiled.b0")):
            arr, *_ = R.parse_mff(_t(hdr), [("b0", _b(band))])
            assert arr.shape == (1, 1)
            assert gdal_checksum(arr) == 1

    def test_roundtrip(self):
        rng = np.random.default_rng(6)
        arr = rng.integers(0, 255, (5, 7, 3)).astype(np.uint8)
        hdr, files = R.format_mff(arr)
        a2, *_ = R.parse_mff(hdr, files)
        assert np.array_equal(a2, arr)
        assert [e for e, _ in files] == ["b00", "b01", "b02"]


class TestPaux:
    def test_small16(self):
        arr, gt, nd, meta = R.parse_paux(
            _t("small16.aux"), _b("small16.raw"))
        assert arr.shape == (35, 31, 2) and arr.dtype == np.uint16
        # autotest pins band 2; Swapped = little-endian (the
        # convention is relative to big-endian)
        assert gdal_checksum(arr[:, :, 1]) == 12816
        assert gdal_checksum(arr[:, :, 0]) == 12481
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert meta.startswith("LCC")

    @pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16,
                                    np.float32])
    def test_roundtrip(self, dt):
        rng = np.random.default_rng(7)
        arr = (rng.normal(0, 40, (5, 7, 2)).astype(dt)
               if dt == np.float32
               else rng.integers(0, 120, (5, 7, 2)).astype(dt))
        gt = (-100.0, 0.25, 0.0, 50.0, 0.0, -0.25)
        aux, data = R.format_paux(arr, gt)
        a2, g2, *_ = R.parse_paux(aux, data)
        assert np.array_equal(a2, arr)
        assert g2 == gt


class TestDoq2:
    def test_norfolk(self):
        arr, gt, nd, meta = R.parse_doq2(_b("C3607614_truncated.NWS"))
        assert arr.shape[1:] == (500, 3)
        assert gt == (377054.0, 1.0, 0.0, 4082205.0, 0.0, -1.0)
        # the reference keeps the collapsed remainder incl. comment
        assert meta["QUADRANGLE_NAME"] == \
            "NORFOLK SOUTH 3.45 or 7.5-min. name*"
        # test_doq2_1 checksums the first 500x1 row of each band
        cs = [gdal_checksum(arr[0:1, :500, b]) for b in range(3)]
        assert cs == [4201, 4010, 5820]

    def test_not_doq(self):
        with pytest.raises(ValueError, match="not a new-style"):
            R.parse_doq2(b"garbage" * 100)


class TestCtg:
    def test_fake_grid_cell(self):
        arr, gt, nd, meta = R.parse_ctg(_b("fake_grid_cell"))
        assert arr.shape == (558, 789, 6) and arr.dtype == np.int32
        assert gdal_checksum(arr[:, :, 0]) == 21
        assert gt == (421100.0, 200.0, 0.0, 5094300.0, 0.0, -200.0)
        assert meta == "FAKE CITY|14"

    def test_roundtrip(self):
        rng = np.random.default_rng(8)
        arr = rng.integers(0, 2_000_000, (4, 5, 6)).astype(np.int32)
        gt = (400000.0, 200.0, 0.0, 5000000.0, 0.0, -200.0)
        a2, g2, *_ = R.parse_ctg(R.format_ctg(arr, gt).encode())
        assert np.array_equal(a2, arr)
        assert g2 == gt

    def test_large_values_read_zero(self):
        arr = np.full((1, 1, 6), 5, np.int32)
        txt = R.format_ctg(arr, (0.0, 200.0, 0.0, 200.0, 0.0, -200.0))
        txt = txt.replace("%10d" % 5, "%10d" % 2000000001, 1)
        a2, *_ = R.parse_ctg(txt.encode())
        assert a2[0, 0, 0] == 0 and a2[0, 0, 1] == 5


class TestEir:
    def test_fakeeir(self):
        arr, *_ = R.parse_eir(_t("fakeeir.hdr"), _b("fakeeir.img"))
        assert arr.shape == (1, 1)
        assert gdal_checksum(arr) == 1

    @pytest.mark.parametrize("fmt", ["BIL", "BIP", "BSQ"])
    def test_interleaves(self, fmt):
        rng = np.random.default_rng(9)
        arr = rng.integers(0, 255, (4, 6, 3)).astype(np.uint8)
        if fmt == "BIL":
            raw = np.ascontiguousarray(arr.transpose(0, 2, 1)).tobytes()
        elif fmt == "BIP":
            raw = np.ascontiguousarray(arr).tobytes()
        else:
            raw = np.ascontiguousarray(arr.transpose(2, 0, 1)).tobytes()
        hdr = ("IMAGINE_RAW_FILE\nWIDTH 6\nHEIGHT 4\nNUM_LAYERS 3\n"
               f"PIXEL_FILES x.img\nFORMAT {fmt}\nDATATYPE U8\n"
               "DATA_OFFSET 0\nEND_RAW_FILE\n")
        a2, *_ = R.parse_eir(hdr, raw)
        assert np.array_equal(a2, arr)

    def test_roundtrip(self):
        rng = np.random.default_rng(10)
        arr = rng.normal(0, 10, (4, 6, 2)).astype(np.float32)
        hdr, data = R.format_eir(arr, "x.img")
        a2, *_ = R.parse_eir(hdr, data)
        assert np.array_equal(a2, arr)


class TestScans:
    def test_mff_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(11)
        from gdal_spark import codecs
        arrs = {f"m{i}": rng.integers(0, 255, (5, 6, 2))
                .astype(np.uint8) for i in range(3)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 6, 5, "raw",
                 0.0, 1.0, 0.0, 5.0, 0.0, -1.0, 0, None)
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        R.write_mff(src, str(tmp_path))
        df = R.scan_mff(spark, str(tmp_path / "*.hdr"))
        got = {r.image_id: r for r in df.collect()}
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)

    def test_paux_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(12)
        from gdal_spark import codecs
        arrs = {f"p{i}": rng.integers(0, 60000, (4, 5, 2))
                .astype(np.uint16) for i in range(3)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 5, 4, "raw",
                 10.0, 2.0, 0.0, 90.0, 0.0, -2.0, 0, None)
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        R.write_paux(src, str(tmp_path))
        df = R.scan_paux(spark, str(tmp_path / "*.aux"))
        got = {r.image_id: r for r in df.collect()}
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)
            assert got[k].gt0 == 10.0
