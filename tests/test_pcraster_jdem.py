"""PCRaster CSF + JDEM driver tests.

Conformance fixtures are byte-identical GDAL autotest DATA files;
expected values are the reference's own autotest expectations:

- pcraster/ldd.map: VS_LDD/UINT1, checksum 4528, geotransform
  (182140, 10, 0, 327880, 0, -10), nodata 255 (test_pcraster_1/2);
  the createcopy parity rewrite must keep checksum 4528
  (test_pcraster_createcopy).
- jdem/fakejdem.mem: checksum 15 over the 0.1-m-scaled Float32 grid
  (test_jdem_1).
"""

import hashlib
import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.jdem import format_jdem, parse_jdem
from gdal_spark.formats.pcraster import (
    VS_LDD, VS_SCALAR, format_pcraster, parse_pcraster,
)

DATA = os.path.join(os.path.dirname(__file__), "data")

MD5 = {
    "ldd.map": "2cb51636b6849729742aa38e900ae12e",
    "fakejdem.mem": "c5c05d7b4d374a65d2d26121f11e7fe6",
}


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def test_fixture_provenance():
    for name, md5 in MD5.items():
        assert hashlib.md5(_read(name)).hexdigest() == md5, name


class TestPCRaster:
    def test_conformance(self):
        arr, gt, nd, vs, cr = parse_pcraster(_read("ldd.map"))
        assert (vs, cr) == (VS_LDD, 0x00)
        assert gt == (182140.0, 10.0, 0.0, 327880.0, 0.0, -10.0)
        assert nd == 255.0
        raw = np.where(np.isnan(arr), nd, arr)
        assert gdal_checksum(raw.astype(np.uint8)) == 4528

    def test_createcopy_parity(self):
        """test_pcraster_createcopy: rewrite keeps checksum 4528."""
        arr, gt, nd, vs, cr = parse_pcraster(_read("ldd.map"))
        again = format_pcraster(arr, gt, value_scale=vs, cell_repr=cr)
        arr2, gt2, nd2, vs2, cr2 = parse_pcraster(again)
        assert (gt2, nd2, vs2, cr2) == (gt, nd, vs, cr)
        raw = np.where(np.isnan(arr2), nd2, arr2)
        assert gdal_checksum(raw.astype(np.uint8)) == 4528

    def test_scalar_real4(self):
        arr = np.array([[1.5, np.nan], [3.25, -2.0]])
        gt = (0.0, 5.0, 0.0, 100.0, 0.0, -5.0)
        enc = format_pcraster(arr, gt, value_scale=VS_SCALAR)
        arr2, gt2, nd, vs, cr = parse_pcraster(enc)
        assert cr == 0x5A and nd is None
        assert np.isnan(arr2[0, 1])
        np.testing.assert_array_equal(
            np.nan_to_num(arr2), np.nan_to_num(arr)
        )

    def test_int4_nominal(self):
        from gdal_spark.formats.pcraster import VS_NOMINAL

        arr = np.array([[1.0, np.nan], [-7.0, 12.0]])
        enc = format_pcraster(arr, (0, 1, 0, 2, 0, -1),
                              value_scale=VS_NOMINAL)
        arr2, gt2, nd, vs, cr = parse_pcraster(enc)
        assert cr == 0x26 and nd == -2147483648.0
        assert np.isnan(arr2[0, 1]) and arr2[1, 0] == -7.0

    def test_rejections(self):
        with pytest.raises(ValueError, match="CSF"):
            parse_pcraster(b"NOT A CSF FILE" + b"\x00" * 300)


class TestJDEM:
    def test_conformance(self):
        arr, gt, mesh = parse_jdem(_read("fakejdem.mem"))
        assert arr.shape == (2, 2)
        assert gdal_checksum(arr.astype(np.float32)) == 15

    def test_roundtrip(self):
        arr = np.array([[0.5, 120.3], [9999.9, 0.0]])
        gt = (135.0, 1.0 / 240, 0.0, 36.0, 0.0, -1.0 / 240)
        enc = format_jdem(arr, gt, mesh="503355")
        arr2, gt2, mesh = parse_jdem(enc)
        np.testing.assert_allclose(arr2, arr)
        np.testing.assert_allclose(gt2, gt)
        assert mesh == "503355"

    def test_corrupt_mesh_code(self):
        enc = bytearray(format_jdem(
            np.zeros((2, 2)), (135, 1 / 240, 0, 36, 0, -1 / 240)
        ))
        enc[1011] = ord("X")  # first record's mesh code
        with pytest.raises(ValueError, match="binary mode"):
            parse_jdem(bytes(enc))

    def test_out_of_order_row(self):
        enc = bytearray(format_jdem(
            np.zeros((2, 2)), (135, 1 / 240, 0, 36, 0, -1 / 240)
        ))
        rec = 2 * 5 + 9 + 2
        enc[1011 + 6:1011 + 9] = b"  2"  # first record claims row 2
        with pytest.raises(ValueError, match="out of order"):
            parse_jdem(bytes(enc))
        del rec

    def test_non_arcsecond_extent_rejected(self):
        with pytest.raises(ValueError, match="arc second"):
            format_jdem(np.zeros((2, 2)), (135.00001, 0.1, 0, 36, 0,
                                           -0.1))


class TestSpark:
    def test_scan_both(self, spark):
        from gdal_spark.formats import scan_jdem, scan_pcraster

        r = scan_pcraster(
            spark, os.path.join(DATA, "ldd.map")
        ).collect()[0]
        assert (r["w"], r["h"]) == (80, 100)
        assert r["nodata"] == 255.0 and r["gt0"] == 182140.0
        r = scan_jdem(
            spark, os.path.join(DATA, "fakejdem.mem")
        ).collect()[0]
        assert (r["w"], r["h"]) == (2, 2) and r["srid"] == 4301

    def test_roundtrip(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import (
            scan_jdem, scan_pcraster, write_jdem, write_pcraster,
        )

        arrs = [
            (0.5 * np.arange(12, dtype=np.float64).reshape(3, 4)
             + 10 * k)
            for k in range(3)
        ]
        rows = [
            (f"m{k}", bytearray(codecs.encode_raw(a)), 4, 3, "raw",
             135.0 + k, 0.25, 0.0, 40.0, 0.0, -0.25, 0, None)
            for k, a in enumerate(arrs)
        ]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(2)
        d1 = str(tmp_path / "pcr")
        write_pcraster(src, d1)
        back = {r["image_id"]: r for r in
                scan_pcraster(spark, d1 + "/*.map").collect()}
        a0 = codecs.decode_image(bytes(back["m0"]["bytes"]), "raw")
        np.testing.assert_array_equal(np.squeeze(a0), arrs[0])
        assert back["m1"]["gt0"] == 136.0

        d2 = str(tmp_path / "jdem")
        write_jdem(src, d2)
        back = {r["image_id"]: r for r in
                scan_jdem(spark, d2 + "/*.mem").collect()}
        a2 = codecs.decode_image(bytes(back["m2"]["bytes"]), "raw")
        np.testing.assert_allclose(np.squeeze(a2), arrs[2])
        assert back["m2"]["srid"] == 4301
