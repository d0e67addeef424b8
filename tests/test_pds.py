"""NASA PDS3 driver conformance + roundtrip tests.

Conformance fixtures are byte-identical GDAL autotest DATA files (md5
provenance below); every expected value is the reference's own test
expectation in autotest/gdrivers/pds.py. The autotest's geotransform
tolerance is pixel/100 (gdaltest.testOpen default) — asserted tighter
here where our double-precision ladder lands on the golden exactly.

- mc02_truncated.img: cs 47151, equirectangular Mars, the -0.5/-0.5
  shift golden AND the MAGELLAN 1.5/1.0/-1.0 variant (tests 1 and 8).
- fl73n003_truncated.img: cs 34962, sinusoidal Venus gt, nodata 7
  (MISSING), scale 0.2, offset -20.2; the _alt twin carries
  MISSING_CONSTANT (#3939) (test 2).
- EN0001426030M_truncated.IMG: 16-bit MSB, cs 1367, nodata 0, default
  (0,1,0,0,0,1) gt (test 3).
- pds_3177.lbl: detached ("small.raw", 3 <BYTES>) pointer, cs 3418,
  the exact gt golden (test 4, #3177).
- LDEM_4.LBL: detached IMAGE under OBJECT = UNCOMPRESSED_FILE with the
  map projection at the TOP level, cs 50938 over the (0,0,1440,2)
  window, gt golden (test 7).
- map_000_038_truncated.lbl: line offset not a multiple of
  RECORD_BYTES, cs 14019.
- hsp00017ba0_..._truncated.lbl: OBJECT = FILE indirection (CRISM) +
  BAND_STORAGE_TYPE = LINE_INTERLEAVED over 107 bands, cs 64740.

Truncated products zero-fill past EOF (RawRasterBand semantics) —
every *_truncated checksum depends on it.
"""

import hashlib
import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.pds import format_pds, parse_label, parse_pds

DATA = os.path.join(os.path.dirname(__file__), "data", "pds")

MD5 = {
    "mc02_truncated.img": "b0393a8be47420b1ead7e9e6aa93aa99",
    "fl73n003_truncated.img": "dcebcead1474b09a258c9a15dfed5a11",
    "fl73n003_alt_truncated.img": "f703c92c64edee085ad46461e5602f84",
    "EN0001426030M_truncated.IMG":
        "81a6c7a6c6733b1ca91b05b7276407a8",
    "LDEM_4.LBL": "7925b941ba3188247836fba75bf42c2b",
    "LDEM_4.IMG": "82bcd5816d264000e41d344e57f80c39",
    "pds_3177.lbl": "b881511e94acd42b139a00c4331a01f0",
    "small.raw": "a3c8c98ae8a3a7202eaaca8b2ee2c37e",
    "map_000_038_truncated.lbl":
        "ce252c905e7dbae4763cc3f3a20fb2dd",
    "map_000_038_truncated.fit":
        "23ee9738d167201451bedeeb6d092da9",
    "hsp00017ba0_01_ra218s_trr3_truncated.lbl":
        "79fc2ab259401a74d061c1288ec36bbc",
    "hsp00017ba0_01_ra218s_trr3_truncated.img":
        "2ab5d512ed2fccc0f0a8c4c83466e8b4",
}


def _parse(name, **kw):
    path = os.path.join(DATA, name)
    with open(path, "rb") as f:
        return parse_pds(f.read(), label_path=path, **kw)


def _cs(arr):
    return gdal_checksum(arr if arr.ndim == 2 else arr[:, :, 0])


def test_fixture_provenance():
    for name, md5 in MD5.items():
        with open(os.path.join(DATA, name), "rb") as f:
            assert hashlib.md5(f.read()).hexdigest() == md5, name


class TestConformance:
    def test_mc02_equirectangular(self):
        arr, gt, nd, sc, off, proj = _parse(
            "mc02_truncated.img",
            sample_offset_shift=-0.5, line_offset_shift=-0.5,
        )
        assert _cs(arr) == 47151
        golden = (-10668384.903788566589355, 926.115274429321289, 0,
                  3852176.483988761901855, 0, -926.115274429321289)
        np.testing.assert_allclose(gt, golden, atol=926.115 / 100)
        assert proj["projection"] == "SIMPLE_CYLINDRICAL"
        assert proj["target"] == "MARS"
        assert proj["a_radius_m"] == pytest.approx(3396000.0)

    def test_mc02_magellan_offsets(self):
        """test_pds_8: shift 1.5/1.5 with mult 1.0/-1.0."""
        arr, gt, nd, sc, off, proj = _parse(
            "mc02_truncated.img",
            sample_offset_shift=1.5, line_offset_shift=1.5,
            sample_offset_mult=1.0, line_offset_mult=-1.0,
        )
        golden = (10670237.134337425, 926.11527442932129, 0.0,
                  -3854028.7145376205, 0.0, -926.11527442932129)
        np.testing.assert_allclose(gt, golden, atol=926.115 / 100)

    def test_fl73n003_sinusoidal(self):
        arr, gt, nd, sc, off, proj = _parse(
            "fl73n003_truncated.img",
            sample_offset_shift=-0.5, line_offset_shift=-0.5,
        )
        assert _cs(arr) == 34962
        golden = (587861.55900404998, 75.000002980232239, 0.0,
                  -7815243.4746123618, 0.0, -75.000002980232239)
        np.testing.assert_allclose(gt, golden, atol=0.75)
        assert nd == 7.0
        assert sc == 0.2 and off == -20.2
        assert proj["projection"] == "SINUSOIDAL"
        assert proj["center_lon"] == 18.0

    def test_missing_constant(self):
        arr, gt, nd, *_ = _parse("fl73n003_alt_truncated.img")
        assert nd == 7.0

    def test_en_16bit(self):
        arr, gt, nd, *_ = _parse("EN0001426030M_truncated.IMG")
        assert _cs(arr) == 1367
        assert gt == (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
        assert nd == 0.0

    def test_detached_byte_offset(self):
        """#3177: ^IMAGE = ("small.raw", 3 <BYTES>)."""
        arr, gt, nd, *_ = _parse(
            "pds_3177.lbl",
            sample_offset_shift=-0.5, line_offset_shift=-0.5,
        )
        assert _cs(arr) == 3418
        golden = (6119184.3590369327, 1.0113804322107001, 0.0,
                  -549696.39009125973, 0.0, -1.0113804322107001)
        np.testing.assert_allclose(gt, golden, rtol=1e-12)

    def test_ldem_uncompressed_file_object(self):
        arr, gt, nd, *_ = _parse(
            "LDEM_4.LBL",
            sample_offset_shift=-0.5, line_offset_shift=-0.5,
        )
        assert arr.shape == (720, 1440)
        assert gdal_checksum(arr[:2, :1440]) == 50938
        golden = (-5450622.3254203796, 7580.8377265930176, 0.0,
                  2721520.7438468933, 0.0, -7580.8377265930176)
        np.testing.assert_allclose(gt, golden, atol=75.8)

    def test_line_offset_not_multiple_of_record(self):
        arr, *_ = _parse("map_000_038_truncated.lbl")
        assert _cs(arr) == 14019

    def test_crism_file_object_line_interleaved(self):
        arr, *_ = _parse("hsp00017ba0_01_ra218s_trr3_truncated.lbl")
        assert arr.ndim == 3 and arr.shape[2] == 107
        assert _cs(arr) == 64740

    def test_compressed_rejected(self):
        label = (b"PDS_VERSION_ID = PDS3\r\n"
                 b"RECORD_BYTES = 4\r\n^IMAGE = 2\r\n"
                 b"OBJECT = IMAGE\r\nENCODING_TYPE = HUFFMAN_FIRST"
                 b"_DIFFERENCE\r\nLINES = 1\r\nLINE_SAMPLES = 4\r\n"
                 b"SAMPLE_BITS = 8\r\nEND_OBJECT = IMAGE\r\nEND\r\n")
        with pytest.raises(ValueError, match="ENCODING_TYPE"):
            parse_pds(label)


class TestLabelParser:
    def test_nested_objects_and_lists(self):
        kv = parse_label(
            'A = 1\nOBJECT = B\n C = "two words"\n'
            " D = (1, 2,\n      3)\nEND_OBJECT = B\nEND\n"
        )
        assert kv["A"] == "1"
        assert kv["B.C"] == '"two words"'
        assert kv["B.D"].replace(" ", "") == "(1,2,3)"

    def test_units_and_comments(self):
        kv = parse_label(
            "/* hi */\nSCALE = 0.075 <KM/PIXEL>\nEND\n"
        )
        assert kv["SCALE"] == "0.075 <KM/PIXEL>"


class TestSpark:
    def test_scan(self, spark):
        from gdal_spark.formats import scan_pds

        df = scan_pds(
            spark,
            os.path.join(DATA, "fl73n003_truncated.img"),
            sample_offset_shift=-0.5, line_offset_shift=-0.5,
        )
        r = df.collect()[0]
        assert (r["w"], r["h"]) == (3184, 1)
        assert r["nodata"] == 7.0 and r["scale"] == 0.2
        assert r["proj"] == "SINUSOIDAL|VENUS"

    def test_roundtrip(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_pds, write_pds

        arrs = [
            (0.25 * np.arange(12, dtype=np.float64).reshape(3, 4)
             - 3 * k)
            for k in range(3)
        ]
        rows = [
            (f"p{k}", bytearray(codecs.encode_raw(a)), 4, 3, "raw",
             -100.0 * k, 50.0, 0.0, 200.0 + k, 0.0, -50.0, 0, -999.0)
            for k, a in enumerate(arrs)
        ]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(2)
        d = str(tmp_path / "pds")
        write_pds(src, d)
        back = {r["image_id"]: r for r in
                scan_pds(spark, d + "/*.img").collect()}
        assert len(back) == 3
        a1 = codecs.decode_image(bytes(back["p1"]["bytes"]), "raw")
        np.testing.assert_array_equal(np.squeeze(a1), arrs[1])
        assert back["p2"]["gt0"] == -200.0
        assert back["p2"]["nodata"] == -999.0
        assert back["p0"]["proj"] == "SIMPLE_CYLINDRICAL|MARS"
