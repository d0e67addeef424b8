"""Sidecar georeferencing (world file + PAM .aux.xml) tests.

Conformance values quoted from the reference's own autotest suite:
- autotest/gdrivers/png.py:75 — test.wld (mixed comma/dot decimals)
  must parse to gt (700000.305, 0.38, 0.01, 4287500.695, -0.01,
  -0.38);
- autotest/gcore/tiff_read.py test_tiff_read_nogeoref —
  byte_nogeoref.tfw (trailing commas) is gt (99.5, 1, 0, 200.5, 0,
  -1) under WORLDFILE and the PAM <GeoTransform>1,2,3,4,5,6 wins
  under the default precedence.
Semantics: gcore/gdal_misc.cpp GDALLoadWorldFile /
GDALReadWorldFile2 (verified against the code this round).
"""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.formats import sidecar as S

# autotest/gdrivers/data/png/test.wld, verbatim (comma decimals on
# lines 2/4/6 exercise the CPLAtofM comma-as-decimal rule)
TEST_WLD = (
    "                   0.38\n"
    "                  -0,01\n"
    "                   0.01\n"
    "                  -0,38\n"
    "              700000.50\n"
    "             4287500,50\n"
)

# autotest/gcore/data/byte_nogeoref.tfw, verbatim (trailing commas,
# no final newline)
NOGEOREF_TFW = "1,\n0,\n0,\n-1,\n100,\n200"


class TestWorldFile:
    def test_candidate_order(self):
        # windows spelling, then unix, then .wld
        # (gdal_misc.cpp GDALReadWorldFile2)
        assert S.world_file_candidates("/a/b/map.png") == [
            "/a/b/map.pgw", "/a/b/map.pngw", "/a/b/map.wld"]
        assert S.world_file_candidates("/a/b/map.jpeg") == [
            "/a/b/map.jgw", "/a/b/map.jpegw", "/a/b/map.wld"]

    def test_png_autotest_wld(self):
        # autotest/gdrivers/png.py:75 quoted expectation
        gt = S.parse_world_file(TEST_WLD)
        assert gt == pytest.approx(
            (700000.305, 0.38, 0.01, 4287500.695, -0.01, -0.38))

    def test_nogeoref_tfw(self):
        # autotest/gcore/tiff_read.py WORLDFILE expectation
        gt = S.parse_world_file(NOGEOREF_TFW)
        assert gt == (99.5, 1.0, 0.0, 200.5, 0.0, -1.0)

    def test_corrupt_all_zero_scale(self):
        # (world[0]!=0 || world[2]!=0) && (world[3]!=0 || world[1]!=0)
        assert S.parse_world_file("0\n0\n0\n-1\n10\n20\n") is None
        assert S.parse_world_file("1\n0\n0\n0\n10\n20\n") is None
        # rotation terms alone make it valid, like the reference
        assert S.parse_world_file("0\n1\n1\n0\n10\n20\n") is not None
        assert S.parse_world_file("1\n2\n3\n") is None

    def test_round_trip(self):
        gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert S.parse_world_file(S.format_world_file(gt)) == gt

    def test_lookup_order_on_disk(self, tmp_path):
        img = tmp_path / "m.png"
        img.write_bytes(b"")
        (tmp_path / "m.wld").write_text("2\n0\n0\n-2\n1\n1\n")
        assert S.read_world_file(str(img))[1] == 2.0
        # windows spelling wins over .wld
        (tmp_path / "m.pgw").write_text("5\n0\n0\n-5\n1\n1\n")
        assert S.read_world_file(str(img))[1] == 5.0


class TestPam:
    def test_pam_overrides_world_file(self, tmp_path):
        img = tmp_path / "t.png"
        img.write_bytes(b"")
        (tmp_path / "t.pgw").write_text(NOGEOREF_TFW)
        (tmp_path / "t.png.aux.xml").write_text(
            "<PAMDataset>\n  <SRS>PROJCS[\"x\",GEOGCS[\"y\","
            "AUTHORITY[\"EPSG\",\"4326\"]],"
            "AUTHORITY[\"EPSG\",\"32611\"]]</SRS>\n"
            "  <GeoTransform>1,2,3,4,5,6</GeoTransform>\n"
            "  <PAMRasterBand band=\"1\">\n"
            "    <NoDataValue>-9999</NoDataValue>\n"
            "  </PAMRasterBand>\n</PAMDataset>\n")
        gt, srid, nodata = S.sidecar_georef(str(img))
        # PAM wins (autotest default-precedence expectation), trailing
        # AUTHORITY supplies the SRID, band-1 NoDataValue the nodata
        assert gt == (1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
        assert srid == 32611 and nodata == -9999.0

    def test_world_file_fallback_and_identity(self, tmp_path):
        img = tmp_path / "t.png"
        img.write_bytes(b"")
        assert S.sidecar_georef(str(img)) == (
            (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), 0, None)
        (tmp_path / "t.pgw").write_text(NOGEOREF_TFW)
        gt, srid, nodata = S.sidecar_georef(str(img))
        assert gt == (99.5, 1.0, 0.0, 200.5, 0.0, -1.0)
        assert srid == 0 and nodata is None


class TestSpark:
    def test_scan_write_round_trip(self, spark, tmp_path):
        rng = np.random.default_rng(7)
        arrs = {f"img{i}": rng.integers(0, 255, (8, 11), np.uint8)
                .astype(np.uint8) for i in range(3)}
        rows = [
            (k, codecs.encode_raw(a), 11, 8, "raw",
             100.0 + i, 2.0, 0.0, 50.0 - i, 0.0, -2.0, 32630 + i,
             float(i) if i else None)
            for i, (k, a) in enumerate(sorted(arrs.items()))
        ]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(3)
        out = str(tmp_path / "png_out")
        paths = S.write_plain_rasters(src, out, fmt="png")
        assert len(paths) == 3
        # world file + aux.xml written next to each image
        assert os.path.exists(os.path.join(out, "img0.pgw"))
        assert os.path.exists(os.path.join(out, "img0.png.aux.xml"))
        got = {r.image_id: r for r in S.scan_plain_rasters(
            spark, os.path.join(out, "*.png")).collect()}
        assert set(got) == set(arrs)
        for i, k in enumerate(sorted(arrs)):
            r = got[k]
            a = codecs.decode_image(bytes(r.bytes), "raw")
            assert np.array_equal(a, arrs[k])
            assert (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5) == (
                100.0 + i, 2.0, 0.0, 50.0 - i, 0.0, -2.0)
            assert r.srid == 32630 + i
            assert (r.nodata == float(i)) if i else (r.nodata is None)

    def test_scan_lossy_jpg(self, spark, tmp_path):
        a = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3)
        src = spark.createDataFrame(
            [("j0", codecs.encode_raw(a), 8, 8, "raw",
              0.0, 1.0, 0.0, 0.0, 0.0, -1.0, 4326, None)],
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        )
        out = str(tmp_path / "jpg_out")
        S.write_plain_rasters(src, out, fmt="jpg")
        r = S.scan_plain_rasters(
            spark, os.path.join(out, "*.jpg")).collect()[0]
        b = codecs.decode_image(bytes(r.bytes), "raw")
        assert b.shape == a.shape
        assert codecs.psnr(a, b) >= 40.0
        assert r.srid == 4326
