"""Geosoft GXF driver conformance + roundtrip tests.

Conformance fixtures are byte-identical GDAL autotest DATA files (md5
provenance below); expected values come from the reference's own
autotest expectations (autotest/gdrivers/gxf.py):

- small.gxf: GTYPE 0 uncompressed, no georef keys (unit geotransform
  through the center-anchor shift), band checksum 90 (test_gxf_1).
- small2.gxf: GTYPE 3 base-90 compressed with dummies and repeat
  groups, TRANSFORM 5.0E-03/-118.835, 12.5 ftUS cells at
  (1750000, 4250) lower-left origin, band checksum 65042; carries the
  NAD27 / Ohio North LCC-2SP projection record (test_gxf_2).
"""

import hashlib
import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.gxf import format_gxf, parse_gxf

DATA = os.path.join(os.path.dirname(__file__), "data", "gxf")

MD5 = {
    "small.gxf": "abe1a2a5bb0fbb3d0d14249cedf02b86",
    "small2.gxf": "459d7dd7b07dab10498836bbc7e16b43",
}


def _read(name):
    with open(os.path.join(DATA, name)) as f:
        return f.read()


def test_fixture_provenance():
    for name, md5 in MD5.items():
        with open(os.path.join(DATA, name), "rb") as f:
            assert hashlib.md5(f.read()).hexdigest() == md5, name


class TestConformance:
    def test_small_uncompressed(self):
        arr, gt, nd, info = parse_gxf(_read("small.gxf"))
        assert arr.shape == (3, 4)
        raw = np.where(np.isnan(arr), nd, arr).astype(np.float32)
        assert gdal_checksum(raw) == 90
        # default sense 1 flips: the file's first row is the SOUTH row
        assert arr[2, 1] == 10.0  # '-9999999.000 10' is the bottom row
        # no #DUMMY record: -9999999.000 is a VALUE, nodata stays the
        # reference's -1e12 default
        assert nd == -1e12
        assert arr[2, 0] == -9999999.0
        np.testing.assert_allclose(gt, (-0.5, 1, 0, 2.5, 0, -1))

    def test_small2_compressed(self):
        arr, gt, nd, info = parse_gxf(_read("small2.gxf"))
        assert arr.shape == (8, 10)
        raw = np.where(np.isnan(arr), nd, arr).astype(np.float32)
        assert gdal_checksum(raw) == 65042
        # 12.5 cells anchored at the CENTER of the lower-left cell
        np.testing.assert_allclose(
            gt, (1749993.75, 12.5, 0.0, 4343.75, 0.0, -12.5)
        )
        assert info.unit_name == "ftUS"
        assert info.unit_to_meter == 0.3048006096012
        assert info.projection[0] == '"NAD27 / Ohio North"'
        assert "Lambert Conic Conformal (2SP)" in info.projection[2]
        assert info.scale == 5.0e-03 and info.offset == -118.835

    def test_vertical_sense_rejected(self):
        text = ("#POINTS\n2\n#ROWS\n2\n#SENSE\n-1\n#GRID\n1 2\n3 4\n")
        with pytest.raises(ValueError, match="vertically"):
            parse_gxf(text)

    def test_dummy_prefix_match(self):
        """GTYPE-0 dummies match by PREFIX of the #DUMMY text, the
        reference's strncmp(tok, dummy, len(tok))."""
        text = ("#POINTS\n2\n#ROWS\n1\n#DUMMY\n-9999.000\n"
                "#GRID\n-9999 7\n")
        arr, gt, nd, info = parse_gxf(text)
        assert np.isnan(arr[0, 0]) and arr[0, 1] == 7

    def test_ur_left_mirror(self):
        text = ("#POINTS\n2\n#ROWS\n2\n#SENSE\n3\n#GRID\n1 2\n3 4\n")
        arr, gt, nd, info = parse_gxf(text)
        # UR_LEFT: rows already top-down, columns mirrored
        np.testing.assert_array_equal(arr, [[2, 1], [4, 3]])

    def test_format_roundtrip(self):
        arr = np.array([[1.5, np.nan], [3.0, 4.25]])
        gt = (100.0, 2.0, 0.0, 50.0, 0.0, -2.5)
        arr2, gt2, nd2, info = parse_gxf(format_gxf(arr, gt, -9999.0))
        np.testing.assert_allclose(gt2, gt)
        assert np.isnan(arr2[0, 1]) and arr2[1, 1] == 4.25


class TestSpark:
    def test_scan(self, spark):
        from gdal_spark.formats import scan_gxf

        df = scan_gxf(spark, os.path.join(DATA, "*.gxf"))
        rows = {r["image_id"]: r for r in df.collect()}
        assert rows["small"]["w"] == 4
        assert rows["small2"]["gt1"] == 12.5

    def test_roundtrip(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_gxf, write_gxf

        arrs = [
            (2.0 * k + 0.5 * np.arange(12, dtype=np.float64))
            .reshape(3, 4)
            for k in range(3)
        ]
        rows = [
            (f"x{k}", bytearray(codecs.encode_raw(a)), 4, 3, "raw",
             100.0 * k, 2.0, 0.0, 60.0, 0.0, -1.5, 0, -9999.0)
            for k, a in enumerate(arrs)
        ]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(2)
        d = str(tmp_path / "gxf")
        write_gxf(src, d)
        back = {r["image_id"]: r for r in
                scan_gxf(spark, d + "/*.gxf").collect()}
        assert len(back) == 3
        a1 = codecs.decode_image(bytes(back["x1"]["bytes"]), "raw")
        np.testing.assert_allclose(np.squeeze(a1), arrs[1])
        assert back["x2"]["gt0"] == 200.0
        assert back["x2"]["gt5"] == -1.5
