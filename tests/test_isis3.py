"""ISIS3 cube driver conformance + roundtrip tests.

Conformance fixtures are byte-identical GDAL autotest DATA files (md5
provenance below); expected values are the reference's own test
expectations in autotest/gdrivers/isis.py:

- isis3_detached.lbl/.cub: BandSequential UnsignedByte detached cube,
  checksum 9978, gt (-4766.96, 10.1025, ..., -10.1025) (pixel/100
  tolerance like gdaltest), and the quoted local-radius sphere
  3394813.857978216 m (test_isis_1's SPHEROID golden).
- isis3_unit_test.cub: TILE-format SignedWord cube (128x128 tiles,
  StartByte 65537), checksum 42403, the exact (653.132641...,
  0.38, -2298409.71...) gt, local radius 3388271.702979241 m
  (test_isis_2).
- isis3_geotiff.lbl/.tif: Format=GeoTIFF external cube decoded
  through the engine's own from-spec GeoTIFF codec — same checksum
  9978 (test_isis_3).
- FC21B..._3bands_truncated.cub: quoted-string and bare lists in
  BandBin parse intact (#1510 golden strings), Real NULL4 nodata.
"""

import hashlib
import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.isis3 import (
    format_isis3, local_radius, parse_isis3,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "isis3")

MD5 = {
    "isis3_detached.cub": "e0d61fd11798412827bcc5dd613858c5",
    "isis3_detached.lbl": "44f22f982822825e81b8499f94c9f5bb",
    "isis3_geotiff.lbl": "d9cdb42001bd7bc4b2b90c921e4c9ecf",
    "isis3_geotiff.tif": "39344d767a1f674f136d36f8b4ad1b8c",
    "isis3_unit_test.cub": "a8c026a8b4b71b6c0d40ecefeeec5056",
    "FC21B0037339_15142232818F1C_3bands_truncated.cub":
        "216596427e7a7b1219c48fec58cb4b2b",
}


def _parse(name):
    path = os.path.join(DATA, name)
    with open(path, "rb") as f:
        return parse_isis3(f.read(), label_path=path)


def test_fixture_provenance():
    for name, md5 in MD5.items():
        with open(os.path.join(DATA, name), "rb") as f:
            assert hashlib.md5(f.read()).hexdigest() == md5, name


class TestConformance:
    def test_detached(self):
        arr, gt, nd, sc, off, m, kv = _parse("isis3_detached.lbl")
        assert arr.shape == (30, 317)
        assert gdal_checksum(arr) == 9978
        golden = (-4766.96484375, 10.102499961853027, 0.0,
                  -872623.625, 0.0, -10.102499961853027)
        np.testing.assert_allclose(gt, golden, atol=10.1025 / 100)
        assert m["local_radius"] == pytest.approx(
            3394813.857978216, abs=1e-6
        )
        assert m["projection"] == "Equirectangular"
        assert nd == 0.0

    def test_unit_test_tiled(self):
        arr, gt, nd, sc, off, m, kv = _parse("isis3_unit_test.cub")
        assert arr.shape == (50, 150)
        assert gdal_checksum(arr) == 42403
        np.testing.assert_allclose(
            gt,
            (653.132641495800044, 0.38, 0, -2298409.710162799805403,
             0, -0.38),
            rtol=1e-10,
        )
        assert m["local_radius"] == pytest.approx(
            3388271.702979241, abs=1e-6
        )
        assert nd == -32768.0
        # Base/Multiplier become band offset/scale
        assert off == pytest.approx(8190.1245134999)
        assert sc == pytest.approx(0.25006486667989)

    def test_geotiff_backed(self):
        """Format=GeoTIFF pixels through the engine's own codec."""
        arr, gt, nd, sc, off, m, kv = _parse("isis3_geotiff.lbl")
        assert arr.shape == (30, 317)
        assert gdal_checksum(arr) == 9978

    def test_bandbin_lists(self):
        """#1510: bare and quoted-string lists parse intact."""
        arr, gt, nd, sc, off, m, kv = _parse(
            "FC21B0037339_15142232818F1C_3bands_truncated.cub"
        )
        assert arr.shape == (1, 1, 3)
        assert kv["IsisCube.BandBin.FilterNumber"] == "(1, 1, 1)"
        assert kv["IsisCube.BandBin.FilterName"] == (
            "(Clear_F1, Clear_F1, Clear_F1)"
        )
        assert kv["IsisCube.BandBin.Name"] == (
            '("band 1","band 2","band 3")'
        )
        assert nd == -3.4028226550889045e+38

    def test_local_radius_formula(self):
        # sphere degenerates to the radius itself
        assert local_radius(1000.0, 1000.0, 45.0) == pytest.approx(
            1000.0
        )

    def test_roundtrip_format(self):
        arr = (0.5 * np.arange(12, dtype=np.float64)).reshape(3, 4)
        gt = (100.0, 2.5, 0.0, 500.0, 0.0, -2.5)
        enc = format_isis3(arr, gt)
        arr2, gt2, nd, sc, off, m, kv = parse_isis3(enc)
        np.testing.assert_array_equal(arr2, arr)
        assert gt2 == gt
        assert m["target"] == "Mars"


class TestSpark:
    def test_scan(self, spark):
        from gdal_spark.formats import scan_isis3

        df = scan_isis3(
            spark, os.path.join(DATA, "isis3_unit_test.cub")
        )
        r = df.collect()[0]
        assert (r["w"], r["h"]) == (150, 50)
        assert r["gt1"] == 0.38
        assert r["proj"] == "Equirectangular|mars"

    def test_roundtrip(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_isis3, write_isis3

        arrs = [
            (0.25 * np.arange(12, dtype=np.float64).reshape(3, 4)
             + 7 * k)
            for k in range(3)
        ]
        rows = [
            (f"c{k}", bytearray(codecs.encode_raw(a)), 4, 3, "raw",
             10.0 * k, 2.5, 0.0, 500.0, 0.0, -2.5, 0, None)
            for k, a in enumerate(arrs)
        ]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(2)
        d = str(tmp_path / "isis3")
        write_isis3(src, d)
        back = {r["image_id"]: r for r in
                scan_isis3(spark, d + "/*.cub").collect()}
        assert len(back) == 3
        a1 = codecs.decode_image(bytes(back["c1"]["bytes"]), "raw")
        np.testing.assert_array_equal(np.squeeze(a1), arrs[1])
        assert back["c2"]["gt0"] == 20.0
