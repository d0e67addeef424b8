"""NOAA .gtx vertical shift grid driver tests.

Conformance quoted from autotest/gdrivers/gtx.py test_gtx_1:
hydroc1.gtx opens as a 21x11 float32 band with checksum 64183 and
geotransform (276.725, 0.05, 0, 42.775, 0, -0.05) on WGS84.
Semantics: frmts/raw/gtxdataset.cpp. Fixture provenance in
tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import gtx as G

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestConformance:
    def test_hydroc1(self):
        with open(os.path.join(DATA, "hydroc1.gtx"), "rb") as f:
            arr, gt = G.parse_gtx(f.read())
        assert arr.shape == (11, 21)
        assert arr.dtype == np.float32
        assert gt == (276.725, 0.05, 0.0, 42.775, 0.0, -0.05)
        assert gdal_checksum(arr) == 64183

    def test_hydroc1_rewrite_identical(self):
        # writer must reproduce the fixture byte-for-byte (same
        # dtype, bottom-up order, center-anchored header)
        with open(os.path.join(DATA, "hydroc1.gtx"), "rb") as f:
            buf = f.read()
        arr, gt = G.parse_gtx(buf)
        assert G.format_gtx(arr, gt) == buf


class TestRoundTrip:
    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_write_parse(self, dtype):
        rng = np.random.default_rng(3)
        arr = rng.normal(0, 10, (5, 7)).astype(dtype)
        gt = (-120.0, 0.25, 0.0, 45.0, 0.0, -0.25)
        a2, gt2 = G.parse_gtx(G.format_gtx(arr, gt))
        assert a2.dtype == dtype
        assert np.array_equal(a2, arr)
        assert gt2 == pytest.approx(gt, abs=1e-12)

    def test_rejects_rotation(self):
        with pytest.raises(ValueError, match="north-up"):
            G.format_gtx(np.zeros((2, 2), np.float32),
                         (0, 1, 0.1, 0, 0, -1))


class TestVerticalShift:
    GT = (-10.0, 1.0, 0.0, 55.0, 0.0, -1.0)

    def _shift(self, fill=1.5):
        arr = np.full((4, 6), fill, np.float64)
        return G.VerticalShift(arr, self.GT)

    def test_constant_offset(self):
        s = self._shift()
        h = s.forward(np.array([100.0]), np.array([-7.0]),
                      np.array([53.0]))
        assert h[0] == 101.5
        back = s.inverse(h, np.array([-7.0]), np.array([53.0]))
        assert back[0] == 100.0

    def test_bilinear_linear_field(self):
        yy, xx = np.mgrid[0:4, 0:6].astype(np.float64)
        arr = 2.0 + 0.5 * xx - 0.25 * yy
        s = G.VerticalShift(arr, self.GT)
        lon, lat = np.array([-7.3]), np.array([52.6])
        fx = (lon - self.GT[0]) / self.GT[1] - 0.5
        fy = (lat - self.GT[3]) / self.GT[5] - 0.5
        want = 2.0 + 0.5 * fx - 0.25 * fy
        assert s.offsets(lon, lat)[0] == pytest.approx(want[0],
                                                       abs=1e-12)

    def test_nodata_poisons(self):
        arr = np.full((4, 6), 1.0, np.float64)
        arr[1, 2] = G.NODATA
        s = G.VerticalShift(arr, self.GT)
        # interp square touching the nodata cell -> unshifted
        assert s.offsets(np.array([-7.6]), np.array([53.6]))[0] == 0.0
        # far corner unaffected
        assert s.offsets(np.array([-5.0]), np.array([52.0]))[0] == 1.0

    def test_outside_unshifted(self):
        s = self._shift()
        assert s.offsets(np.array([100.0]), np.array([0.0]))[0] == 0.0

    def test_0_360_fold(self):
        # hydroc1-style grid starting at 276.725 must accept -83 deg
        with open(os.path.join(DATA, "hydroc1.gtx"), "rb") as f:
            arr, gt = G.parse_gtx(f.read())
        s = G.VerticalShift(arr, gt)
        # probe a 2x2 square of valid cells (most of hydroc1 is the
        # -88.8888 nodata collar)
        west = s.offsets(np.array([277.175 - 360.0]), np.array([42.675]))
        east = s.offsets(np.array([277.175]), np.array([42.675]))
        assert west[0] == east[0] == pytest.approx(0.00253, abs=1e-9)


class TestSpark:
    def test_scan_write_round_trip(self, spark, tmp_path):
        rows = []
        for i in range(3):
            arr = (np.arange(12, dtype=np.float32).reshape(3, 4)
                   + 10 * i)
            rows.append((
                f"v{i}", bytearray(codecs.encode_raw(arr)), 4, 3,
                "raw", float(i), 0.5, 0.0, 40.0, 0.0, -0.5, 4326,
                G.NODATA,
            ))
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(3)
        out = str(tmp_path / "gtx")
        assert len(G.write_gtx(src, out)) == 3
        got = {r.image_id: r for r in G.scan_gtx(
            spark, os.path.join(out, "*.gtx")).collect()}
        assert set(got) == {"v0", "v1", "v2"}
        for i in range(3):
            r = got[f"v{i}"]
            a = codecs.decode_image(bytes(r.bytes), "raw")
            assert np.array_equal(
                a, np.arange(12, dtype=np.float32).reshape(3, 4)
                + 10 * i)
            assert (r.gt0, r.gt3, r.gt5) == (float(i), 40.0, -0.5)
            assert r.nodata == pytest.approx(G.NODATA)

    def test_scan_fixture(self, spark):
        r = G.scan_gtx(
            spark, os.path.join(DATA, "hydroc1.gtx")).collect()[0]
        arr = codecs.decode_image(bytes(r.bytes), "raw")
        assert gdal_checksum(arr) == 64183
        assert r.gt0 == pytest.approx(276.725)
