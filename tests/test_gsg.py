"""Golden Software (Surfer) grid driver tests.

Conformance quoted from autotest/gdrivers/gsg.py: all three
containers of the same byte.tif-derived grid (gsg_ascii.grd /
gsg_binary.grd / gsg_7binary.grd) open with checksum 4672 and
geotransform (440720, 60, 0, 3751320, 0, -60) (test_gsg_1/2/3), and
dims < 2 or GSBG dims > int16 must be rejected
(test_gsg_create_wrong_dims). Semantics: frmts/gsg/*.cpp. Fixture
provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import gsg as G

DATA = os.path.join(os.path.dirname(__file__), "data")
EXPECT_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


class TestConformance:
    @pytest.mark.parametrize("fname,dtype", [
        ("gsg_ascii.grd", np.float64),
        ("gsg_binary.grd", np.float32),
        ("gsg_7binary.grd", np.float64),
    ])
    def test_autotest_fixtures(self, fname, dtype):
        with open(os.path.join(DATA, fname), "rb") as f:
            arr, gt = G.parse_gsg(f.read())
        assert arr.shape == (20, 20)
        assert arr.dtype == dtype
        assert gt == EXPECT_GT
        assert gdal_checksum(arr) == 4672

    def test_three_containers_identical_values(self):
        arrs = []
        for fname in ("gsg_ascii.grd", "gsg_binary.grd",
                      "gsg_7binary.grd"):
            with open(os.path.join(DATA, fname), "rb") as f:
                arrs.append(G.parse_gsg(f.read())[0].astype(np.float64))
        assert np.array_equal(arrs[0], arrs[1])
        assert np.array_equal(arrs[0], arrs[2])

    def test_orientation(self):
        # DSAA first value (181) is the SOUTH-WEST node -> must land
        # at the bottom-left of the north-up array
        with open(os.path.join(DATA, "gsg_ascii.grd"), "rb") as f:
            arr, _ = G.parse_gsg(f.read())
        assert arr[-1, 0] == 181.0


class TestRoundTrip:
    GT = (1000.0, 2.5, 0.0, 500.0, 0.0, -2.5)

    def _arr(self, dtype):
        return (np.arange(35, dtype=dtype).reshape(5, 7) * 3
                + 1).astype(dtype)

    def test_gsag(self):
        a = self._arr(np.float64)
        a2, gt2 = G.parse_gsg(G.format_gsag(a, self.GT).encode())
        assert np.array_equal(a2, a)
        assert gt2 == pytest.approx(self.GT, abs=1e-12)

    def test_gsbg(self):
        a = self._arr(np.float32)
        a2, gt2 = G.parse_gsg(G.format_gsbg(a, self.GT))
        assert a2.dtype == np.float32
        assert np.array_equal(a2, a)
        assert gt2 == pytest.approx(self.GT, abs=1e-12)

    def test_gs7bg(self):
        a = self._arr(np.float64)
        a2, gt2 = G.parse_gsg(G.format_gs7bg(a, self.GT))
        assert np.array_equal(a2, a)
        assert gt2 == pytest.approx(self.GT, abs=1e-12)

    def test_rewrite_gsbg_fixture_identical(self):
        # our DSBB writer reproduces the reference-shipped fixture
        # byte-for-byte (same header stats and bottom-up order)
        with open(os.path.join(DATA, "gsg_binary.grd"), "rb") as f:
            buf = f.read()
        arr, gt = G.parse_gsg(buf)
        assert G.format_gsbg(arr, gt) == buf

    def test_wrong_dims_rejected(self):
        # test_gsg_create_wrong_dims bounds
        gt = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
        with pytest.raises(ValueError, match=">= 2"):
            G.format_gsbg(np.zeros((1, 5), np.float32), gt)
        with pytest.raises(ValueError, match=">= 2"):
            G.format_gs7bg(np.zeros((5, 1), np.float64), gt)
        with pytest.raises(ValueError, match="int16"):
            G.format_gsbg(np.zeros((2, 32768), np.float32), gt)

    def test_nodata_kept_out_of_z_range(self):
        a = np.full((3, 4), G.NODATA, np.float64)
        a[0, 0], a[2, 3] = 5.0, 9.0
        txt = G.format_gsag(a, (0, 1, 0, 3, 0, -1))
        # z min/max line must reflect only valid nodes
        assert txt.splitlines()[4] == "5 9"
        a2, _ = G.parse_gsg(txt.encode())
        assert np.isclose(a2[0, 0], 5.0)
        assert np.isclose(a2[1, 1], G.NODATA, rtol=1e-6)


class TestSpark:
    @pytest.mark.parametrize("container,dtype", [
        ("gsag", np.float64), ("gsbg", np.float32),
        ("gs7bg", np.float64),
    ])
    def test_scan_write_round_trip(self, spark, tmp_path, container,
                                   dtype):
        rows = []
        for i in range(3):
            arr = (np.arange(12, dtype=dtype).reshape(3, 4)
                   + 10 * i)
            rows.append((
                f"s{i}", bytearray(codecs.encode_raw(arr)), 4, 3,
                "raw", float(i * 5), 0.5, 0.0, 40.0, 0.0, -0.5,
                0, None,
            ))
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(3)
        out = str(tmp_path / container)
        assert len(G.write_gsg(src, out, container=container)) == 3
        got = {r.image_id: r for r in G.scan_gsg(
            spark, os.path.join(out, "*.grd")).collect()}
        assert set(got) == {"s0", "s1", "s2"}
        for i in range(3):
            r = got[f"s{i}"]
            a = codecs.decode_image(bytes(r.bytes), "raw")
            assert np.array_equal(
                a, np.arange(12, dtype=a.dtype).reshape(3, 4) + 10 * i)
            assert (r.gt0, r.gt1, r.gt5) == (float(i * 5), 0.5, -0.5)

    def test_scan_mixed_containers(self, spark, tmp_path):
        # one glob over all three container spellings
        a = np.arange(8, dtype=np.float64).reshape(2, 4)
        gt = (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)
        (tmp_path / "a.grd").write_bytes(
            G.format_gsag(a, gt).encode())
        (tmp_path / "b.grd").write_bytes(G.format_gsbg(a, gt))
        (tmp_path / "c.grd").write_bytes(G.format_gs7bg(a, gt))
        rows = G.scan_gsg(spark, str(tmp_path / "*.grd")).collect()
        assert len(rows) == 3
        for r in rows:
            got = codecs.decode_image(bytes(r.bytes), "raw")
            assert np.array_equal(got.astype(np.float64), a)
