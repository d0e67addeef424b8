"""USGS ASCII DEM driver tests.

Conformance quoted from autotest/gdrivers/usgsdem.py — seven real
autotest fixtures spanning every header variant the reference
probes: geographic NAD27 1-degree quads (old 864- and new
1024-offset), WGS72/NAD27 UTM quads, the undocumented 893-byte
header (39109h1), extra-values-after-profile junk (#1316 analog),
spaces after byte 864 (#4901), and 1025-byte records ending with a
linefeed (#5007). Semantics: frmts/usgsdem/usgsdemdataset.cpp.
Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import usgsdem as U

DATA = os.path.join(os.path.dirname(__file__), "data", "usgsdem")


def _load(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return U.parse_usgsdem(f.read())


class TestConformance:
    @pytest.mark.parametrize("name,cs,gt,srid,dtype", [
        # test_usgsdem_1: geographic NAD27 1-degree (new format)
        ("022gdeme_truncated", 1583,
         (-67.00041667, 0.00083333, 0.0, 50.000416667, 0.0,
          -0.00083333), 4267, np.int16),
        # test_usgsdem_2: geographic NAD27 (CDED 1:100k)
        ("114p01_0100_deme_truncated.dem", 53864,
         (-136.25010416667, 0.000208333, 0.0, 59.25010416667, 0.0,
          -0.000208333), 4267, np.int16),
        # test_usgsdem_3: WGS72 UTM 17
        ("39079G6_truncated.dem", 61424,
         (606855.0, 30.0, 0.0, 4414605.0, 0.0, -30.0), 32217,
         np.int16),
        # test_usgsdem_8: undocumented 893-byte header, NAD27 UTM 12,
        # fractional vres -> float32
        ("39109h1_truncated.dem", 39443,
         (660055.0, 10.0, 0.0, 4429465.0, 0.0, -10.0), 26712,
         np.float32),
        # test_usgsdem_9: OLD format (data at 864), NAD27 geographic
        ("4619old_truncated.dem", 10659,
         (18.99958333, 0.0008333, 0.0, 47.000416667, 0.0,
          -0.0008333), 4267, np.int16),
        # junk values after declared profile points (#1316 analog)
        ("usgsdem_with_extra_values_at_end_of_profile.dem", 56679,
         None, 26710, np.int16),
        # Novato.dem-style spaces after byte 864 (#4901)
        ("usgsdem_with_spaces_after_byte_864.dem", 61078, None,
         26710, np.int16),
        # 1025-byte records ending with linefeed (#5007)
        ("record_1025_ending_with_linefeed.dem", 14172, None, 26711,
         np.int16),
    ])
    def test_autotest_fixture(self, name, cs, gt, srid, dtype):
        arr, g, s, nodata = _load(name)
        assert arr.dtype == dtype
        assert gdal_checksum(arr) == cs
        assert s == srid
        assert nodata == -32767.0
        if gt is not None:
            eps = (abs(gt[1]) + abs(gt[2])) / 100.0  # gdaltest rule
            assert g == pytest.approx(gt, abs=eps)

    def test_full_profile_coverage(self):
        # 022gdeme's single profile covers the declared full height
        arr, *_ = _load("022gdeme_truncated")
        assert arr.shape == (1201, 1)
        assert not (arr == -32767).any()
        assert arr.max() == 127


class TestRoundTrip:
    def test_write_parse(self):
        rng = np.random.default_rng(11)
        arr = rng.integers(-200, 4000, (6, 5)).astype(np.int16)
        gt = (-120.0, 0.25, 0.0, 45.0, 0.0, -0.25)
        buf = U.format_usgsdem(arr, gt, datum=3)
        a2, gt2, srid2, _ = U.parse_usgsdem(buf)
        assert srid2 == 4326
        assert np.array_equal(a2, arr)
        assert gt2 == pytest.approx(gt, abs=1e-12)

    def test_write_nodata_holes(self):
        arr = np.full((4, 3), -32767, np.int16)
        arr[1:3, 1] = 7
        buf = U.format_usgsdem(arr, (0, 0.5, 0, 2, 0, -0.5))
        a2, *_ = U.parse_usgsdem(buf)
        assert np.array_equal(a2, arr)

    def test_records_are_1024_aligned(self):
        arr = np.ones((3, 4), np.int16)
        buf = U.format_usgsdem(arr, (0, 0.5, 0, 1.5, 0, -0.5))
        assert len(buf) % 1024 == 0
        assert len(buf) == 1024 * (1 + 4)

    def test_state_plane_rejected(self):
        arr = np.ones((3, 3), np.int16)
        buf = bytearray(U.format_usgsdem(arr, (0, 0.5, 0, 1.5, 0, -0.5)))
        buf[156:162] = b"     2"  # state plane
        with pytest.raises(ValueError, match="state-plane"):
            U.parse_usgsdem(bytes(buf))


class TestSpark:
    def test_scan_write_round_trip(self, spark, tmp_path):
        rows = []
        for i in range(3):
            arr = (np.arange(12, dtype=np.int16).reshape(3, 4)
                   + 100 * i)
            rows.append((
                f"d{i}", bytearray(codecs.encode_raw(arr)), 4, 3,
                "raw", float(i), 0.25, 0.0, 50.0, 0.0, -0.25,
                4326, -32767.0,
            ))
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(3)
        out = str(tmp_path / "dem")
        assert len(U.write_usgsdem(src, out)) == 3
        got = {r.image_id: r for r in U.scan_usgsdem(
            spark, os.path.join(out, "*.dem")).collect()}
        assert set(got) == {"d0", "d1", "d2"}
        for i in range(3):
            r = got[f"d{i}"]
            a = codecs.decode_image(bytes(r.bytes), "raw")
            assert np.array_equal(
                a, np.arange(12, dtype=np.int16).reshape(3, 4)
                + 100 * i)
            assert (r.gt0, r.gt1) == pytest.approx((float(i), 0.25),
                                                   abs=1e-12)
            assert r.srid == 4326

    def test_scan_fixture(self, spark):
        r = U.scan_usgsdem(
            spark,
            os.path.join(DATA, "39079G6_truncated.dem")).collect()[0]
        arr = codecs.decode_image(bytes(r.bytes), "raw")
        assert gdal_checksum(arr) == 61424
        assert r.srid == 32217
