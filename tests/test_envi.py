"""ENVI driver conformance + roundtrip tests.

Conformance fixtures are byte-identical GDAL autotest DATA files (md5
provenance in tests/data/README.md); expected values come from the
reference's own test expectations in autotest/gdrivers/envi.py:

- aea.dat: big-endian bsq, band checksum 14823 (test_envi_1).
- aea_compressed.dat: ``file compression = 1`` gzip stream, same
  checksum (test_envi_10).
- envi_rgbsmall_{bsq,bil,bip}.img: the three interleaves must decode
  to identical pixels with band checksums 20718/20669/20895
  (test_envi_interleaving).
- uint16_envi_bigendian.dat: u16 big-endian, checksum 4672, UTM 11N
  on NAD27 (EPSG:26711) (test_envi_bigendian).
- rotation.img: ``rotation=-66`` map info -> the quoted rotated
  geotransform to 1e-5 relative (test_envi_15).
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.envi import (
    decode_envi,
    format_envi,
    parse_envi,
    parse_envi_header,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "envi")

ROTATION_GT = [736600.089, 1.0981889363046606, -2.4665727356350224,
               4078126.75, -2.4665727356350224, -1.0981889363046606]


class TestConformance:
    def test_aea_bigendian_bsq(self):
        arr, _, srid, _ = parse_envi(os.path.join(DATA, "aea.dat"))
        assert arr.shape == (3, 434) and arr.dtype == np.uint8
        assert gdal_checksum(arr) == 14823
        assert srid == 0  # Albers via projection info -> unregistered

    def test_gzip_compressed(self):
        a = parse_envi(os.path.join(DATA, "aea.dat"))[0]
        b = parse_envi(os.path.join(DATA, "aea_compressed.dat"))[0]
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("il", ["bsq", "bil", "bip"])
    def test_rgbsmall_interleaves(self, il):
        arr, _, srid, _ = parse_envi(
            os.path.join(DATA, f"envi_rgbsmall_{il}.img")
        )
        assert arr.shape == (49, 50, 3)
        assert [gdal_checksum(arr[:, :, b]) for b in range(3)] == [
            20718, 20669, 20895
        ]
        assert srid == 4326
        base = parse_envi(os.path.join(DATA, "envi_rgbsmall_bsq.img"))[0]
        np.testing.assert_array_equal(arr, base)

    def test_uint16_bigendian_utm_nad27(self):
        arr, gt, srid, _ = parse_envi(
            os.path.join(DATA, "uint16_envi_bigendian.dat")
        )
        assert arr.dtype == np.uint16
        assert gdal_checksum(arr) == 4672
        assert srid == 26711
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)

    def test_rotation_map_info(self):
        _, gt, _, _ = parse_envi(os.path.join(DATA, "rotation.img"))
        assert max(
            abs((gt[i] - ROTATION_GT[i]) / ROTATION_GT[i]) for i in range(6)
        ) <= 1e-5

    def test_rejects_non_envi_and_complex(self):
        with pytest.raises(ValueError, match="ENVI"):
            parse_envi_header("not a header")
        hdr = parse_envi_header(
            "ENVI\nsamples = 2\nlines = 2\nbands = 1\ndata type = 6\n"
            "interleave = bsq\nbyte order = 0\n"
        )
        with pytest.raises(ValueError, match="data type"):
            decode_envi(b"\x00" * 64, hdr)


class TestWrite:
    @pytest.mark.parametrize("il", ["bsq", "bil", "bip"])
    def test_roundtrip_dtypes(self, il):
        rng = np.random.default_rng(2)
        for dt in [np.uint8, np.int16, np.uint16, np.int32, np.float32,
                   np.float64]:
            a = rng.normal(0, 100, (13, 17, 3)).astype(dt)
            cube, hdr = format_envi(
                a, (10.0, 0.5, 0.0, 20.0, 0.0, -0.25),
                srid=32611, nodata=-9.5, interleave=il,
            )
            b, gt, srid, nd = decode_envi(cube, parse_envi_header(hdr))
            np.testing.assert_array_equal(b, a)
            assert gt == (10.0, 0.5, 0.0, 20.0, 0.0, -0.25)
            assert srid == 32611 and nd == -9.5

    def test_rotated_gt_roundtrip(self):
        a = np.arange(12, dtype=np.uint8).reshape(3, 4)
        gt = tuple(ROTATION_GT)
        cube, hdr = format_envi(a, gt)
        _, g2, _, _ = decode_envi(cube, parse_envi_header(hdr))
        np.testing.assert_allclose(g2, gt, rtol=1e-9)

    def test_rejects_shear(self):
        a = np.zeros((2, 2), np.uint8)
        with pytest.raises(ValueError, match="rotation"):
            format_envi(a, (0.0, 1.0, 0.5, 0.0, 0.0, -1.0))


class TestSpark:
    def test_distributed_scan_and_sink(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_envi, write_envi

        rng = np.random.default_rng(7)
        rows = []
        for i in range(4):
            a = rng.integers(0, 60000, (9, 11, 2)).astype(np.uint16)
            rows.append((
                f"cube{i}", bytearray(codecs.encode_raw(a)), 11, 9, "raw",
                float(i * 100), 30.0, 0.0, 500.0, 0.0, -30.0, 32633, None,
            ))
        df = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
            "gt5 double, srid int, nodata double",
        )
        paths = write_envi(df, str(tmp_path / "cubes"), interleave="bil")
        assert len(paths) == 4
        back = scan_envi(spark, str(tmp_path / "cubes" / "*.img"))
        got = {r.image_id: r for r in back.collect()}
        src = {r.image_id: r for r in df.collect()}
        assert set(got) == set(src)
        for iid in got:
            a = codecs.decode_image(bytes(got[iid].bytes), got[iid].fmt)
            b = codecs.decode_image(bytes(src[iid].bytes), src[iid].fmt)
            np.testing.assert_array_equal(a, b)
            assert got[iid].srid == 32633
            assert got[iid].gt1 == 30.0 and got[iid].gt5 == -30.0

    def test_scan_autotest_files(self, spark):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_envi

        rows = scan_envi(spark, os.path.join(DATA, "*.img")).collect()
        by_id = {r.image_id: r for r in rows}
        assert set(by_id) == {
            "envi_rgbsmall_bsq", "envi_rgbsmall_bil", "envi_rgbsmall_bip",
            "rotation",
        }
        r = by_id["envi_rgbsmall_bsq"]
        arr = codecs.decode_image(bytes(r.bytes), r.fmt).reshape(49, 50, 3)
        assert gdal_checksum(arr[:, :, 2]) == 20895
