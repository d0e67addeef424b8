"""SRTM HGT driver tests. The format has no header — conformance is
the reference's published rules (frmts/srtmhgt/srtmhgtdataset.cpp):
size-switch on the byte count, name-derived SW corner, and the
half-post geotransform ``(lon - 0.5/(n-1), 1/(n-1), 0,
lat + 1 + 0.5/(n-1), 0, -1/(n-1))`` — the same grid the reference's
own autotest builds when it synthesizes n43w080.hgt from n43.dt0
(autotest/gdrivers/srtmhgt.py fixture geotransform)."""

import os

import numpy as np
import pytest

from gdal_spark.formats.srtmhgt import (
    corner_from_name,
    format_srtmhgt,
    parse_srtmhgt,
)


class TestCore:
    def test_autotest_grid_rule(self):
        # the exact geotransform autotest quotes for n43w080.hgt @1201
        rng = np.random.default_rng(0)
        a = rng.integers(-100, 4000, (1201, 1201)).astype(np.int16)
        raw, name = format_srtmhgt(
            a, (-80.0 - 0.5 / 1200, 1 / 1200, 0.0,
                44.0 + 0.5 / 1200, 0.0, -1 / 1200),
        )
        assert name == "N43W080.hgt"
        b, gt, srid, nd = parse_srtmhgt(raw, name)
        np.testing.assert_array_equal(b, a)
        np.testing.assert_allclose(
            gt,
            (-80.0004166666666663, 0.0008333333333333, 0,
             44.0004166666666670, 0, -0.0008333333333333),
            atol=1e-12,
        )
        assert srid == 4326 and nd == -32768.0

    def test_name_parsing(self):
        assert corner_from_name("N43W080.hgt") == (43, -80)
        assert corner_from_name("s09e157.hgt") == (-9, 157)
        with pytest.raises(ValueError, match="tile name"):
            corner_from_name("random.bin")

    def test_big_endian_and_negative(self):
        a = np.array([[-500, 100], [32767, -32768]], np.int16)
        raw, name = format_srtmhgt(
            a, (10.0 - 0.5, 1.0, 0.0, -5.0 + 1 + 0.5, 0.0, -1.0)
        )
        assert name == "S05E010.hgt"
        assert raw[:2] == b"\xfe\x0c"  # -500 big-endian
        b, _, _, _ = parse_srtmhgt(raw, name, strict_size=False)
        np.testing.assert_array_equal(b, a)

    def test_strict_size(self):
        buf = b"\x00" * (7 * 7 * 2)
        with pytest.raises(ValueError, match="1201/3601"):
            parse_srtmhgt(buf, "N00E000.hgt")
        arr, _, _, _ = parse_srtmhgt(buf, "N00E000.hgt", strict_size=False)
        assert arr.shape == (7, 7)
        with pytest.raises(ValueError, match="square"):
            parse_srtmhgt(b"\x00" * 100, "N00E000.hgt", strict_size=False)

    def test_rejects_non_tile_grid(self):
        a = np.zeros((5, 5), np.int16)
        with pytest.raises(ValueError, match="1-degree"):
            format_srtmhgt(a, (0.0, 0.5, 0.0, 1.0, 0.0, -0.5))


class TestSpark:
    def test_scan_and_sink(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_srtmhgt, write_srtmhgt

        rng = np.random.default_rng(4)
        rows = []
        n = 9
        for i in range(5):
            a = rng.integers(-200, 5000, (n, n)).astype(np.int16)
            lat, lon = i - 2, 10 * i - 20
            rows.append((
                f"t{i}", bytearray(codecs.encode_raw(a)), n, n, "raw",
                lon - 0.5 / (n - 1), 1.0 / (n - 1), 0.0,
                lat + 1 + 0.5 / (n - 1), 0.0, -1.0 / (n - 1),
                4326, -32768.0,
            ))
        df = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
            "gt5 double, srid int, nodata double",
        )
        paths = write_srtmhgt(df, str(tmp_path / "hgt"))
        assert sorted(os.path.basename(p) for p in paths) == [
            "N00E000.hgt", "N01E010.hgt", "N02E020.hgt",
            "S01W010.hgt", "S02W020.hgt",
        ]
        back = scan_srtmhgt(spark, str(tmp_path / "hgt" / "*.hgt"),
                            strict_size=False)
        got = sorted(back.collect(), key=lambda r: r.gt0)
        assert len(got) == 5
        src = sorted(df.collect(), key=lambda r: r.gt0)
        for a, b in zip(got, src):
            np.testing.assert_array_equal(
                codecs.decode_image(bytes(a.bytes), a.fmt),
                codecs.decode_image(bytes(b.bytes), b.fmt),
            )
            assert abs(a.gt0 - b.gt0) < 1e-12 and a.srid == 4326
