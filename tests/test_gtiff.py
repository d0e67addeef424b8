"""GeoTIFF driver conformance + roundtrip tests.

Conformance fixtures are byte-identical GDAL autotest DATA files (no
code) with md5 provenance in tests/data/README.md; the expected values
(band checksums, geotransforms, EPSG codes, pixel probes) come from the
reference's own test expectations:

- byte.tif: checksum 4672 (quoted throughout autotest), EPSG 26711.
- bug4468.tif: Deflate + predictor 2, band-1 checksum 2923
  (autotest/gcore/tiff_write.py test_tiff_write_105).
- tiff_with_subifds.tif: LZW tiled, band-1 checksum 35731, pixel (0,0)
  = 220, SubIFDs ignored (autotest/gcore/tiff_read_subifds.py).
- small_world.tif: planar RGB strips, EPSG 4326.
- classictiff_four_strip_be_short.tif: big-endian with SHORT-typed
  strip offsets at 178..181 (autotest/gcore/tiff_read.py
  test_tiff_read_stripoffset_types).
- bigtiff_*.tif: BigTIFF (magic 43) variants with SHORT/LONG/LONG8
  offset arrays, both endiannesses, expected strip offsets from the
  same autotest parametrization.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.gtiff import (
    format_gtiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
    parse_gtiff,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


class TestConformance:
    def test_byte_tif(self):
        arr, gt, srid, nodata = parse_gtiff(_read("byte.tif"))
        assert arr.shape == (20, 20) and arr.dtype == np.uint8
        assert gdal_checksum(arr) == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert srid == 26711 and nodata is None

    def test_small_world_planar_rgb(self):
        arr, gt, srid, _ = parse_gtiff(_read("small_world.tif"))
        assert arr.shape == (200, 400, 3) and arr.dtype == np.uint8
        assert gt == (-180.0, 0.9, 0.0, 90.0, 0.0, -0.9)
        assert srid == 4326
        assert gdal_checksum(arr[:, :, 0]) == 30111

    def test_deflate_predictor2(self):
        arr, _, _, _ = parse_gtiff(_read("bug4468.tif"))
        assert arr.ndim == 3
        assert gdal_checksum(arr[:, :, 0]) == 2923

    def test_lzw_tiled_first_ifd_only(self):
        arr, gt, srid, _ = parse_gtiff(_read("tiff_with_subifds.tif"))
        # the main IFD (1024x512), not the 3 SubIFD overviews
        assert arr.shape == (512, 1024)
        assert gdal_checksum(arr) == 35731
        assert arr[0, 0] == 220

    def test_big_endian_short_offsets(self):
        buf = _read("classictiff_four_strip_be_short.tif")
        arr, _, _, _ = parse_gtiff(buf)
        assert arr.shape == (4, 1)
        # strips live at offsets 178..181 (one byte per row), so each
        # pixel must equal the file byte at its strip offset
        expect = np.array([[buf[178 + r]] for r in range(4)], np.uint8)
        np.testing.assert_array_equal(arr, expect)


class TestCodecs:
    def test_packbits_hand_example(self):
        # TIFF 6.0 §9 worked example (the spec's own bytes)
        enc = bytes(
            [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80,
             0x00, 0x2A, 0x22, 0xF7, 0xAA]
        )
        dec = (b"\xaa" * 3 + b"\x80\x00\x2a" + b"\xaa" * 4
               + b"\x80\x00\x2a\x22" + b"\xaa" * 10)
        assert packbits_decode(enc) == dec
        assert packbits_decode(packbits_encode(dec)) == dec

    def test_lzw_roundtrip_with_table_clears(self):
        rng = np.random.default_rng(3)
        data = bytes(rng.integers(0, 256, 120000, dtype=np.uint8))
        assert lzw_decode(lzw_encode(data)) == data
        runs = b"".join(bytes([i % 7]) * 50 for i in range(999))
        assert lzw_decode(lzw_encode(runs)) == runs


class TestWriteRead:
    @pytest.mark.parametrize("comp", ["none", "deflate", "lzw", "packbits"])
    @pytest.mark.parametrize("tiled", [False, True])
    def test_byte_reencode_all_paths(self, comp, tiled):
        arr, gt, srid, _ = parse_gtiff(_read("byte.tif"))
        b = format_gtiff(arr, gt, srid=srid, nodata=-42.5, compression=comp,
                         predictor=(comp != "none"),
                         tile_size=16 if tiled else None)
        a2, g2, s2, n2 = parse_gtiff(b)
        assert np.array_equal(a2, arr)
        assert g2 == gt and s2 == srid and n2 == -42.5
        assert gdal_checksum(a2) == 4672

    def test_uint16_and_rgb_and_float(self):
        rng = np.random.default_rng(11)
        cases = [
            rng.integers(0, 60000, (37, 23), dtype=np.uint16),
            rng.integers(0, 255, (19, 31, 3), dtype=np.uint8),
            rng.normal(size=(11, 13)).astype(np.float32),
        ]
        for a in cases:
            preds = [False] if a.dtype.kind == "f" else [False, True]
            for pred in preds:
                b = format_gtiff(a, (10.0, 0.5, 0.0, 20.0, 0.0, -0.5),
                                 srid=4326, compression="lzw",
                                 predictor=pred, tile_size=16)
                a2, _, s2, _ = parse_gtiff(b)
                assert np.array_equal(a2, a) and s2 == 4326

    def test_rotated_gt_uses_model_transformation(self):
        a = np.arange(12, dtype=np.uint8).reshape(3, 4)
        gt = (100.0, 2.0, 0.5, 200.0, -0.25, -2.0)
        a2, g2, _, _ = parse_gtiff(format_gtiff(a, gt))
        assert np.array_equal(a2, a) and g2 == gt

    def test_rejects_bad_bigtiff_and_non_tiff(self):
        # BigTIFF is supported, but only the spec's 8-byte-offset form
        with pytest.raises(ValueError, match="offset size"):
            parse_gtiff(b"II+\x00" + b"\x00" * 32)
        with pytest.raises(ValueError, match="byte-order"):
            parse_gtiff(b"PK\x03\x04junk")


class TestBigTIFF:
    """BigTIFF (magic 43) conformance + write path. Fixture strip
    offsets come from the reference's own expectations
    (autotest/gcore/tiff_read.py test_tiff_read_stripoffset_types);
    each fixture is a 1-byte-per-strip image, so every pixel must equal
    the file byte at its expected strip offset."""

    @pytest.mark.parametrize(
        "name,offsets",
        [
            ("bigtiff_four_strip_short.tif", [316, 317, 318, 319]),
            ("bigtiff_one_block_long8.tif", [272]),
            ("bigtiff_one_block_be_long8.tif", [272]),
            ("bigtiff_two_strip_be_long.tif", [284, 285]),
        ],
    )
    def test_conformance_strip_offsets(self, name, offsets):
        buf = _read(name)
        arr, _, _, _ = parse_gtiff(buf)
        assert arr.shape == (len(offsets), 1) and arr.dtype == np.uint8
        expect = np.array([[buf[o]] for o in offsets], np.uint8)
        np.testing.assert_array_equal(arr, expect)

    @pytest.mark.parametrize("comp", ["none", "deflate", "lzw", "packbits"])
    def test_write_roundtrip(self, comp):
        arr, gt, srid, _ = parse_gtiff(_read("byte.tif"))
        b = format_gtiff(arr, gt, srid=srid, nodata=-1.0, compression=comp,
                         predictor=(comp != "none"), bigtiff=True)
        assert b[:4] == b"II+\x00"
        a2, g2, s2, n2 = parse_gtiff(b)
        assert np.array_equal(a2, arr)
        assert g2 == gt and s2 == srid and n2 == -1.0
        assert gdal_checksum(a2) == 4672

    def test_overviews_and_windowed_read(self):
        import io

        from gdal_spark.formats.gtiff import gtiff_levels, read_gtiff_window

        rng = np.random.default_rng(5)
        a = rng.integers(0, 255, (64, 48), dtype=np.uint8)
        b = format_gtiff(a, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                         overviews=[2, 4], tile_size=16, bigtiff=True)
        f = io.BytesIO(b)
        levels, _, _, _ = gtiff_levels(f)
        assert [(lv["w"], lv["h"]) for lv in levels] == [
            (48, 64), (24, 32), (12, 16)
        ]
        np.testing.assert_array_equal(
            read_gtiff_window(f, levels[0], 16, 32, 16, 16),
            a[32:48, 16:32],
        )

    def test_auto_stays_classic_for_small(self):
        a = np.zeros((8, 8), np.uint8)
        assert format_gtiff(a, (0, 1, 0, 0, 0, -1))[:4] == b"II*\x00"

    def test_spark_windowed_scan_bigtiff(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_gtiff_windowed

        rng = np.random.default_rng(9)
        a = rng.integers(0, 255, (96, 40), dtype=np.uint8)
        p = tmp_path / "big.tif"
        p.write_bytes(format_gtiff(a, (5.0, 2.0, 0.0, 9.0, 0.0, -2.0),
                                   srid=3857, compression="none",
                                   tile_size=16, bigtiff=True))
        rows = (scan_gtiff_windowed(spark, str(p), target_bytes=1024)
                .collect())
        assert len(rows) > 1  # the file actually split into windows
        got = np.zeros_like(a)
        for r in sorted(rows, key=lambda r: r.gt3, reverse=True):
            w = codecs.decode_image(bytes(r.bytes), r.fmt)
            y0 = int(round((r.gt3 - 9.0) / -2.0))
            got[y0:y0 + r.h, :] = w.reshape(r.h, r.w)
            assert r.srid == 3857
        np.testing.assert_array_equal(got, a)


class TestSpark:
    def test_distributed_scan_and_sink(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_gtiff, write_gtiff

        rng = np.random.default_rng(5)
        arrs = {f"img{i}": rng.integers(0, 255, (8 + i, 9, 1), np.uint8)
                for i in range(6)}
        rows = [
            (k, codecs.encode_raw(v), 9, v.shape[0], "raw",
             float(i * 10), 1.0, 0.0, 50.0, 0.0, -1.0, 32632, None)
            for i, (k, v) in enumerate(sorted(arrs.items()))
        ]
        df = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
            "gt5 double, srid int, nodata double",
        ).repartition(3)
        out = str(tmp_path / "tifs")
        paths = write_gtiff(df, out, compression="deflate", predictor=True)
        assert len(paths) == 6
        back = scan_gtiff(spark, os.path.join(out, "*.tif"))
        assert back.rdd.getNumPartitions() >= 1
        got = {r.image_id: r for r in back.collect()}
        assert set(got) == set(arrs)
        for i, (k, v) in enumerate(sorted(arrs.items())):
            r = got[k]
            a = codecs.decode_image(bytes(r.bytes), r.fmt)
            np.testing.assert_array_equal(
                a.reshape(v.shape[0], 9), v[:, :, 0]
            )
            assert (r.gt0, r.gt1, r.gt5) == (float(i * 10), 1.0, -1.0)
            assert r.srid == 32632

    def test_scan_conformance_files(self, spark):
        from gdal_spark.formats import scan_gtiff

        r = {x.image_id: x for x in scan_gtiff(
            spark, os.path.join(DATA, "byte.tif")).collect()}["byte"]
        assert (r.w, r.h, r.srid) == (20, 20, 26711)
        from gdal_spark import codecs

        assert gdal_checksum(
            codecs.decode_image(bytes(r.bytes), r.fmt)
        ) == 4672


class TestWindowedScan:
    """COG-posture reads: header-only planning, per-window tasks,
    overview levels (formats.gtiff.scan_gtiff_windowed)."""

    def _write(self, tmp_path, name, arr, **kw):
        from gdal_spark.formats import format_gtiff

        p = tmp_path / name
        p.write_bytes(format_gtiff(
            arr, (100.0, 2.0, 0.0, 900.0, 0.0, -2.0), srid=32601,
            nodata=-9.0, **kw,
        ))
        return str(p)

    def test_windowed_equals_whole(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_gtiff_windowed

        rng = np.random.default_rng(7)
        a = rng.integers(0, 60000, (90, 41), dtype=np.uint16)
        self._write(tmp_path, "big.tif", a, compression="lzw",
                    predictor=True, tile_size=16)
        df = scan_gtiff_windowed(
            spark, str(tmp_path / "big.tif"), target_bytes=1)
        rows = sorted(df.collect(), key=lambda r: r.image_id)
        assert len(rows) == 6  # 90 rows / 16-high tile rows
        assert df.rdd.getNumPartitions() == 6
        got = np.vstack([
            codecs.decode_image(bytes(r.bytes), r.fmt).reshape(r.h, r.w)
            for r in rows
        ])
        np.testing.assert_array_equal(got, a)
        # window geotransforms tile the source vertically
        for k, r in enumerate(rows):
            assert r.gt3 == 900.0 - 2.0 * (16 * k)
            assert (r.gt0, r.gt1, r.gt5, r.srid, r.nodata) == (
                100.0, 2.0, -2.0, 32601, -9.0)

    def test_windowed_striped_and_planar(self, spark, tmp_path):
        """Short final strip + a real planar conformance file."""
        from gdal_spark import codecs
        from gdal_spark.formats import parse_gtiff, scan_gtiff_windowed

        rng = np.random.default_rng(8)
        a = rng.integers(0, 255, (37, 2000, 3), dtype=np.uint8)
        self._write(tmp_path, "strips.tif", a, compression="deflate")
        df = scan_gtiff_windowed(
            spark, str(tmp_path / "strips.tif"), target_bytes=1)
        rows = sorted(df.collect(), key=lambda r: r.image_id)
        assert len(rows) > 1
        got = np.vstack([
            codecs.decode_image(bytes(r.bytes), r.fmt) for r in rows
        ])
        np.testing.assert_array_equal(got, a)

        src = os.path.join(DATA, "small_world.tif")
        whole, _, _, _ = parse_gtiff(open(src, "rb").read())
        rows = sorted(
            scan_gtiff_windowed(spark, src, target_bytes=1).collect(),
            key=lambda r: r.image_id,
        )
        got = np.vstack([
            codecs.decode_image(bytes(r.bytes), r.fmt) for r in rows
        ])
        np.testing.assert_array_equal(got, whole)

    def test_overview_level_scan(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_gtiff_windowed
        from gdal_spark.resample import resize_average

        rng = np.random.default_rng(9)
        a = rng.integers(0, 255, (64, 48), dtype=np.uint8)
        self._write(tmp_path, "cog.tif", a, compression="deflate",
                    tile_size=16, overviews=[2, 4])
        r = scan_gtiff_windowed(
            spark, str(tmp_path / "cog.tif"), level=2).collect()[0]
        assert (r.w, r.h) == (12, 16)
        assert (r.gt1, r.gt5) == (8.0, -8.0)  # 4x coarser
        exp = np.rint(resize_average(a, 16, 12)).astype(np.uint8)
        np.testing.assert_array_equal(
            codecs.decode_image(bytes(r.bytes), r.fmt).reshape(16, 12), exp)
        with pytest.raises(ValueError, match="level 3"):
            scan_gtiff_windowed(
                spark, str(tmp_path / "cog.tif"), level=3).collect()

    def test_single_window_keeps_stem(self, spark, tmp_path):
        from gdal_spark.formats import scan_gtiff_windowed

        a = np.arange(20 * 9, dtype=np.uint8).reshape(20, 9)
        self._write(tmp_path, "one.tif", a)
        ids = [r.image_id for r in scan_gtiff_windowed(
            spark, str(tmp_path / "one.tif")).collect()]
        assert ids == ["one"]

    def test_byte_tif_conformance_windowed(self, spark):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_gtiff_windowed

        rows = sorted(
            scan_gtiff_windowed(
                spark, os.path.join(DATA, "byte.tif"), target_bytes=1
            ).collect(),
            key=lambda r: r.image_id,
        )
        got = np.vstack([
            codecs.decode_image(bytes(r.bytes), r.fmt).reshape(r.h, r.w)
            for r in rows
        ])
        assert gdal_checksum(got) == 4672
        assert rows[0].srid == 26711


class TestWindowedByteAccounting:
    """Pin the COG access pattern: planning touches only header/IFD
    bytes; a window read touches only its own compressed blocks."""

    def test_bytes_touched(self):
        import io

        from gdal_spark.formats import (format_gtiff, gtiff_levels,
                                        plan_gtiff_windows,
                                        read_gtiff_window)

        class Counting(io.BytesIO):
            def __init__(self, b):
                super().__init__(b)
                self.nread = 0

            def read(self, n=-1):
                r = super().read(n)
                self.nread += len(r)
                return r

        rng = np.random.default_rng(11)
        a = rng.integers(0, 255, (512, 256), dtype=np.uint8)
        buf = format_gtiff(a, (0.0, 1.0, 0.0, 512.0, 0.0, -1.0),
                           compression="deflate", tile_size=32)
        f = Counting(buf)
        levels, _, _, _ = gtiff_levels(f)
        header_bytes = f.nread
        assert header_bytes < len(buf) * 0.05

        lvl = levels[0]
        wins = plan_gtiff_windows(lvl, target_bytes=1)
        assert len(wins) == 16
        by0, by1, nbytes = wins[3]
        f2 = Counting(buf)
        out = read_gtiff_window(f2, lvl, 0, by0 * 32, 256,
                                (by1 - by0) * 32)
        np.testing.assert_array_equal(out, a[by0 * 32:by1 * 32])
        assert f2.nread == nbytes
        assert f2.nread < len(buf) / 8


class TestJpegInTiff:
    """Compression 7 (new-style JPEG, TIFF TechNote 2) through the
    engine's own from-scratch baseline codec (gdal_spark/jpeg.py).

    Conformance inputs are real libjpeg-written autotest bytes (see
    tests/data/README.md). Checksum parity with the reference is
    IDCT-rounding-dependent (the reference's own expected values vary
    by libjpeg version: 4771/4743 in tiff_write.py test_tiff_write_130),
    so the pins here are (a) our own deterministic checksums as
    regression goldens, one count off libjpeg's, and (b) pixel
    closeness to the lossless byte.tif source bounded by the JPEG
    quantization loss itself."""

    def test_shared_jpegtables_fixture(self):
        arr, gt, srid, _ = parse_gtiff(_read("byte_jpg_unusual_jpegtable.tif"))
        assert arr.shape == (20, 20) and arr.dtype == np.uint8
        assert srid == 26711
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        # libjpeg decodes this to checksum 4771; sub-LSB IDCT rounding
        # differences put ours one count away — pinned as OUR golden
        assert gdal_checksum(arr) == 4770
        ref = parse_gtiff(_read("byte.tif"))[0]
        assert np.abs(arr.astype(int) - ref.astype(int)).mean() < 10.0
        assert np.abs(arr.astype(float).mean() - ref.astype(float).mean()) < 1.0

    def test_standalone_stream_fixture(self):
        # JPEGTABLESMODE=0: no JPEGTables tag, each strip self-contained
        arr, _, srid, _ = parse_gtiff(_read("byte_jpg_tablesmodezero.tif"))
        assert arr.shape == (20, 20) and srid == 26711
        assert gdal_checksum(arr) == 4748  # libjpeg: 4743
        ref = parse_gtiff(_read("byte.tif"))[0]
        assert np.abs(arr.astype(int) - ref.astype(int)).mean() < 10.0

    def test_irregular_tile_size_must_error(self):
        # the reference's own test expects Checksum() to raise on this
        # corrupt file (tiff_read.py test_tiff_read_irregular_tile_size)
        with pytest.raises(ValueError):
            parse_gtiff(_read("irregular_tile_size_jpeg_in_tiff.tif"))

    def test_old_style_jpeg_rejected(self):
        arr = np.zeros((8, 8), np.uint8)
        b = bytearray(format_gtiff(arr, (0, 1, 0, 0, 0, -1),
                                   compression="none"))
        i = b.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
        b[i + 8] = 6  # patch Compression SHORT value to old-style JPEG
        with pytest.raises(ValueError, match="old-style"):
            parse_gtiff(bytes(b))

    @pytest.mark.parametrize("tiled", [False, True])
    def test_rgb_write_read_psnr(self, tiled):
        from gdal_spark.codecs import psnr

        x = np.linspace(0, 1, 97)
        y = np.linspace(0, 1, 61)
        g = np.outer(y, x) * 255
        rgb = np.stack([g, g[::-1], np.fliplr(g)], axis=-1).astype(np.uint8)
        gt = (100.0, 0.5, 0.0, 200.0, 0.0, -0.5)
        b = format_gtiff(rgb, gt, srid=3857, compression="jpeg",
                         jpeg_quality=90,
                         tile_size=32 if tiled else None)
        a2, g2, s2, _ = parse_gtiff(b)
        assert a2.shape == rgb.shape and g2 == gt and s2 == 3857
        assert psnr(rgb, a2) >= 40.0  # the north-rule lossy bar

    def test_gray_write_read_and_overviews(self):
        import io

        from gdal_spark.codecs import psnr
        from gdal_spark.formats.gtiff import gtiff_levels

        g = (np.outer(np.linspace(0, 1, 50), np.linspace(0, 1, 70))
             * 255).astype(np.uint8)
        b = format_gtiff(g, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                         compression="jpeg", jpeg_quality=95,
                         overviews=[2])
        levels, *_ = gtiff_levels(io.BytesIO(b))
        assert [(lv["w"], lv["h"]) for lv in levels] == [(70, 50), (35, 25)]
        assert all(lv["comp"] == 7 for lv in levels)
        a2 = parse_gtiff(b)[0]
        assert psnr(g, a2) >= 40.0

    def test_jpeg_write_validation(self):
        with pytest.raises(ValueError, match="uint8"):
            format_gtiff(np.zeros((8, 8), np.uint16), (0, 1, 0, 0, 0, -1),
                         compression="jpeg")
        with pytest.raises(ValueError, match="bands"):
            format_gtiff(np.zeros((8, 8, 4), np.uint8), (0, 1, 0, 0, 0, -1),
                         compression="jpeg")
        with pytest.raises(ValueError, match="predictor"):
            format_gtiff(np.zeros((8, 8), np.uint8), (0, 1, 0, 0, 0, -1),
                         compression="jpeg", predictor=True)

    def test_windowed_scan_jpeg(self, spark, tmp_path):
        # a JPEG-compressed file through the COG windowed path: the
        # JPEGTables-free per-strip streams decode per window
        from gdal_spark import codecs
        from gdal_spark.formats import scan_gtiff_windowed
        from gdal_spark.codecs import psnr

        g = (np.outer(np.linspace(0, 1, 128), np.linspace(0, 1, 2048))
             * 255).astype(np.uint8)
        p = tmp_path / "j.tif"
        p.write_bytes(format_gtiff(g, (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                                   compression="jpeg", jpeg_quality=95))
        rows = (scan_gtiff_windowed(spark, str(p), target_bytes=512)
                .orderBy("image_id").collect())
        assert len(rows) > 1  # actually split into windows
        parts = [codecs.decode_image(bytes(r.bytes), r.fmt) for r in rows]
        whole = np.vstack(parts)
        assert whole.shape == g.shape
        assert psnr(g, whole) >= 40.0
