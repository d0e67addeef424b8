"""GIF + TGA codec/driver tests.

Conformance quoted from autotest/gdrivers/gif.py (test_gif_2:
bug407.gif index checksum 57921; byte_with_xmp.gif carries the
byte.tif ramp = checksum 4672 + an XMP packet) and
autotest/gdrivers/tga.py (the full Truevision reference suite at the
quoted per-band checksums, the extension-area AUTHOR_NAME/COMMENTS/
IMAGE_ID goldens, RLE runs crossing scanlines on test1g.tga).
Semantics: the published GIF89a + TGA 2.0 specifications
(frmts/gif/gifdataset.cpp, frmts/tga/tgadataset.cpp).
Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import gif as G
from gdal_spark.formats import tga as T

DATA = os.path.join(os.path.dirname(__file__), "data")


def _bytes(sub, name):
    with open(os.path.join(DATA, sub, name), "rb") as f:
        return f.read()


class TestGifConformance:
    def test_bug407(self):
        arr, pal, transp, _ = G.parse_gif(_bytes("gif", "bug407.gif"))
        assert arr.shape == (400, 400)
        assert gdal_checksum(arr) == 57921
        assert pal.shape[1] == 3

    def test_byte_with_xmp(self):
        arr, pal, transp, xmp = G.parse_gif(
            _bytes("gif", "byte_with_xmp.gif"))
        assert arr.shape == (20, 20)
        assert gdal_checksum(arr) == 4672  # the byte.tif ramp
        assert xmp is not None and "xpacket" in xmp


class TestGifRoundTrip:
    def test_gray_interlace_transparent(self):
        rng = np.random.default_rng(2)
        arr = rng.integers(0, 256, (37, 53)).astype(np.uint8)
        for interlace in (False, True):
            buf = G.format_gif(arr, interlace=interlace, transparent=0)
            a2, _, t2, _ = G.parse_gif(buf)
            assert np.array_equal(a2, arr)
            assert t2 == 0
            assert buf[:6] == b"GIF89a"

    def test_small_palette(self):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 5, (10, 11)).astype(np.uint8)
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                        [10, 20, 30], [1, 2, 3]], np.uint8)
        buf = G.format_gif(arr, pal)
        a2, p2, t2, _ = G.parse_gif(buf)
        assert np.array_equal(a2, arr)
        assert np.array_equal(p2[:5], pal)
        assert t2 is None
        assert buf[:6] == b"GIF87a"

    def test_lzw_table_reset(self):
        # random 300x300 forces 12-bit saturation + clear codes
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, (300, 300)).astype(np.uint8)
        a2, *_ = G.parse_gif(G.format_gif(arr))
        assert np.array_equal(a2, arr)

    def test_decode_expands_palette(self):
        arr = np.array([[0, 1], [2, 0]], np.uint8)
        pal = np.array([[9, 8, 7], [1, 2, 3], [4, 5, 6]], np.uint8)
        rgb = G.decode_gif(G.format_gif(arr, pal))
        assert rgb.shape == (2, 2, 3)
        assert np.array_equal(rgb, pal[arr])


class TestTgaConformance:
    CASES = [
        ("cbw8.tga", [43089]), ("ubw8.tga", [43089]),
        ("ccm8.tga", [38151]), ("ucm8.tga", [38151]),
        ("ctc24.tga", [9797, 9952, 9848]),
        ("utc24.tga", [9797, 9952, 9848]),
        ("utc16.tga", [64747, 64839, 64796]),
        ("utc32.tga", [9797, 9952, 9848, 0]),
        ("stefan_full_rgba.tga", [12603, 58561, 36064, 10807]),
        ("test1g.tga", [13077]),
    ]

    @pytest.mark.parametrize("name,exp", CASES,
                             ids=[c[0] for c in CASES])
    def test_checksums(self, name, exp):
        arr, pal, meta = T.parse_tga(_bytes("tga", name))
        got = [gdal_checksum(arr if arr.ndim == 2 else arr[:, :, b])
               for b in range(1 if arr.ndim == 2 else arr.shape[2])]
        assert got == exp

    def test_metadata(self):
        _, _, meta = T.parse_tga(_bytes("tga", "cbw8.tga"))
        assert meta["AUTHOR_NAME"] == "Ricky True"
        assert meta["IMAGE_ID"] == "Truevision(R) Sample Image"
        assert "COMMENTS" in meta

    def test_palette_entries(self):
        # test_tga_read_rle_color_table's quoted entries
        _, pal, _ = T.parse_tga(_bytes("tga", "ucm8.tga"))
        assert len(pal) == 256
        assert tuple(pal[0]) == (0, 0, 0)
        assert tuple(pal[1]) == (8, 8, 8)
        assert tuple(pal[64]) == (248, 0, 0)

    def test_rle_crossing_scanlines_matches_uncompressed(self):
        c, _, _ = T.parse_tga(_bytes("tga", "ctc24.tga"))
        u, _, _ = T.parse_tga(_bytes("tga", "utc24.tga"))
        assert np.array_equal(c, u)


class TestTgaRoundTrip:
    @pytest.mark.parametrize("shape", [(9, 13), (9, 13, 3), (9, 13, 4)])
    @pytest.mark.parametrize("rle", [False, True])
    def test_write_parse(self, shape, rle):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 256, shape).astype(np.uint8)
        a2, _, _ = T.parse_tga(T.format_tga(arr, rle=rle))
        assert np.array_equal(a2, arr)

    def test_palette(self):
        rng = np.random.default_rng(2)
        pal = rng.integers(0, 256, (7, 3)).astype(np.uint8)
        arr = rng.integers(0, 7, (20, 10)).astype(np.uint8)
        a2, p2, _ = T.parse_tga(T.format_tga(arr, pal, rle=True))
        assert np.array_equal(a2, arr)
        assert np.array_equal(p2[:7], pal)


class TestScans:
    def test_gif_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(5)
        from gdal_spark import codecs
        arrs = {f"g{i}": rng.integers(0, 256, (8, 9)).astype(np.uint8)
                for i in range(4)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 9, 8, "raw",
                 0.0, 1.0, 0.0, 0.0, 0.0, -1.0, 0, float(i), None)
                for i, (k, v) in enumerate(arrs.items())]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double, "
            "palette string")
        G.write_gif(src, str(tmp_path))
        df = G.scan_gif(spark, str(tmp_path / "*.gif"))
        got = {r.image_id: r for r in df.collect()}
        for i, (k, v) in enumerate(arrs.items()):
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)
            assert got[k].nodata == float(i)

    def test_tga_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(6)
        from gdal_spark import codecs
        arrs = {f"t{i}": rng.integers(0, 256, (6, 7, 3)).astype(np.uint8)
                for i in range(3)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 7, 6, "raw",
                 0.0, 1.0, 0.0, 0.0, 0.0, -1.0, 0, None)
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        T.write_tga(src, str(tmp_path), rle=True)
        df = T.scan_tga(spark, str(tmp_path / "*.tga"))
        got = {r.image_id: r for r in df.collect()}
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)
