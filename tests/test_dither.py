"""Median-cut palette + Floyd-Steinberg dither (gdalmediancut/gdaldither)."""

import numpy as np
import pytest

from gdal_spark.operators.dither import (
    compute_palette,
    dither_array,
    median_cut_palette,
    nearest_palette_index,
    quantize_array,
    rgb_to_pct,
)


class TestMedianCut:
    def test_distinct_colors_get_own_entries(self):
        colors = np.array([[255, 0, 0]] * 50 + [[0, 255, 0]] * 50 + [[0, 0, 255]] * 50)
        # with box headroom, impure boxes keep splitting until pure
        pal = median_cut_palette(colors, 8)
        idx = nearest_palette_index(colors, pal)
        np.testing.assert_array_equal(pal[idx], colors)

    def test_palette_size_cap(self):
        rng = np.random.default_rng(1)
        colors = rng.integers(0, 256, size=(5000, 3))
        pal = median_cut_palette(colors, 16)
        assert 1 <= len(pal) <= 16

    def test_single_color(self):
        pal = median_cut_palette(np.full((100, 3), 42), 8)
        assert len(pal) == 1 and (pal[0] == 42).all()


class TestDither:
    def test_quantize_exact_palette_is_identity(self):
        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[:, 2:] = 255
        idx = quantize_array(img, pal)
        assert (idx[:, :2] == 0).all() and (idx[:, 2:] == 1).all()

    def test_dither_preserves_mean_gray(self):
        # 50% gray with a black/white palette -> ~half the pixels white
        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        img = np.full((24, 24, 3), 128, dtype=np.uint8)
        idx = dither_array(img, pal)
        frac_white = (idx == 1).mean()
        assert abs(frac_white - 128 / 255) < 0.05
        # plain quantization cannot represent the mean at all
        q = quantize_array(img, pal)
        assert len(np.unique(q)) == 1

    def test_df_pipeline(self, spark):
        from gdal_spark import codecs as C

        rng = np.random.default_rng(2)
        rows = []
        for i in range(3):
            arr = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
            rows.append((f"i{i}", bytearray(C.encode_png(arr)), "png"))
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        pal = compute_palette(df, n_colors=32)
        assert 1 <= len(pal) <= 32
        out = rgb_to_pct(df, pal, dither=False).collect()
        assert len(out) == 3
        for r in out:
            idx = np.frombuffer(bytes(r.data), dtype=np.uint8)
            assert idx.max() < len(pal)


class TestPctToRgb:
    def test_roundtrip_exact_palette(self, spark):
        """pct2rgb(rgb2pct(img)) == img when the image's colors all sit
        exactly on the palette."""
        from gdal_spark import codecs
        from gdal_spark.operators.dither import pct_to_rgb

        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
        )
        idx_img = np.tile(np.arange(4, dtype=np.uint8), (8, 4))[:8, :16]
        rgb_in = pal[idx_img]
        row = ("p1", bytearray(codecs.encode_png(rgb_in)), "png")
        df = spark.createDataFrame([row], "image_id string, bytes binary, fmt string")
        quant = rgb_to_pct(df, pal, dither=False)
        back = pct_to_rgb(quant, pal).collect()
        assert len(back) == 1
        out = codecs.decode_png(bytes(back[0]["bytes"]))
        np.testing.assert_array_equal(out, rgb_in)
