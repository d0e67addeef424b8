"""hsv_merge + gdal_minmax_location analogs (operators/hsv.py)."""

import colorsys

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.operators.hsv import (
    hsv_merge_array,
    hsv_merge_images,
    hsv_to_rgb,
    minmax_location_array,
    minmax_location_images,
    rgb_to_hsv,
)


class TestHsvKernel:
    def test_round_trip_preserves_rgb(self):
        rng = np.random.default_rng(11)
        rgb = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        h, s, v = rgb_to_hsv(rgb)
        back = hsv_to_rgb(h, s, v)
        # conversion is exact up to int truncation in the sector math
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 1

    def test_against_colorsys(self):
        rng = np.random.default_rng(12)
        rgb = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        h, s, v = rgb_to_hsv(rgb)
        for y in range(8):
            for x in range(8):
                ch, cs, cv = colorsys.rgb_to_hsv(
                    rgb[y, x, 0] / 255.0, rgb[y, x, 1] / 255.0,
                    rgb[y, x, 2] / 255.0,
                )
                assert h[y, x] == pytest.approx(ch, abs=1e-9)
                # reference saturates by max(1, maxc) (not maxc), so
                # compare only where maxc > 0
                if rgb[y, x].max() > 0:
                    assert s[y, x] == pytest.approx(cs, abs=1e-9)
                assert v[y, x] == pytest.approx(cv * 255.0, abs=1e-9)

    def test_merge_keeps_hue_replaces_value(self):
        rng = np.random.default_rng(13)
        rgb = rng.integers(32, 224, size=(16, 16, 3), dtype=np.uint8)
        grey = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        out = hsv_merge_array(rgb, grey)
        oh, _os, ov = rgb_to_hsv(out)
        ih, _is, _iv = rgb_to_hsv(rgb)
        # V of the result equals the grey intensity exactly
        np.testing.assert_array_equal(out.max(axis=2), grey)
        # hue survives within uint8 quantization where saturation is
        # meaningful
        sat_mask = (_os > 0.1) & (ov > 32)
        dh = np.abs(oh - ih)[sat_mask]
        dh = np.minimum(dh, 1.0 - dh)
        assert float(dh.max() if dh.size else 0.0) < 0.05


class TestMinMaxLocation:
    GT = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)

    def test_locations_and_geo(self):
        band = np.zeros((10, 12), dtype=np.uint8) + 50
        band[7, 3] = 7     # min
        band[2, 9] = 201   # max
        rec = minmax_location_array(band, self.GT)
        assert (rec["min_val"], rec["min_px"], rec["min_py"]) == (7.0, 3, 7)
        assert (rec["max_val"], rec["max_px"], rec["max_py"]) == (201.0, 9, 2)
        assert rec["min_x"] == 100.0 + 3.5 * 2.0
        assert rec["min_y"] == 500.0 - 7.5 * 2.0

    def test_first_occurrence_scan_order(self):
        band = np.zeros((4, 4), dtype=np.uint8)
        rec = minmax_location_array(band, self.GT)
        assert (rec["min_px"], rec["min_py"]) == (0, 0)


class TestDistributed:
    def test_merge_and_minmax_match_kernels(self, spark):
        from gdal_spark import fixtures

        df = fixtures.images_df(spark, 4, tier="t2", partitions=2)

        # greyscale side: band-0 of a DIFFERENT fixture pattern, re-keyed
        import pandas as pd

        def greyify(it):
            for pdf in it:
                rows = []
                for r in pdf.itertuples(index=False):
                    arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                    g = arr if arr.ndim == 2 else arr[:, :, 0]
                    rows.append(
                        {"image_id": r.image_id,
                         "bytes": codecs.encode_png(255 - g),
                         "fmt": "png"}
                    )
                yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

        grey = df.select("image_id", "bytes", "fmt").mapInPandas(
            greyify, schema="image_id string, bytes binary, fmt string"
        )
        got = {r.image_id: r for r in hsv_merge_images(df, grey).collect()}
        mm = {r.image_id: r for r in minmax_location_images(df).collect()}
        assert len(got) == 4 and len(mm) == 4
        for i in range(4):
            rec = fixtures.image_record(i, tier="t2")
            arr = codecs.decode_image(rec["bytes"], rec["fmt"])
            g = 255 - (arr if arr.ndim == 2 else arr[:, :, 0])
            want = hsv_merge_array(arr, g)
            r = got[rec["image_id"]]
            np.testing.assert_array_equal(
                codecs.decode_image(bytes(r.bytes), "png"), want
            )
            band = arr if arr.ndim == 2 else arr[:, :, 0]
            wrec = minmax_location_array(
                band, tuple(rec[f"gt{j}"] for j in range(6))
            )
            m = mm[rec["image_id"]]
            for k, v in wrec.items():
                assert getattr(m, k) == pytest.approx(v), (i, k)


class TestReviewRegressions:
    def test_hsv_clips_over_255_intensity(self):
        rgb = np.full((4, 4, 3), 100, dtype=np.uint8)
        grey = np.full((4, 4), 300.0)  # 16-bit-style intensity
        out = hsv_merge_array(rgb, grey)
        assert out.max() == 255  # saturates, no modulo wrap

    def test_hsv_size_mismatch_raises(self):
        with pytest.raises(ValueError, match="differ in size"):
            hsv_merge_array(
                np.zeros((8, 8, 3), np.uint8), np.zeros((4, 4), np.uint8)
            )

    def test_minmax_skips_nan(self):
        band = np.array([[np.nan, 5.0], [9.0, 1.0]])
        rec = minmax_location_array(band, (0.0, 1.0, 0.0, 2.0, 0.0, -1.0))
        assert rec["min_val"] == 1.0 and rec["max_val"] == 9.0
        assert (rec["min_px"], rec["min_py"]) == (1, 1)
