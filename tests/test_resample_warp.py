"""Unit tests: resampling kernels, warp kernel, translate pipeline.

Oracles are closed-form cases (constant fields, integral-factor boxes,
known window arithmetic) per SURVEY.md §5 test strategy (b)."""

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.operators.translate import projwin_to_srcwin, translate_array
from gdal_spark.operators.warp import (
    apply_gt,
    geo_transform_points,
    invert_gt,
    suggested_output_grid,
    warp_array,
)
from gdal_spark.resample import (
    resize,
    resize_average,
    resize_mode,
    sample_bilinear,
    sample_cubic,
    sample_lanczos,
    sample_nearest,
)


def grad(h, w, c=1):
    x = np.arange(w, dtype=np.float64)[None, :]
    y = np.arange(h, dtype=np.float64)[:, None]
    base = x + 2 * y
    if c == 1:
        return base
    return np.stack([base + 10 * b for b in range(c)], axis=2)


class TestSamplers:
    def test_nearest_exact(self):
        src = np.arange(12.0).reshape(3, 4)
        out, valid = sample_nearest(src, np.array([0.5, 3.9]), np.array([0.5, 2.1]))
        assert out.tolist() == [0.0, 11.0]
        assert valid.all()

    def test_nearest_out_of_range_invalid(self):
        src = np.zeros((3, 4))
        _, valid = sample_nearest(src, np.array([-0.1, 4.0]), np.array([1.0, 1.0]))
        assert not valid.any()

    def test_bilinear_linear_field_exact(self):
        # bilinear reproduces an affine field exactly in the interior
        src = grad(16, 16)
        xs = np.array([3.25, 7.5, 10.75])
        ys = np.array([4.25, 8.5, 12.75])
        out, _ = sample_bilinear(src, xs, ys)
        expected = (xs - 0.5) + 2 * (ys - 0.5)
        np.testing.assert_allclose(out, expected, rtol=1e-12)

    def test_bilinear_edge_degrades_to_nearest(self):
        # alg/gdal_interpolateatpoint.cpp:200-202
        src = grad(4, 4)
        out, _ = sample_bilinear(src, np.array([0.2]), np.array([0.2]))
        near, _ = sample_nearest(src, np.array([0.2]), np.array([0.2]))
        assert out[0] == near[0]

    def test_cubic_linear_field_exact(self):
        src = grad(16, 16)
        xs, ys = np.array([6.5, 7.25]), np.array([6.5, 9.75])
        out, _ = sample_cubic(src, xs, ys)
        expected = (xs - 0.5) + 2 * (ys - 0.5)
        np.testing.assert_allclose(out, expected, rtol=1e-10)

    def test_lanczos_constant_field_exact(self):
        src = np.full((16, 16), 42.0)
        out, _ = sample_lanczos(src, np.array([7.3]), np.array([8.9]))
        np.testing.assert_allclose(out, [42.0], rtol=1e-9)


class TestResize:
    def test_average_integral_factor_is_block_mean(self):
        src = np.arange(64.0).reshape(8, 8)
        out = resize_average(src, 4, 4)
        expected = src.reshape(4, 2, 4, 2).mean(axis=(1, 3))
        np.testing.assert_allclose(out, expected, rtol=1e-12)

    def test_average_preserves_total_mass(self):
        rng = np.random.default_rng(7)
        src = rng.uniform(0, 255, size=(10, 14))
        out = resize_average(src, 3, 5)
        # area-weighted box integrates exactly: mean is preserved
        np.testing.assert_allclose(out.mean(), src.mean(), rtol=1e-9)

    def test_average_fractional_edges(self):
        # 3 -> 2: output pixel 0 covers src [0, 1.5) = px0 + half of px1
        src = np.array([[0.0, 30.0, 60.0]])
        out = resize_average(src, 1, 2)
        np.testing.assert_allclose(out[0], [(0 + 15) / 1.5, (15 + 60) / 1.5], rtol=1e-12)

    def test_nearest_upsample(self):
        src = np.array([[1.0, 2.0], [3.0, 4.0]])
        out = resize(src, 4, 4, "near")
        assert out[0, 0] == 1 and out[0, 3] == 2 and out[3, 0] == 3 and out[3, 3] == 4

    def test_mode(self):
        src = np.array([[1, 1, 2, 2], [1, 3, 2, 3], [5, 5, 6, 7], [5, 5, 7, 7]])
        out = resize_mode(src, 2, 2)
        assert out[0, 0] == 1 and out[1, 0] == 5
        assert out[0, 1] == 2
        # tie 6,7,7,7 -> 7; tie-break path: 2x2 of {6,7,7,7}
        assert out[1, 1] == 7

    def test_resize_multichannel(self):
        src = grad(8, 8, 3)
        out = resize(src, 4, 4, "average")
        assert out.shape == (4, 4, 3)


class TestGeoTransform:
    def test_invert_roundtrip(self):
        gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        inv = invert_gt(gt)
        x, y = apply_gt(gt, np.array([3.5]), np.array([7.25]))
        px, py = apply_gt(inv, x, y)
        np.testing.assert_allclose([px[0], py[0]], [3.5, 7.25], rtol=1e-12)

    def test_rotated_gt_roundtrip(self):
        gt = (100.0, 2.0, 0.5, 200.0, -0.25, -3.0)
        inv = invert_gt(gt)
        x, y = apply_gt(gt, np.array([10.0]), np.array([20.0]))
        px, py = apply_gt(inv, x, y)
        np.testing.assert_allclose([px[0], py[0]], [10.0, 20.0], atol=1e-9)

    def test_4326_3857_roundtrip(self):
        lon = np.array([-123.5, 0.0, 45.0])
        lat = np.array([37.7, 0.0, -60.0])
        mx, my = geo_transform_points(lon, lat, 4326, 3857)
        lon2, lat2 = geo_transform_points(mx, my, 3857, 4326)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


class TestWarpArray:
    def test_identity_warp_is_copy(self):
        src = grad(20, 20)
        gt = (0.0, 1.0, 0.0, 20.0, 0.0, -1.0)
        out, alpha = warp_array(src, gt, 3857, (20, 20), gt, 3857, "near")
        np.testing.assert_array_equal(out, src)
        assert (alpha == 255).all()

    def test_shift_warp(self):
        src = grad(20, 20)
        gt = (0.0, 1.0, 0.0, 20.0, 0.0, -1.0)
        # dst origin shifted +5 in x: dst col 0 reads src col 5
        dst_gt = (5.0, 1.0, 0.0, 20.0, 0.0, -1.0)
        out, alpha = warp_array(src, gt, 3857, (20, 20), dst_gt, 3857, "near")
        np.testing.assert_array_equal(out[:, :15], src[:, 5:])
        assert (alpha[:, 15:] == 0).all()

    def test_reproject_4326_to_3857_center(self):
        # global 4326 raster -> 3857: equator center maps to center
        src = grad(180, 360)
        gt = (-180.0, 1.0, 0.0, 90.0, 0.0, -1.0)
        dst_gt, ow, oh = suggested_output_grid(gt, 4326, 360, 180, 3857)
        out, alpha = warp_array(src, gt, 4326, (oh, ow), dst_gt, 3857, "bilinear")
        assert alpha.mean() > 200  # mostly valid
        # pixel at dst center = (0,0) meters = (lon 0, lat 0) = src (180, 90)
        cy, cx = oh // 2, ow // 2
        expected = 180 + 2 * 90
        assert abs(out[cy, cx] - expected) < 6

    def test_upscale_bilinear_psnr(self):
        src = grad(50, 50)
        gt = (0.0, 1.0, 0.0, 50.0, 0.0, -1.0)
        dst_gt = (0.0, 0.5, 0.0, 50.0, 0.0, -0.5)
        out, _ = warp_array(src, gt, 3857, (100, 100), dst_gt, 3857, "bilinear")
        # downsample back and compare
        back = resize(out, 50, 50, "average")
        assert codecs.psnr(back[2:-2, 2:-2], src[2:-2, 2:-2]) > 40


class TestTranslate:
    def test_srcwin_exact(self):
        src = grad(20, 20)
        out = translate_array(src, srcwin=(5, 5, 10, 10))
        np.testing.assert_array_equal(out, src[5:15, 5:15])

    def test_srcwin_partially_outside_pads_zero(self):
        src = grad(10, 10)
        out = translate_array(src, srcwin=(-2, -2, 6, 6))
        assert out.shape == (6, 6)
        assert (out[:2, :] == 0).all() and (out[:, :2] == 0).all()
        np.testing.assert_array_equal(out[2:, 2:], src[:4, :4])

    def test_projwin_rounding(self):
        # gdal_translate_lib.cpp:889-896 floor(+0.001)
        gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        win = projwin_to_srcwin(gt, 440720.0 + 60 * 2, 3751320.0 - 60 * 3, 440720.0 + 60 * 12, 3751320.0 - 60 * 13)
        assert win == (2, 3, 10, 10)

    def test_scale_linear(self):
        src = np.array([[0.0, 128.0, 255.0]])
        out = translate_array(src, scale=(0, 255, 0, 100), out_dtype=np.uint8)
        assert out.tolist() == [[0, 50, 100]]

    def test_scale_exponent(self):
        src = np.array([[0.0, 255.0]])
        out = translate_array(src, scale=(0, 255, 0, 100), exponent=2.0, out_dtype=np.uint8)
        assert out.tolist() == [[0, 100]]

    def test_band_select_reorder(self):
        src = grad(4, 4, 3)
        out = translate_array(src, bands=[2, 0])
        np.testing.assert_array_equal(out[:, :, 0], src[:, :, 2])
        np.testing.assert_array_equal(out[:, :, 1], src[:, :, 0])

    def test_outsize(self):
        src = grad(8, 8)
        out = translate_array(src, outsize=(4, 4), resampling="average")
        expected = src.reshape(4, 2, 4, 2).mean(axis=(1, 3))
        np.testing.assert_allclose(out, expected, rtol=1e-12)


class TestPansharpen:
    """Weighted-Brovey (alg/gdalpansharpen.cpp) vs closed-form."""

    def test_ratio_identity_when_pan_equals_pseudo(self):
        import numpy as np

        from gdal_spark.operators.pansharpen import pansharpen_array

        ms = np.dstack([np.full((4, 4), 40.0), np.full((4, 4), 80.0)])
        # pan at 2x resolution equal to the pseudo-pan (mean = 60)
        pan = np.full((8, 8), 60.0)
        out = pansharpen_array(pan, ms)
        np.testing.assert_allclose(out[..., 0], 40.0)
        np.testing.assert_allclose(out[..., 1], 80.0)

    def test_pan_scales_ms_proportionally(self):
        import numpy as np

        from gdal_spark.operators.pansharpen import pansharpen_array

        ms = np.dstack([np.full((4, 4), 40.0), np.full((4, 4), 80.0)])
        pan = np.full((8, 8), 120.0)  # 2x the pseudo-pan
        out = pansharpen_array(pan, ms)
        np.testing.assert_allclose(out[..., 0], 80.0)
        np.testing.assert_allclose(out[..., 1], 160.0)

    def test_custom_weights(self):
        import numpy as np

        from gdal_spark.operators.pansharpen import pansharpen_array

        ms = np.dstack([np.full((2, 2), 100.0), np.full((2, 2), 0.0)])
        pan = np.full((4, 4), 50.0)
        out = pansharpen_array(pan, ms, weights=[1.0, 0.0])
        np.testing.assert_allclose(out[..., 0], 50.0)  # ratio 0.5

    def test_images_df(self, spark):
        import numpy as np

        from gdal_spark import codecs as C
        from gdal_spark.operators.pansharpen import pansharpen_images

        rng = np.random.default_rng(2)
        ms = rng.integers(10, 200, size=(8, 8, 3)).astype(np.uint8)
        pan = np.clip(
            np.round(
                np.repeat(np.repeat(ms.mean(axis=2), 2, 0), 2, 1)
            ), 0, 255
        ).astype(np.uint8)
        common = (0.0, 1.0, 0.0, 16.0, 0.0, -1.0)
        row_pan = ("imgA", bytearray(C.encode_png(pan)), 16, 16, "png",
                   *common, 3857, 0.0, 0.0, 16.0, 16.0)
        row_ms = ("imgA", bytearray(C.encode_png(ms)), 8, 8, "png",
                  *common, 3857, 0.0, 0.0, 16.0, 16.0)
        sch = ("image_id string, bytes binary, w int, h int, fmt string, "
               "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
               "gt5 double, srid int, minx double, miny double, maxx double, maxy double")
        pan_df = spark.createDataFrame([row_pan], sch)
        ms_df = spark.createDataFrame([row_ms], sch)
        out = pansharpen_images(pan_df, ms_df).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.w, r.h) == (16, 16)
        arr = C.decode_image(bytes(r.bytes), r.fmt)
        assert arr.shape == (16, 16, 3)


class TestCutlineWarp:
    def test_cutline_zeroes_outside(self, spark):
        """gdalwarp -cutline: identity-CRS warp with a rectangle cutline
        covering the left half — right-half pixels must be zero, left
        half must match the no-cutline warp exactly."""
        import numpy as np

        from gdal_spark import codecs as C
        from gdal_spark import geom as G
        from gdal_spark.operators.warp import warp_images

        arr = np.tile(np.arange(64, dtype=np.uint8) * 3 + 10, (64, 1))
        gt = (1000.0, 10.0, 0.0, 2000.0, 0.0, -10.0)
        row = ("c1", bytearray(C.encode_png(arr)), 64, 64, "png", "cap", 0,
               *gt, 3857, 1000.0, 2000.0 - 640.0, 1000.0 + 640.0, 2000.0)
        sch = ("image_id string, bytes binary, w int, h int, fmt string, "
               "caption string, phash long, gt0 double, gt1 double, gt2 double, "
               "gt3 double, gt4 double, gt5 double, srid int, minx double, "
               "miny double, maxx double, maxy double")
        df = spark.createDataFrame([row], sch)
        # left half of the footprint, generous y-range
        cut = G.wkb_rect(990.0, 1200.0, 1000.0 + 320.0, 2100.0)
        plain = warp_images(df, 3857, resampling="near").collect()[0]
        cutr = warp_images(df, 3857, resampling="near", cutline_wkb=cut).collect()[0]
        a0 = C.decode_image(bytes(plain.bytes), plain.fmt)
        a1 = C.decode_image(bytes(cutr.bytes), cutr.fmt)
        assert a0.shape == a1.shape
        h, w = a0.shape[:2]
        np.testing.assert_array_equal(a1[:, : w // 2], a0[:, : w // 2])
        assert (a1[:, w // 2 + 1 :] == 0).all()
        assert (a0[:, w // 2 + 1 :] != 0).any()


class TestFootprintContract:
    def test_utm_target_footprint_is_mercator_meters(self, spark):
        """warp_images to a UTM zone must still emit minx..maxy in
        EPSG:3857 meters (the tile-assignment contract) — previously the
        columns silently carried native UTM meters."""
        import numpy as np

        from gdal_spark import fixtures
        from gdal_spark.grid import MercatorGrid
        from gdal_spark.operators.warp import geo_transform_points, warp_images

        df = fixtures.images_df(spark, 2, tier="t2", partitions=1)
        out = warp_images(df, 32631).collect()
        merc = MercatorGrid()
        for r in out:
            # sanity: footprint must be consistent with transforming the
            # output gt corners UTM->4326->3857
            xs = np.array([0.0, r.w, 0.0, r.w])
            ys = np.array([0.0, 0.0, r.h, r.h])
            X = r.gt0 + xs * r.gt1 + ys * r.gt2
            Y = r.gt3 + xs * r.gt4 + ys * r.gt5
            lon, lat = geo_transform_points(X, Y, 32631, 4326)
            mx, my = merc.latlon_to_meters(np.clip(lat, -85.05, 85.05), lon)
            assert r.minx == pytest.approx(float(mx.min()), rel=1e-9)
            assert r.maxy == pytest.approx(float(my.max()), rel=1e-9)


class TestPolarNodata:
    def test_mercator_source_gives_nodata_above_domain(self):
        """Warping a full-extent 3857 source to 4326: pixels above
        +-85.051 deg have NO mercator source and must come back as
        nodata (alpha 0), not a smeared copy of the source's edge row."""
        import numpy as np

        from gdal_spark.grid import ORIGIN_SHIFT
        from gdal_spark.operators.warp import warp_array

        src = np.full((64, 64), 200, dtype=np.uint8)
        src_gt = (-ORIGIN_SHIFT, 2 * ORIGIN_SHIFT / 64, 0.0,
                  ORIGIN_SHIFT, 0.0, -2 * ORIGIN_SHIFT / 64)
        # destination: full geodetic world, 64x32 (lat 90..-90)
        dst_gt = (-180.0, 360.0 / 64, 0.0, 90.0, 0.0, -180.0 / 32)
        out, alpha = warp_array(src, src_gt, 3857, (32, 64), dst_gt, 4326,
                                "bilinear")
        # top row: lat centers 87.1875 -> outside mercator -> nodata
        assert (alpha[0] == 0).all()
        # equator row fully covered
        assert (alpha[16] == 255).all()
