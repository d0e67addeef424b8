"""Tests for the approximate transformer (gdalwarp -et analog):
error bound, exact-fallback on discontinuities, call-count reduction,
and warp output parity."""

import numpy as np

from gdal_spark.operators.warp import (
    _approx_grid_transform,
    apply_gt,
    geo_transform_points,
    invert_gt,
    suggested_output_grid,
    warp_array,
)


def _counting(fn):
    calls = {"n": 0, "pts": 0}

    def wrapped(x, y):
        calls["n"] += 1
        calls["pts"] += int(np.asarray(x).size)
        return fn(x, y)

    return wrapped, calls


class TestApproxGridTransform:
    def _utm_chain(self):
        """dst (4326 degrees) pixel -> src (EPSG:32633 meters) pixel —
        the expensive inverse-series chain the approximation targets."""
        src_gt = (500000.0 - 200 * 30.0, 30.0, 0.0, 5_000_000.0, 0.0, -30.0)
        inv = invert_gt(src_gt)

        def fn(ppx, ppy):
            # dst grid: 0.0001-degree pixels around (15E, 45N)
            gx = 14.8 + np.asarray(ppx) * 1e-4
            gy = 45.2 - np.asarray(ppy) * 1e-4
            sx, sy = geo_transform_points(gx, gy, 4326, 32633)
            return apply_gt(inv, sx, sy)

        return fn

    def test_error_bound_everywhere(self):
        fn = self._utm_chain()
        xv = np.arange(300, dtype=np.float64) + 0.5
        yv = np.arange(200, dtype=np.float64) + 0.5
        ax, ay = _approx_grid_transform(fn, xv, yv, max_err=0.125, step=8)
        ex, ey = fn(*np.meshgrid(xv, yv))
        err = np.hypot(ax - ex, ay - ey)
        # validated at midpoints; smooth CRS keeps the whole grid within
        # a small multiple of the threshold — assert the hard bound GDAL
        # users rely on (a fraction of a pixel)
        assert float(err.max()) <= 0.125

    def test_exact_call_reduction(self):
        fn, calls = _counting(self._utm_chain())
        xv = np.arange(512, dtype=np.float64) + 0.5
        yv = np.arange(512, dtype=np.float64) + 0.5
        _approx_grid_transform(fn, xv, yv, max_err=0.125, step=8)
        # control lattice + midpoints ~ 2 * (512/8)^2 of 512^2 points
        assert calls["pts"] < 0.05 * 512 * 512

    def test_small_grid_falls_back_exact(self):
        fn = self._utm_chain()
        xv = np.arange(6, dtype=np.float64)
        yv = np.arange(5, dtype=np.float64)
        ax, ay = _approx_grid_transform(fn, xv, yv, max_err=0.125, step=8)
        ex, ey = fn(*np.meshgrid(xv, yv))
        assert np.array_equal(ax, ex) and np.array_equal(ay, ey)

    def test_discontinuity_recomputed_exactly(self):
        # a step function: interpolation across the jump is wrong, the
        # midpoint check must route every affected cell to the exact path
        def fn(x, y):
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            return np.where(x < 100.0, x, x + 1e6), y

        xv = np.arange(256, dtype=np.float64)
        yv = np.arange(64, dtype=np.float64)
        ax, ay = _approx_grid_transform(fn, xv, yv, max_err=0.125, step=8)
        ex, ey = fn(*np.meshgrid(xv, yv))
        err = np.hypot(ax - ex, ay - ey)
        assert float(err.max()) <= 0.125

    def test_affine_is_exactly_interpolated(self):
        # bilinear interpolation reproduces an affine transform exactly:
        # zero cells should fail validation
        def fn(x, y):
            return 2.0 * np.asarray(x) + 3.0, np.asarray(y) * -0.5 + 7.0

        cnt, calls = _counting(fn)
        xv = np.arange(128, dtype=np.float64)
        yv = np.arange(128, dtype=np.float64)
        ax, ay = _approx_grid_transform(cnt, xv, yv, max_err=1e-9, step=16)
        ex, ey = fn(*np.meshgrid(xv, yv))
        assert np.allclose(ax, ex, atol=1e-6) and np.allclose(ay, ey, atol=1e-6)
        # only lattice + midpoint evaluations, no exact-recompute pass
        assert calls["n"] == 2


class TestWarpApprox:
    def _src(self):
        rng = np.random.default_rng(11)
        src = rng.integers(0, 255, size=(96, 128)).astype(np.float64)
        # EPSG:32633 source around the zone center
        gt = (480000.0, 30.0, 0.0, 5_001_000.0, 0.0, -30.0)
        return src, gt

    def test_warp_parity_near(self):
        src, gt = self._src()
        dst_gt, ow, oh = suggested_output_grid(gt, 32633, 128, 96, 4326)
        exact, a_exact = warp_array(src, gt, 32633, (oh, ow), dst_gt, 4326, "near")
        approx, a_approx = warp_array(
            src, gt, 32633, (oh, ow), dst_gt, 4326, "near",
            approx_error=0.125,
        )
        assert np.array_equal(a_exact, a_approx)
        # a 0.125-px coordinate error can flip only pixels whose sample
        # point sits within 0.125 px of a cell boundary
        frac_diff = np.mean(exact != approx)
        assert frac_diff < 0.3  # loose sanity: overwhelming majority equal
        assert float(np.mean(np.isclose(exact, approx))) > 0.7

    def test_warp_parity_bilinear_close(self):
        src, gt = self._src()
        dst_gt, ow, oh = suggested_output_grid(gt, 32633, 128, 96, 4326)
        exact, _ = warp_array(src, gt, 32633, (oh, ow), dst_gt, 4326, "bilinear")
        approx, _ = warp_array(
            src, gt, 32633, (oh, ow), dst_gt, 4326, "bilinear",
            approx_error=0.125,
        )
        # bilinear output moves continuously with the sample coordinate:
        # 0.125-px error -> small value deviation
        d = np.abs(exact - approx)
        assert float(d.max()) < 32.0 and float(d.mean()) < 1.0

    def test_mercator_domain_mask_identical(self):
        # full-globe 3857 -> 4326 includes |lat| > 85.05 rows where the
        # transformer pushes points out of bounds (discontinuity): the
        # validity mask must equal the exact path's bit-for-bit
        from gdal_spark.grid import MercatorGrid

        os_m = MercatorGrid().origin_shift
        src = np.full((64, 64), 7.0)
        gt = (-os_m, 2 * os_m / 64, 0.0, os_m, 0.0, -2 * os_m / 64)
        dst_gt = (-180.0, 360.0 / 128, 0.0, 90.0, 0.0, -180.0 / 96)
        exact, a_exact = warp_array(src, gt, 3857, (96, 128), dst_gt, 4326, "near")
        approx, a_approx = warp_array(
            src, gt, 3857, (96, 128), dst_gt, 4326, "near",
            approx_error=0.125,
        )
        assert np.array_equal(a_exact, a_approx)
        assert np.array_equal(exact, approx)


class TestTargetResAndTap:
    """gdalwarp -tr / -tap output-grid semantics."""

    def _src(self):
        return (400000.0, 30.0, 0.0, 5_200_000.0, 0.0, -30.0), 128, 96

    def test_tr_sets_exact_resolution(self):
        gt, w, h = self._src()
        dst_gt, ow, oh = suggested_output_grid(
            gt, 32633, w, h, 3857, target_res=(50.0, 50.0)
        )
        assert dst_gt[1] == 50.0 and dst_gt[5] == -50.0

    def test_tap_snaps_origin_to_res_multiples(self):
        gt, w, h = self._src()
        dst_gt, ow, oh = suggested_output_grid(
            gt, 32633, w, h, 3857, target_res=(50.0, 50.0), tap=True
        )
        assert dst_gt[0] % 50.0 == 0.0
        assert dst_gt[3] % 50.0 == 0.0
        # extent snapped OUTWARD: covers the raw transformed source
        # extent on every side (the -tr-only grid may clip up to half a
        # pixel at the far edges — GDAL rounds the same way)
        bx = np.concatenate([np.linspace(0, w, 21), np.linspace(0, w, 21),
                             np.zeros(21), np.full(21, float(w))])
        by = np.concatenate([np.zeros(21), np.full(21, float(h)),
                             np.linspace(0, h, 21), np.linspace(0, h, 21)])
        gx, gy = apply_gt(gt, bx, by)
        tx, ty = geo_transform_points(gx, gy, 32633, 3857)
        assert dst_gt[0] <= tx.min() and dst_gt[0] + ow * 50.0 >= tx.max()
        assert dst_gt[3] >= ty.max() and dst_gt[3] - oh * 50.0 <= ty.min()

    def test_adjacent_sources_share_one_grid(self):
        # the point of -tap: two neighbouring rasters snap onto grids
        # whose origins differ by an integer number of pixels
        gt1 = (400000.0, 30.0, 0.0, 5_200_000.0, 0.0, -30.0)
        gt2 = (400000.0 + 128 * 30.0 + 7.0, 30.0, 0.0, 5_200_000.0 - 13.0, 0.0, -30.0)
        a, _, _ = suggested_output_grid(gt1, 32633, 128, 96, 3857,
                                        target_res=(50.0, 50.0), tap=True)
        b, _, _ = suggested_output_grid(gt2, 32633, 128, 96, 3857,
                                        target_res=(50.0, 50.0), tap=True)
        assert (b[0] - a[0]) % 50.0 == 0.0
        assert (b[3] - a[3]) % 50.0 == 0.0

    def test_tap_without_tr_raises(self):
        import pytest

        gt, w, h = self._src()
        with pytest.raises(ValueError, match="tap"):
            suggested_output_grid(gt, 32633, w, h, 3857, tap=True)


class TestSrcNodata:
    """gdalwarp -srcnodata (UNIFIED_SRC_NODATA): nodata source pixels
    invalidate destination pixels via a same-kernel density mask."""

    def test_identity_near_mask_equals_source_mask(self):
        src = np.arange(400, dtype=np.float64).reshape(20, 20)
        src[5:9, 3:7] = -99.0
        gt = (0.0, 10.0, 0.0, 200.0, 0.0, -10.0)
        out, alpha = warp_array(
            src, gt, 3857, (20, 20), gt, 3857, "near", src_nodata=-99.0
        )
        exp_mask = src != -99.0
        assert np.array_equal(alpha > 0, exp_mask)
        assert np.all(out[~exp_mask] == 0)
        assert np.array_equal(out[exp_mask], src[exp_mask])

    def test_multiband_all_bands_rule(self):
        src = np.full((8, 8, 3), 50.0)
        src[2, 2] = (-1.0, -1.0, -1.0)   # all bands match -> nodata
        src[3, 3] = (-1.0, 50.0, 50.0)   # partial match -> VALID
        gt = (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
        _, alpha = warp_array(
            src, gt, 3857, (8, 8), gt, 3857, "near", src_nodata=-1.0
        )
        assert alpha[2, 2] == 0 and alpha[3, 3] == 255

    def test_average_downsample_majority_mask(self):
        src = np.full((16, 16), 100.0)
        src[:8, :8] = -5.0  # top-left quadrant nodata
        gt = (0.0, 1.0, 0.0, 16.0, 0.0, -1.0)
        dst_gt = (0.0, 8.0, 0.0, 16.0, 0.0, -8.0)  # 2x2 output
        out, alpha = warp_array(
            src, gt, 3857, (2, 2), dst_gt, 3857, "average", src_nodata=-5.0
        )
        assert alpha[0, 0] == 0          # fully-nodata window masked
        assert alpha[0, 1] == 255 and alpha[1, 0] == 255 and alpha[1, 1] == 255
        assert out[1, 1] == 100.0

    def test_no_nodata_present_noop(self):
        src = np.arange(64, dtype=np.float64).reshape(8, 8)
        gt = (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
        a, aa = warp_array(src, gt, 3857, (8, 8), gt, 3857, "near")
        b, ba = warp_array(
            src, gt, 3857, (8, 8), gt, 3857, "near", src_nodata=-1.0
        )
        assert np.array_equal(a, b) and np.array_equal(aa, ba)

    def test_sum_kernel_mask_uses_valid_fraction(self):
        # 'sum' of a 0/255 mask would mark any window with >=1 valid px
        # as fully valid; the density mask must instead use the valid
        # FRACTION (average): a 25%-valid window is masked out
        src = np.full((16, 16), 10.0)
        src[:8, :] = -5.0
        src[8:14, :8] = -5.0  # bottom-left window: only 25% valid
        gt = (0.0, 1.0, 0.0, 16.0, 0.0, -1.0)
        dst_gt = (0.0, 8.0, 0.0, 16.0, 0.0, -8.0)
        out, alpha = warp_array(
            src, gt, 3857, (2, 2), dst_gt, 3857, "sum", src_nodata=-5.0
        )
        assert alpha[1, 0] == 0    # 25% valid -> masked
        assert alpha[1, 1] == 255  # fully valid
