"""Window-reduce warp kernels (GRA_Average..GRA_RMS) vs closed-form
cases — pure numpy, no SparkSession.

Reference semantics: alg/gdalwarpkernel.cpp GWKAverageOrModeThread
(dispatch gdalwarpkernel.cpp:1202-1318, enum alg/gdalwarper.h:36-69):
reduce all source pixels whose centers fall in the destination pixel's
source-space footprint.
"""

import numpy as np
import pytest

from gdal_spark.operators.warp import warp_array
from gdal_spark.resample import (
    WINDOW_KERNELS,
    resize,
    sample_window_reduce,
)

# 4x4 with distinct values
A4 = np.array(
    [
        [1.0, 3.0, 10.0, 10.0],
        [5.0, 7.0, 10.0, 50.0],
        [2.0, 2.0, 8.0, 8.0],
        [2.0, 4.0, 8.0, 6.0],
    ]
)


class TestResizeWindowKernels:
    """2x integral downsample: each output pixel reduces one 2x2 block."""

    @pytest.mark.parametrize(
        "kind,expect",
        [
            ("average", [[4.0, 20.0], [2.5, 7.5]]),
            ("sum", [[16.0, 80.0], [10.0, 30.0]]),
            ("min", [[1.0, 10.0], [2.0, 6.0]]),
            ("max", [[7.0, 50.0], [4.0, 8.0]]),
            ("med", [[4.0, 10.0], [2.0, 8.0]]),
            ("rms", None),  # computed below
            ("mode", [[1.0, 10.0], [2.0, 8.0]]),  # ties -> smallest; 10 wins 3/4
        ],
    )
    def test_2x_blocks(self, kind, expect):
        out = resize(A4, 2, 2, kind)
        if kind == "rms":
            blocks = [
                A4[:2, :2].ravel(), A4[:2, 2:].ravel(),
                A4[2:, :2].ravel(), A4[2:, 2:].ravel(),
            ]
            expect = np.array(
                [np.sqrt((b**2).mean()) for b in blocks]
            ).reshape(2, 2)
        np.testing.assert_allclose(out, np.asarray(expect), atol=1e-12)

    def test_q1_q3_closed_form(self):
        # 1x4 block: quartiles of [1,3,10,10] with linear interpolation
        row = A4[:1].copy()
        out1 = resize(row[0:1, :], 1, 1, "q1")
        out3 = resize(row[0:1, :], 1, 1, "q3")
        assert out1[0, 0] == pytest.approx(np.quantile([1, 3, 10, 10], 0.25))
        assert out3[0, 0] == pytest.approx(np.quantile([1, 3, 10, 10], 0.75))

    def test_mode_majority(self):
        arr = np.array([[5.0, 5.0], [5.0, 9.0]])
        assert resize(arr, 1, 1, "mode")[0, 0] == 5.0

    def test_upsample_falls_back_to_nearest(self):
        out = resize(A4, 8, 8, "average")
        # each source pixel covers a 2x2 output block exactly
        np.testing.assert_allclose(out[::2, ::2], A4)

    def test_multiband(self):
        a3 = np.dstack([A4, A4 * 2])
        out = resize(a3, 2, 2, "min")
        np.testing.assert_allclose(out[..., 1], 2 * resize(A4, 2, 2, "min"))


class TestSampleWindowReduce:
    def test_explicit_boxes(self):
        bx0 = np.array([0.0]); by0 = np.array([0.0])
        bx1 = np.array([2.0]); by1 = np.array([2.0])
        v, ok = sample_window_reduce(A4, bx0, by0, bx1, by1, "max")
        assert v[0] == 7.0 and ok[0]

    def test_out_of_range_invalid(self):
        v, ok = sample_window_reduce(
            A4, np.array([100.0]), np.array([100.0]),
            np.array([102.0]), np.array([102.0]), "average",
        )
        assert not ok[0]


class TestWarpWindowKernels:
    def test_affine_2x_downsample_warp_average(self):
        # src: 4x4 at gt scale 1; dst: 2x2 at scale 2 over the same extent
        src_gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
        dst_gt = (0.0, 2.0, 0.0, 4.0, 0.0, -2.0)
        out, alpha = warp_array(A4, src_gt, 3857, (2, 2), dst_gt, 3857, "average")
        np.testing.assert_allclose(out, [[4.0, 20.0], [2.5, 7.5]], atol=1e-12)
        assert (alpha == 255).all()

    @pytest.mark.parametrize("kind", WINDOW_KERNELS)
    def test_all_kernels_run_and_match_resize(self, kind):
        src_gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
        dst_gt = (0.0, 2.0, 0.0, 4.0, 0.0, -2.0)
        out, _ = warp_array(A4, src_gt, 3857, (2, 2), dst_gt, 3857, kind)
        np.testing.assert_allclose(out, resize(A4, 2, 2, kind), atol=1e-12)

    def test_outside_footprint_zeroed(self):
        src_gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
        # dst extends beyond the source on the right
        dst_gt = (0.0, 4.0, 0.0, 4.0, 0.0, -4.0)
        out, alpha = warp_array(A4, src_gt, 3857, (1, 2), dst_gt, 3857, "average")
        assert alpha[0, 0] == 255 and alpha[0, 1] == 0
        assert out[0, 1] == 0.0


class TestCubicSpline:
    def test_bspline_partition_of_unity(self):
        import numpy as np

        from gdal_spark.resample import _bspline_weights

        f = np.linspace(0, 1, 11)
        w = _bspline_weights(f)
        np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-12)

    def test_constant_preserved(self):
        import numpy as np

        from gdal_spark.resample import resize

        a = np.full((8, 8), 42.0)
        out = resize(a, 5, 5, "cubicspline")
        np.testing.assert_allclose(out, 42.0, atol=1e-9)

    def test_smoother_than_catmull_rom(self):
        import numpy as np

        from gdal_spark.resample import resize

        a = np.zeros((9, 9))
        a[4, 4] = 100.0
        cs = resize(a, 18, 18, "cubicspline")
        cr = resize(a, 18, 18, "cubic")
        # B-spline smooths: lower peak than the interpolating Catmull-Rom
        assert cs.max() < cr.max()
