"""gdal2xyz analog: raster -> pixel-center point table."""

import numpy as np
import pytest

from gdal_spark.operators.translate import xyz_array
from tests.conftest import spark  # noqa: F401


class TestXyzKernel:
    GT = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)

    def test_centers_and_values(self):
        arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
        px, py, x, y, b, v = xyz_array(arr, self.GT)
        assert len(v) == 12 and set(b) == {0}
        # pixel (0,0) center: gt0 + 0.5*gt1, gt3 + 0.5*gt5
        i = np.flatnonzero((px == 0) & (py == 0))[0]
        assert x[i] == 101.0 and y[i] == 499.0
        assert v[i] == 0.0
        i = np.flatnonzero((px == 3) & (py == 2))[0]
        assert x[i] == 107.0 and y[i] == 495.0
        assert v[i] == 11.0

    def test_stride_and_bands(self):
        arr = np.random.default_rng(0).integers(
            0, 255, size=(8, 8, 3), dtype=np.uint8
        )
        px, py, x, y, b, v = xyz_array(arr, self.GT, stride=4, bands=[2, 0])
        # 2x2 positions x 2 bands
        assert len(v) == 8 and set(b.tolist()) == {0, 2}
        m = (px == 4) & (py == 4) & (b == 2)
        assert v[np.flatnonzero(m)[0]] == float(arr[4, 4, 2])

    def test_skip_value(self):
        arr = np.zeros((4, 4), dtype=np.uint8)
        arr[1, 2] = 7
        px, py, x, y, b, v = xyz_array(arr, self.GT, skip_value=0)
        assert len(v) == 1 and v[0] == 7.0 and px[0] == 2 and py[0] == 1

    def test_rotated_gt(self):
        gt = (10.0, 1.0, 0.25, 20.0, -0.5, -1.0)
        arr = np.ones((2, 2), dtype=np.uint8)
        px, py, x, y, b, v = xyz_array(arr, gt)
        i = np.flatnonzero((px == 1) & (py == 0))[0]
        assert x[i] == pytest.approx(10 + 1.5 * 1.0 + 0.5 * 0.25)
        assert y[i] == pytest.approx(20 + 1.5 * -0.5 + 0.5 * -1.0)


class TestXyzDistributed:
    def test_matches_local_kernel(self, spark):
        from gdal_spark import codecs as C
        from gdal_spark import fixtures
        from gdal_spark.operators.translate import raster_to_xyz

        imgs = fixtures.images_df(spark, 3, tier="t2", partitions=2)
        got = (
            raster_to_xyz(imgs, stride=16)
            .orderBy("image_id", "band", "py", "px")
            .collect()
        )
        want = []
        for i in range(3):
            rec = fixtures.image_record(i, tier="t2")
            arr = C.decode_image(rec["bytes"], rec["fmt"])
            gt = tuple(rec[f"gt{j}"] for j in range(6))
            px, py, xs, ys, bs, vs = xyz_array(arr, gt, stride=16)
            want.extend(
                (rec["image_id"], int(b_), int(q), int(p))
                for p, q, b_ in zip(px, py, bs)
            )
        want.sort()
        assert [(r.image_id, r.band, r.py, r.px) for r in got] == want
        # spot-check one value end-to-end
        rec = fixtures.image_record(0, tier="t2")
        arr = np.atleast_3d(C.decode_image(rec["bytes"], rec["fmt"]))
        r0 = [r for r in got if r.image_id == rec["image_id"]][0]
        assert r0.value == float(arr[r0.py, r0.px, r0.band])
