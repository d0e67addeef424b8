"""gdalmove analog (operators/move.py) — reference:
swig/python/gdal-utils/osgeo_utils/gdalmove.py move() semantics."""

import numpy as np
import pytest

from gdal_spark.operators.move import (
    inv_geotransform,
    move_georeference,
    move_georeference_arrays,
)
from gdal_spark.operators.warp import geo_transform_points


class TestInvGeoTransform:
    def test_round_trip(self):
        gts = np.array(
            [
                [100.0, 2.5, 0.0, 500.0, 0.0, -3.0],
                [-7.0, 1.0, 0.25, 9.0, -0.5, -2.0],  # rotated/sheared
            ]
        )
        inv = inv_geotransform(gts)
        px, py = np.array([[3.0, 11.0]]).T, np.array([[5.0, 2.0]]).T
        for i in range(2):
            gx = gts[i, 0] + px[:, 0] * gts[i, 1] + py[:, 0] * gts[i, 2]
            gy = gts[i, 3] + px[:, 0] * gts[i, 4] + py[:, 0] * gts[i, 5]
            bx = inv[i, 0] + gx * inv[i, 1] + gy * inv[i, 2]
            by = inv[i, 3] + gx * inv[i, 4] + gy * inv[i, 5]
            np.testing.assert_allclose(bx, px[:, 0], atol=1e-9)
            np.testing.assert_allclose(by, py[:, 0], atol=1e-9)

    def test_singular_is_nan(self):
        inv = inv_geotransform(np.zeros((1, 6)))
        assert not np.isfinite(inv[0, 1])


class TestKernel:
    def test_same_srid_affine_is_exact(self):
        # any affine map is reproduced exactly by the 3-point refit,
        # including rotated/sheared geotransforms
        gts = np.array(
            [
                [440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0],
                [1000.0, 10.0, 3.0, 2000.0, -2.0, -8.0],
            ]
        )
        r = move_georeference_arrays(
            gts, np.array([256.0, 100.0]), np.array([256.0, 80.0]),
            3857, 3857,
        )
        np.testing.assert_allclose(r["new_gt"], gts, rtol=1e-12)
        assert np.all(r["err_geo"] < 1e-7)
        assert np.all(r["err_px"] < 1e-9)

    def test_mercator_to_geographic_corners_exact(self):
        gt = np.array([[-5000000.0, 2000.0, 0.0, 6000000.0, 0.0, -2000.0]])
        w = np.array([512.0])
        h = np.array([512.0])
        r = move_georeference_arrays(gt, w, h, 3857, 4326)
        ngt = r["new_gt"][0]
        # UL / UR / LL land exactly on the true reprojection
        for px, py in [(0.0, 0.0), (512.0, 0.0), (0.0, 512.0)]:
            sx = gt[0, 0] + px * gt[0, 1]
            sy = gt[0, 3] + py * gt[0, 5]
            tx, ty = geo_transform_points(
                np.array([sx]), np.array([sy]), 3857, 4326
            )
            assert ngt[0] + px * ngt[1] + py * ngt[2] == pytest.approx(
                tx[0], abs=1e-12
            )
            assert ngt[3] + px * ngt[4] + py * ngt[5] == pytest.approx(
                ty[0], abs=1e-12
            )
        # mercator -> geographic keeps axis alignment (lon=f(x), lat=f(y))
        assert ngt[2] == 0.0 and ngt[4] == 0.0
        # latitude is nonlinear in y: the center must show real residual
        assert r["err_geo"][0] > 1e-6
        assert r["err_px"][0] > 1e-4

    def test_error_matches_bruteforce(self):
        gt = np.array([[-5000000.0, 2000.0, 0.0, 6000000.0, 0.0, -2000.0]])
        r = move_georeference_arrays(
            gt, np.array([512.0]), np.array([512.0]), 3857, 4326
        )
        ngt = r["new_gt"][0]
        errs = []
        for px, py in [(0, 0), (0, 512), (512, 0), (512, 512), (256, 256)]:
            sx = gt[0, 0] + px * gt[0, 1]
            sy = gt[0, 3] + py * gt[0, 5]
            tx, ty = geo_transform_points(
                np.array([sx]), np.array([sy]), 3857, 4326
            )
            ex = ngt[0] + px * ngt[1] + py * ngt[2] - tx[0]
            ey = ngt[3] + px * ngt[4] + py * ngt[5] - ty[0]
            errs.append(max(abs(ex), abs(ey)))
        assert r["err_geo"][0] == pytest.approx(max(errs), rel=1e-9)


class TestDistributed:
    def test_matches_kernel_on_fixtures(self, spark):
        from gdal_spark import fixtures

        df = fixtures.images_df(spark, 8, tier="t2", partitions=4)
        out = {
            r.image_id: r
            for r in move_georeference(df, 4326).collect()
        }
        assert len(out) == 8
        for i in range(8):
            rec = fixtures.image_record(i, tier="t2")
            gt = np.array([[rec[f"gt{j}"] for j in range(6)]])
            r = move_georeference_arrays(
                gt, np.array([float(rec["w"])]), np.array([float(rec["h"])]),
                rec["srid"], 4326,
            )
            row = out[rec["image_id"]]
            for j in range(6):
                assert getattr(row, f"ngt{j}") == pytest.approx(
                    r["new_gt"][0, j], rel=1e-12
                ), (i, j)
            assert row.err_geo == pytest.approx(r["err_geo"][0], abs=1e-15)
            assert row.err_px == pytest.approx(r["err_px"][0], abs=1e-12)


class TestEditAndCreate:
    """gdal_edit.py / gdal_create analogs."""

    def test_edit_ullr(self, spark):
        from gdal_spark import fixtures
        from gdal_spark.operators.move import edit_georeference

        imgs = fixtures.images_df(spark, 2)
        out = edit_georeference(
            imgs, ullr=(0.0, 100.0, 200.0, 0.0), srid=4326
        ).select("image_id", "w", "h", "gt0", "gt1", "gt3", "gt5", "srid")
        for r in out.collect():
            assert r.gt0 == 0.0 and r.gt3 == 100.0 and r.srid == 4326
            assert abs(r.gt1 - 200.0 / r.w) < 1e-12
            assert abs(r.gt5 + 100.0 / r.h) < 1e-12

    def test_edit_gt_and_conflict(self, spark):
        import pytest

        from gdal_spark import fixtures
        from gdal_spark.operators.move import edit_georeference

        imgs = fixtures.images_df(spark, 1)
        r = edit_georeference(imgs, gt=(1, 2, 0, 3, 0, -2)).collect()[0]
        assert (r.gt0, r.gt1, r.gt5) == (1.0, 2.0, -2.0)
        with pytest.raises(ValueError):
            edit_georeference(imgs, gt=(0,) * 6, ullr=(0, 1, 1, 0))

    def test_create_images(self, spark):
        import numpy as np

        from gdal_spark import codecs
        from gdal_spark.operators.move import create_images

        df = create_images(
            spark, 3, 16, 8, bands=3, burn=(10, 20, 30),
            gt=(100.0, 2.0, 0.0, 50.0, 0.0, -2.0), srid=3857,
        )
        rows = sorted(df.collect(), key=lambda r: r.image_id)
        assert len(rows) == 3
        arr = codecs.decode_image(bytes(rows[0].bytes), rows[0].fmt)
        assert arr.shape == (8, 16, 3)
        assert np.all(arr[:, :, 0] == 10) and np.all(arr[:, :, 2] == 30)
        # vertical tiling: each image's gt3 drops by h * |gt5|
        assert rows[1].gt3 == 50.0 - 8 * 2.0 and rows[2].gt3 == 50.0 - 16 * 2.0

    def test_create_burn_mismatch(self, spark):
        import pytest

        from gdal_spark.operators.move import create_images

        with pytest.raises(ValueError):
            create_images(spark, 1, 4, 4, bands=2, burn=(1, 2, 3))
