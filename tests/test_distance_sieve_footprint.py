"""Proximity / FillNodata / Sieve / data-driven Footprint vs closed-form
oracles + distributed parity.

References: alg/gdalproximity.cpp, alg/rasterfill.cpp,
alg/gdalsievefilter.cpp, apps/gdal_footprint_lib.cpp.
"""

import numpy as np
import pytest

from gdal_spark.geom import polygon_area_centroid
from gdal_spark.operators.distance import (
    edt,
    fillnodata_array,
    proximity_array,
    proximity_tiles,
)
from gdal_spark.operators.footprint import footprint_array, footprint_images
from gdal_spark.operators.sieve import sieve_array


class TestEDT:
    def test_single_target(self):
        m = np.zeros((6, 6), bool)
        m[2, 3] = True
        d = edt(m)
        assert d[2, 3] == 0
        assert d[0, 0] == pytest.approx(np.hypot(2, 3))
        assert d[5, 5] == pytest.approx(np.hypot(3, 2))

    def test_matches_bruteforce(self):
        rng = np.random.default_rng(5)
        m = rng.random((24, 30)) < 0.05
        m[3, 4] = True  # ensure non-empty
        d = edt(m)
        ys, xs = np.nonzero(m)
        gy, gx = np.mgrid[0:24, 0:30]
        brute = np.sqrt(
            ((gy[..., None] - ys) ** 2 + (gx[..., None] - xs) ** 2).min(axis=-1)
        )
        np.testing.assert_allclose(d, brute, atol=1e-9)


class TestProximity:
    def test_maxdist_and_nodata(self):
        a = np.zeros((8, 8))
        a[4, 4] = 1
        p = proximity_array(a, (1.0,), max_distance=3.0, nodata=-1.0)
        assert p[4, 4] == 0
        assert p[4, 6] == pytest.approx(2.0)
        assert p[0, 0] == -1.0

    def test_distributed_matches_local(self, spark):
        rng = np.random.default_rng(9)
        arr = np.zeros((64, 64))
        pts = rng.integers(0, 64, size=(6, 2))
        for y, x in pts:
            arr[y, x] = 1.0
        # tiled 16px layout
        rows = []
        for ty in range(4):
            for tx in range(4):
                sub = arr[ty * 16 : ty * 16 + 16, tx * 16 : tx * 16 + 16]
                rows.append((tx, ty, 16, 16, bytearray(sub.tobytes())))
        tiles = spark.createDataFrame(
            rows, "tile_x int, tile_y int, w int, h int, data binary"
        )
        out = proximity_tiles(
            tiles, max_distance=10.0, target_values=(1.0,), tile_size=16
        ).collect()
        local = proximity_array(arr, (1.0,), max_distance=10.0, nodata=-1.0)
        got = np.zeros((64, 64))
        for t in out:
            sub = np.frombuffer(bytes(t.data), dtype=np.float64).reshape(t.h, t.w)
            got[t.tile_y * 16 : t.tile_y * 16 + 16, t.tile_x * 16 : t.tile_x * 16 + 16] = sub
        np.testing.assert_allclose(got, local, atol=1e-9)


class TestFillNodata:
    def test_constant_plateau(self):
        f = np.full((10, 10), 7.0)
        f[4:6, 4:6] = 0.0
        out = fillnodata_array(f, nodata=0.0, max_search_dist=5.0)
        np.testing.assert_allclose(out, 7.0)

    def test_beyond_maxdist_stays_nodata(self):
        f = np.zeros((20, 20))
        f[0, 0] = 3.0
        out = fillnodata_array(f, nodata=0.0, max_search_dist=2.0)
        assert out[0, 1] != 0.0
        assert out[10, 10] == 0.0

    def test_gradient_edges_exact(self):
        # hole pixel adjacent to valid data takes its neighbours' mean
        f = np.full((6, 6), 4.0)
        f[2, 2] = 0.0
        out = fillnodata_array(f, nodata=0.0, max_search_dist=3.0)
        assert out[2, 2] == pytest.approx(4.0)


class TestSieve:
    def test_speck_removed(self):
        s = np.full((8, 8), 5, dtype=np.int64)
        s[3, 3] = 9
        assert (sieve_array(s, threshold=2) == 5).all()

    def test_large_regions_untouched(self):
        s2 = np.zeros((8, 8), dtype=np.int64)
        s2[:, :4] = 1
        s2[:, 4:] = 2
        assert np.array_equal(sieve_array(s2, threshold=4), s2)

    def test_merges_into_largest_neighbor(self):
        s3 = np.zeros((6, 9), dtype=np.int64)
        s3[:, :4] = 1
        s3[:, 5:] = 2
        s3[:, 4] = 3
        s3[2, 4] = 7
        out3 = sieve_array(s3, threshold=2)
        # the 1-px speck's largest neighbours are the 24-px fields
        # (size tie breaks to the lower label -> region of value 1)
        assert out3[2, 4] == 1
        assert (out3[np.where(s3 != 7)] == s3[np.where(s3 != 7)]).all()

    def test_cascade_until_stable(self):
        # two specks forming a pair below threshold merge away fully
        s = np.full((6, 6), 1, dtype=np.int64)
        s[2, 2] = 8
        s[2, 3] = 9
        out = sieve_array(s, threshold=3)
        assert (out == 1).all()


class TestFootprint:
    def test_alpha_mask_footprint(self):
        arr = np.zeros((8, 8, 4), dtype=np.uint8)
        arr[2:6, 2:6, 3] = 255
        gt = (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
        polys, n, vf = footprint_array(arr, arr[:, :, 3], gt)
        area, _ = polygon_area_centroid(polys)
        assert n == 1
        assert area == pytest.approx(16.0)
        assert vf == pytest.approx(16 / 64)

    def test_nodata_footprint_with_collar(self):
        # typical imagery collar: zeros around data
        band = np.zeros((10, 10))
        band[3:8, 2:9] = 77.0
        gt = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)
        polys, n, _ = footprint_array(band[:, :, None], None, gt, nodata=0.0)
        area, _ = polygon_area_centroid(polys)
        assert n == 1
        assert area == pytest.approx(5 * 7 * 4.0)

    def test_footprint_images_df(self, spark):
        from gdal_spark import fixtures

        imgs = fixtures.images_df(spark, 4, tier="t2", partitions=2)
        out = footprint_images(imgs).collect()
        assert len(out) >= 1
        for r in out:
            assert r.area > 0 and 0 < r.valid_frac <= 1.0
            assert r.minx < r.maxx and r.miny < r.maxy
