"""Contour (marching squares) vs closed-form + distributed parity.

Reference: alg/contour.cpp + alg/marching_squares (GDALContourGenerate).
"""

import numpy as np
import pytest

from gdal_spark.operators.contour import (
    cell_segments,
    chain_polylines,
    contour_array,
    contour_levels,
    contour_tiles,
)

GT = (0.0, 1.0, 0.0, 100.0, 0.0, -1.0)


class TestLocalContour:
    def test_linear_ramp_vertical_line(self):
        # band = x index: contour at 2.5 is the vertical node line x=2.5
        band = np.tile(np.arange(8, dtype=float), (6, 1))
        out = contour_array(band, GT, [2.5])
        assert len(out) == 1
        lv, line = out[0]
        assert lv == 2.5
        # geo x = 2.5 + 0.5 = 3.0 everywhere on the line
        assert np.allclose(line[:, 0], 3.0)
        assert len(line) >= 6

    def test_cone_closed_ring(self):
        yy, xx = np.mgrid[0:20, 0:20]
        band = -np.hypot(yy - 10, xx - 10)
        out = contour_array(band, GT, [-5.0])
        closed = [l for _lv, l in out if np.array_equal(l[0], l[-1])]
        assert len(closed) == 1
        ring = closed[0]
        # radius ~5 around center (10.5, 100-10.5)
        r = np.hypot(ring[:, 0] - 10.5, ring[:, 1] - (100 - 10.5))
        assert abs(r.mean() - 5.0) < 0.3

    def test_levels_helper(self):
        assert contour_levels(0.0, 10.0, -25.0, 35.0) == [-20.0, -10.0, 0.0, 10.0, 20.0, 30.0]

    def test_interpolation_position(self):
        band = np.array([[0.0, 10.0], [0.0, 10.0]])
        segs = cell_segments(band, 2.5)
        assert len(segs) == 1
        (x0, y0, x1, y1) = segs[0]
        assert x0 == pytest.approx(0.25) and x1 == pytest.approx(0.25)

    def test_chaining_merges_across_cells(self):
        band = np.tile(np.arange(6, dtype=float), (4, 1))
        segs = cell_segments(band, 2.5)
        lines = chain_polylines(segs)
        assert len(lines) == 1  # one continuous polyline


class TestDistributedContour:
    def _tiles(self, spark, arr, ts):
        rows = []
        h, w = arr.shape
        for ty in range(0, h, ts):
            for tx in range(0, w, ts):
                sub = arr[ty : ty + ts, tx : tx + ts]
                rows.append(
                    (tx // ts, ty // ts, sub.shape[1], sub.shape[0],
                     bytearray(sub.astype(np.float64).tobytes()))
                )
        return spark.createDataFrame(
            rows, "tile_x int, tile_y int, w int, h int, data binary"
        )

    def test_matches_local(self, spark):
        yy, xx = np.mgrid[0:64, 0:64]
        band = np.sin(xx / 7.0) * 10 + np.cos(yy / 9.0) * 8
        levels = [-5.0, 0.0, 5.0]
        tiles = self._tiles(spark, band, 16)
        out = contour_tiles(tiles, GT, levels, tile_size=16).collect()
        local = contour_array(band, GT, levels)
        # same total contour length per level (chaining may split
        # differently at junctions; length is the invariant)
        def tot_len(pairs):
            acc = {}
            for lv, line in pairs:
                L = float(np.hypot(*(np.diff(line, axis=0).T)).sum())
                acc[lv] = acc.get(lv, 0.0) + L
            return acc

        got = {}
        for r in out:
            got[r.level] = got.get(r.level, 0.0) + r.length
        want = tot_len(local)
        assert set(got) == set(want)
        for lv in want:
            assert got[lv] == pytest.approx(want[lv], rel=1e-9)

    def test_level_spanning_64_tiles_no_single_task_group(self, spark):
        """One iso-line crossing a 64x1 tile strip: chaining happens per
        (tile, level) — 64 partial chains, not one level-wide task — and
        the border merge reassembles them into ONE exact line (VERDICT r3
        weak #1)."""
        from gdal_spark.operators.contour import merge_chains

        w = 64 * 8
        yy, xx = np.mgrid[0:8, 0:w]
        band = (yy + 0.25 * np.sin(xx / 5.0)).astype(np.float64)
        tiles = self._tiles(spark, band, 8)  # 64 tiles in a row
        assert tiles.count() == 64
        out = contour_tiles(tiles, GT, [3.5], tile_size=8).collect()
        local = contour_array(band, GT, [3.5])
        want = sum(
            float(np.hypot(*(np.diff(line, axis=0).T)).sum())
            for _lv, line in local
        )
        # the wavy line spans the full strip -> the distributed version
        # must merge >= 64 per-tile partial chains back into one line
        assert len(out) == len(local) == 1
        assert out[0].length == pytest.approx(want, rel=1e-12)
        assert out[0].n_points == len(local[0][1])
        assert merge_chains([local[0][1]])[0].shape == local[0][1].shape

    def test_distributed_cc_path_matches_driver_path(self, spark):
        """driver_cc_max_edges=0 forces the cc_labels border merge; output
        must match the driver union-find fast path exactly."""
        yy, xx = np.mgrid[0:32, 0:32]
        band = np.sin(xx / 7.0) * 10 + np.cos(yy / 9.0) * 8
        tiles = self._tiles(spark, band, 8)
        fast = contour_tiles(tiles, GT, [0.0], tile_size=8).collect()
        dist = contour_tiles(
            tiles, GT, [0.0], tile_size=8, driver_cc_max_edges=0
        ).collect()
        key = lambda r: (r.level, r.n_points, r.closed, round(r.length, 9))
        assert sorted(map(key, fast)) == sorted(map(key, dist))

    def test_closed_ring_across_tiles(self, spark):
        yy, xx = np.mgrid[0:32, 0:32]
        band = -np.hypot(yy - 16, xx - 16)
        tiles = self._tiles(spark, band, 16)
        out = contour_tiles(tiles, GT, [-6.0], tile_size=16).collect()
        closed = [r for r in out if r.closed]
        assert len(closed) == 1


class TestContourPolygons:
    """gdal_contour -p analog: level-band polygons via classify +
    polygonize composition."""

    GT = (0.0, 1.0, 0.0, 64.0, 0.0, -1.0)
    LEVELS = (-5.0, 0.0, 5.0)

    @staticmethod
    def _band():
        yy, xx = np.mgrid[0:64, 0:64]
        return np.sin(xx / 7.0) * 10.0 + np.cos(yy / 9.0) * 8.0

    def test_kernel_partitions_the_raster(self):
        from gdal_spark.operators.contour import (
            classify_levels,
            contour_polygons_array,
        )

        band = self._band()
        regions = contour_polygons_array(band, self.GT, self.LEVELS)
        cls = classify_levels(band, self.LEVELS)
        # pixel counts per level band match digitize exactly
        got = {}
        for k, lo, hi, n_px, _polys in regions:
            got[k] = got.get(k, 0) + n_px
            # bounds bracket the band's actual values
            vals = band[cls == k]
            assert vals.min() >= lo and vals.max() < hi
        want = {int(k): int((cls == k).sum()) for k in np.unique(cls)}
        assert got == want
        # areas tile the raster: pixel-aligned regions, cell area 1
        total_area = sum(
            abs(__import__("gdal_spark.geom", fromlist=["x"])
                .polygon_area_centroid(p)[0])
            for *_x, p in regions
        )
        assert total_area == pytest.approx(64 * 64, rel=1e-12)

    def test_distributed_matches_local(self, spark):
        from gdal_spark.operators.contour import (
            contour_polygons_array,
            contour_polygons_tiles,
        )

        band = self._band()
        rows = []
        for ty in range(4):
            for tx in range(4):
                sub = band[ty * 16: ty * 16 + 16, tx * 16: tx * 16 + 16]
                rows.append((tx, ty, 16, 16,
                             bytearray(sub.astype(np.float64).tobytes())))
        tiles = spark.createDataFrame(
            rows, "tile_x int, tile_y int, w int, h int, data binary"
        )
        out = contour_polygons_tiles(
            tiles, self.GT, self.LEVELS, tile_size=16,
            driver_cc_max_edges=0,  # force the distributed CC path
        ).collect()
        got = {}
        for r in out:
            k = got.setdefault(r.band, [0, 0, 0.0])
            k[0] += 1
            k[1] += r.n_pixels
            k[2] += r.area
            assert np.isinf(r.lo) or r.lo in self.LEVELS
            assert np.isinf(r.hi) or r.hi in self.LEVELS
        want = {}
        for k, lo, hi, n_px, polys in contour_polygons_array(
            band, self.GT, self.LEVELS
        ):
            e = want.setdefault(k, [0, 0, 0.0])
            e[0] += 1
            e[1] += n_px
            from gdal_spark.geom import polygon_area_centroid

            e[2] += abs(polygon_area_centroid(polys)[0])
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0], f"region count band {k}"
            assert got[k][1] == want[k][1], f"pixel count band {k}"
            assert got[k][2] == pytest.approx(want[k][2], rel=1e-12)


class TestReviewRegressions:
    GT = (0.0, 1.0, 0.0, 64.0, 0.0, -1.0)

    def test_nan_nodata_cells_skipped(self):
        from gdal_spark.operators.contour import cell_segments

        band = np.array([[np.nan, 10.0], [10.0, 10.0]])
        assert cell_segments(band, 5.0) == []
        # a clean cell elsewhere still contours
        band2 = np.array(
            [[np.nan, 10.0, 10.0], [0.0, 0.0, 10.0], [0.0, 0.0, 10.0]]
        )
        segs = cell_segments(band2, 5.0)
        assert segs and all(np.isfinite(np.array(segs)).all() for _ in [0])

    def test_classify_levels_nan_is_band0(self):
        from gdal_spark.operators.contour import classify_levels

        cls = classify_levels(
            np.array([[np.nan, 0.5], [1.5, 2.5]]), [1.0, 2.0]
        )
        assert cls[0, 0] == 0.0 and cls[1, 1] == 3.0

    def test_polygons_exclude_nan(self):
        from gdal_spark.operators.contour import contour_polygons_array

        band = np.full((8, 8), 10.0)
        band[:2, :2] = np.nan
        regions = contour_polygons_array(
            band, self.GT, (-5.0, 0.0, 5.0)
        )
        # NaN block is excluded: pixel counts cover only finite pixels
        assert sum(n for *_a, n, _p in [(r[0], r[1], r[2], r[3], r[4])
                                        for r in regions]) == 64 - 4

    def test_sparse_layout_missing_diagonal_drops_corner_only(self, spark):
        """Tiles right+bottom present but diagonal absent: only the ONE
        corner cell may be missing, not the whole shared edge."""
        from gdal_spark.operators.contour import contour_tiles

        yy, xx = np.mgrid[0:32, 0:32]
        band = (xx + yy).astype(np.float64)
        rows = []
        for ty in range(2):
            for tx in range(2):
                if (tx, ty) == (1, 1):
                    continue  # diagonal neighbor of (0,0) missing
                sub = band[ty*16:ty*16+16, tx*16:tx*16+16]
                rows.append((tx, ty, 16, 16,
                             bytearray(sub.astype(np.float64).tobytes())))
        tiles = spark.createDataFrame(
            rows, "tile_x int, tile_y int, w int, h int, data binary"
        )
        out = contour_tiles(tiles, self.GT, [20.0], tile_size=16).collect()
        # expected: the full-raster contour minus cells inside the
        # missing tile AND minus the single corner cell (15,15)
        total = sum(r.length for r in out)
        from gdal_spark.operators.contour import cell_segments
        ref = band.copy()
        ref[16:, 16:] = np.nan  # missing tile
        segs = cell_segments(ref, 20.0)
        # corner cell (15,15) has all four corners finite in ref but its
        # br corner comes from the missing diagonal in the tiled run
        want = 0.0
        for x0, y0, x1, y1 in segs:
            if max(x0, x1) > 15.0 and max(y0, y1) > 15.0 and \
               min(x0, x1) >= 15.0 and min(y0, y1) >= 15.0:
                continue  # the one corner cell
            want += float(np.hypot(x1 - x0, y1 - y0))
        assert total == pytest.approx(want, rel=1e-12)


class TestExponentialLevels:
    """gdal_contour -e level generation."""

    def test_powers_within_range(self):
        from gdal_spark.operators.contour import contour_levels_exp

        assert contour_levels_exp(2.0, 3.0, 40.0) == [4.0, 8.0, 16.0, 32.0]
        assert contour_levels_exp(10.0, 1.0, 1000.0) == [1.0, 10.0, 100.0, 1000.0]

    def test_negative_range_empty_and_bad_base(self):
        import pytest

        from gdal_spark.operators.contour import contour_levels_exp

        assert contour_levels_exp(2.0, -5.0, -1.0) == []
        with pytest.raises(ValueError):
            contour_levels_exp(1.0, 0.0, 10.0)

    def test_exp_levels_feed_contour(self):
        import numpy as np

        from gdal_spark.operators.contour import contour_array, contour_levels_exp

        y, x = np.mgrid[0:20, 0:20]
        band = (x + y).astype(float)  # values 0..38
        levels = contour_levels_exp(2.0, float(band.min() + 1), float(band.max()))
        segs = contour_array(band, (0.0, 1.0, 0.0, 20.0, 0.0, -1.0), levels)
        got_levels = {lv for lv, _pts in segs} if isinstance(segs, list) else None
        # 2^0 = 1.0 sits exactly at vmin and is included
        assert levels == [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]
