"""Rasterize scanline-fill semantics + raster statistics operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import codecs, fixtures, geom
from gdal_spark.operators.rasterize import rasterize, rasterize_polygon_to_array
from gdal_spark.operators.stats import (
    checksum_images,
    pixel_calc_images,
    raster_histogram,
    raster_statistics,
    reclassify_array,
    reclassify_images,
)


class TestScanlineFill:
    def test_rectangle_fills_exact_pixels(self):
        # rect [2, 8) x [3, 7) in pixel space -> 6x4 pixels burned
        ring = np.array([[2.0, 3.0], [8.0, 3.0], [8.0, 7.0], [2.0, 7.0], [2.0, 3.0]])
        out = np.zeros((10, 10))
        rasterize_polygon_to_array([ring], 10, 10, 5.0, out, add=False)
        expected = np.zeros((10, 10))
        expected[3:7, 2:8] = 5.0
        np.testing.assert_array_equal(out, expected)

    def test_half_pixel_rounding(self):
        # edges at x=1.4 and x=6.6: floor(+0.5) -> [1, 7)
        ring = np.array([[1.4, 0.0], [6.6, 0.0], [6.6, 4.0], [1.4, 4.0], [1.4, 0.0]])
        out = np.zeros((4, 10))
        rasterize_polygon_to_array([ring], 4, 10, 1.0, out, add=False)
        assert (out[:, 1:7] == 1.0).all()
        assert (out[:, 0] == 0).all() and (out[:, 7:] == 0).all()

    def test_triangle_parity(self):
        ring = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [0.0, 0.0]])
        out = np.zeros((10, 10))
        rasterize_polygon_to_array([ring], 10, 10, 1.0, out, add=False)
        # span rule (llrasterize.cpp floor(+0.5)): row y spans
        # [0, 10-(y+0.5)) -> burned x in [0, floor(10-y-0.5+0.5)) = [0, 10-y)
        for y in range(10):
            for x in range(10):
                inside = x < 10 - y
                assert out[y, x] == (1.0 if inside else 0.0), (x, y)

    def test_hole_not_burned(self):
        outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])
        hole = np.array([[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0], [3.0, 3.0]])
        out = np.zeros((10, 10))
        rasterize_polygon_to_array([outer, hole], 10, 10, 1.0, out, add=False)
        assert out[5, 5] == 0.0 and out[1, 1] == 1.0

    def test_add_mode(self):
        ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
        out = np.zeros((4, 4))
        rasterize_polygon_to_array([ring], 4, 4, 2.0, out, add=True)
        rasterize_polygon_to_array([ring], 4, 4, 3.0, out, add=True)
        assert (out == 5.0).all()


class TestRasterizeDF:
    def test_distributed_rasterize_matches_local(self, spark):
        rng = np.random.default_rng(5)
        feats = []
        for fid in range(6):
            cx, cy = rng.uniform(100, 900, 2)
            r = rng.uniform(50, 200)
            ring = np.array(
                [
                    [cx - r, cy - r],
                    [cx + r, cy - r],
                    [cx + r, cy + r],
                    [cx - r, cy + r],
                    [cx - r, cy - r],
                ]
            )
            wkb = geom.wkb_polygon([ring])
            feats.append(
                (fid, bytearray(wkb), float(cx - r), float(cy - r), float(cx + r), float(cy + r), float(fid + 1))
            )
        fdf = spark.createDataFrame(
            feats, "fid long, wkb binary, minx double, miny double, maxx double, maxy double, burn double"
        )
        gt = (0.0, 1.0, 0.0, 1000.0, 0.0, -1.0)
        out = rasterize(spark, fdf, gt, 1000, 1000, burn_col="burn", tile_size=256)
        tiles = out.collect()
        assert len(tiles) == 16
        # reassemble and compare against a single local burn
        full = np.zeros((1000, 1000))
        for t in tiles:
            arr = np.frombuffer(bytes(t.data), dtype=np.float64).reshape(t.h, t.w)
            full[t.tile_y * 256 : t.tile_y * 256 + t.h, t.tile_x * 256 : t.tile_x * 256 + t.w] = arr
        local = np.zeros((1000, 1000))
        for fid, wkb, minx, miny, maxx, maxy, burn in feats:
            g = geom.parse_wkb(bytes(wkb))
            rings_px = [
                np.stack([(r[:, 0] - gt[0]) / gt[1], (r[:, 1] - gt[3]) / gt[5]], axis=1)
                for r in g.parts
            ]
            rasterize_polygon_to_array(rings_px, 1000, 1000, burn, local, add=False)
        np.testing.assert_array_equal(full, local)


@pytest.fixture(scope="module")
def images16(spark):
    df = fixtures.images_df(spark, 16, tier="t2", partitions=4).persist()
    df.count()
    yield df
    df.unpersist()


class TestStats:
    def test_statistics_match_numpy(self, spark, images16):
        out = {(r.image_id, r.band): r for r in raster_statistics(images16).collect()}
        for i in range(4):
            spec = fixtures.image_spec(i)
            arr = fixtures.pattern_array(spec)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            if spec["fmt"] == "jpg":
                continue  # lossy: exact stats don't apply
            for b in range(arr.shape[2]):
                r = out[(spec["image_id"], b)]
                band = arr[:, :, b].astype(float)
                assert r.min == band.min() and r.max == band.max()
                assert abs(r.mean - band.mean()) < 1e-9

    def test_histogram_counts_total(self, spark, images16):
        h = raster_histogram(images16, bins=8)
        tot = (
            h.groupBy("image_id", "band").agg(F.sum("count").alias("n")).collect()
        )
        sizes = {r.image_id: r for r in images16.select("image_id", "w", "h").collect()}
        for r in tot:
            s = sizes[r.image_id]
            assert r.n == s.w * s.h

    def test_checksums_deterministic(self, spark, images16):
        a = {(r.image_id, r.band): r.checksum for r in checksum_images(images16).collect()}
        b = {(r.image_id, r.band): r.checksum for r in checksum_images(images16).collect()}
        assert a == b and len(a) > 16  # multiband rows present

    def test_reclassify(self):
        arr = np.array([[0, 50], [150, 250]], dtype=np.uint8)
        out = reclassify_array(arr, [(0, 100, 1.0), (100, 200, 2.0)], default=9.0)
        np.testing.assert_array_equal(out, [[1, 1], [2, 9]])

    def test_reclassify_images_roundtrip(self, spark, images16):
        one = images16.where(F.col("image_id") == "img00000001")
        out = reclassify_images(one, [(0, 128, 0.0), (128, 256, 255.0)]).collect()[0]
        arr = codecs.decode_image(bytes(out.bytes), out.fmt)
        assert set(np.unique(arr)) <= {0, 255}

    def test_pixel_calc(self, spark, images16):
        one = images16.where(F.col("image_id") == "img00000001")
        out = pixel_calc_images(one, func="sqrt", scale=1.0).collect()[0]
        arr = codecs.decode_image(bytes(out.bytes), out.fmt)
        spec = fixtures.image_spec(1)
        src = fixtures.pattern_array(spec)
        expected = np.clip(np.round(np.sqrt(src.astype(float))), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(np.atleast_3d(arr)[:, :, 0], expected)


class TestAllTouched:
    def test_sliver_burns_diagonal(self):
        import numpy as np

        from gdal_spark.operators.rasterize import (
            rasterize_polygon_to_array,
            touched_cells,
        )

        ring = np.array(
            [[0.2, 0.2], [9.8, 9.6], [9.8, 9.8], [0.2, 0.4], [0.2, 0.2]]
        )
        center = np.zeros((10, 10))
        rasterize_polygon_to_array([ring], 10, 10, 1.0, center, False)
        touched = np.zeros((10, 10))
        rasterize_polygon_to_array([ring], 10, 10, 1.0, touched, False, all_touched=True)
        assert touched.sum() > center.sum()
        assert touched[0, 0] == 1 and touched[9, 9] == 1
        # all_touched is a superset of center-inside
        assert ((touched >= center)).all()

    def test_supercover_diagonal(self):
        import numpy as np

        from gdal_spark.operators.rasterize import touched_cells

        m = touched_cells([np.array([[0.5, 0.5], [3.5, 3.5], [0.5, 0.5]])], 4, 4)
        assert m[0, 0] and m[1, 1] and m[2, 2] and m[3, 3]


class TestNearblack:
    def test_mask_kernel(self):
        from gdal_spark.operators.stats import nearblack_mask

        img = np.full((8, 10, 3), 200, np.uint8)
        img[:, :2] = 3   # left collar
        img[0, :] = 5    # top row
        img[4, 5] = 0    # interior island must NOT join the collar
        m = nearblack_mask(img, near=15)
        assert m[:, :2].all() and m[0, :].all()
        assert not m[4, 5] and not m[3, 4]

    def test_max_nonblack_zero_straight_runs(self):
        """nMaxNonBlack=0: only straight near-black runs from the edges."""
        from gdal_spark.operators.stats import nearblack_mask

        img = np.full((8, 10, 3), 200, np.uint8)
        img[:, :2] = 3
        img[0, :] = 5
        m = nearblack_mask(img, near=15, max_nonblack=0)
        assert m[:, :2].all() and m[0, :].all()
        assert int(m.sum()) == 8 * 2 + 10 - 2  # no tolerance bleed

    def test_speckled_collar_collapses_with_default_tolerance(self):
        """A non-black speckle inside the collar is collapsed under the
        reference default nMaxNonBlack=2 (nearblack_lib.cpp:606) but kept
        by the 0-tolerance straight-run scan."""
        from gdal_spark.operators.stats import nearblack_collapse

        img = np.full((8, 10, 3), 200, np.uint8)
        img[:3, :] = 4           # 3-row top collar ...
        img[1, 4] = 200          # ... with a valid-data speckle inside it
        _, m0 = nearblack_collapse(img, near=15, max_nonblack=0)
        assert not m0[1, 4]
        rgb, m = nearblack_collapse(img, near=15)  # default = 2
        assert m[1, 4] and (rgb[1, 4] == 0).all()
        # columns whose FIRST line holds valid data are killed immediately
        # (nearblack_lib.cpp:611) -> bottom edge (valid everywhere) intact
        assert not m[7, :].any()

    def test_bent_collar_propagates_across_lines(self):
        """An L-shaped (stepped) collar: rows whose near-black run does not
        start at the scan edge still join via the per-column counter
        re-entry (nearblack_lib.cpp:735)."""
        from gdal_spark.operators.stats import nearblack_collapse

        img = np.full((8, 12, 3), 200, np.uint8)
        img[:, :2] = 3           # left collar spine
        img[3, 2:7] = 3          # bent arm reaching inward on row 3
        _, m = nearblack_collapse(img, near=15, max_nonblack=0)
        assert m[3, 2:7].all()   # arm joins through the spine
        assert not m[3, 8]

    def test_images_pipeline(self, spark):
        from gdal_spark import codecs
        from gdal_spark.operators.stats import nearblack_images

        img = np.full((16, 16, 3), 180, np.uint8)
        img[:, :3] = 2
        row = ("n1", bytearray(codecs.encode_png(img)), "png")
        df = spark.createDataFrame([row], "image_id string, bytes binary, fmt string")
        out = nearblack_images(df, max_nonblack=0).collect()
        assert len(out) == 1 and out[0]["n_collar"] == 16 * 3
        rgba = codecs.decode_png(bytes(out[0]["bytes"]))
        assert (rgba[:, :3, 3] == 0).all() and (rgba[:, 3:, 3] == 255).all()
        assert (rgba[:, :3, :3] == 0).all()

    def test_images_pipeline_default_tolerance(self, spark):
        """Default nMaxNonBlack=2 eats up to 2 valid pixels past the collar
        (reference CLI default) — 3 black columns mask as 5."""
        from gdal_spark import codecs
        from gdal_spark.operators.stats import nearblack_images

        img = np.full((16, 16, 3), 180, np.uint8)
        img[:, :3] = 2
        row = ("n1", bytearray(codecs.encode_png(img)), "png")
        df = spark.createDataFrame([row], "image_id string, bytes binary, fmt string")
        out = nearblack_images(df).collect()
        assert len(out) == 1 and out[0]["n_collar"] == 16 * 5


class TestGdalCalc:
    """gdal_calc analog (stats.calc_images) — reference:
    osgeo_utils/gdal_calc.py letter-bound numpy expressions."""

    def test_expression_safety(self):
        import pytest as _pytest

        from gdal_spark.operators.stats import compile_calc

        for bad in (
            "__import__('os').system('x')",
            "A.tobytes()",
            "[x for x in A]",
            "lambda: 1",
            "open('/etc/passwd')",
        ):
            with _pytest.raises(ValueError):
                compile_calc(bad, ["A"])

    def test_two_raster_calc_matches_local(self, spark):
        import numpy as np
        import pandas as pd

        from gdal_spark import codecs, fixtures
        from gdal_spark.checksum import gdal_checksum
        from gdal_spark.operators.stats import calc_images, compile_calc

        a_df = fixtures.images_df(spark, 4, tier="t2", partitions=2)

        def invert(it):
            for pdf in it:
                rows = []
                for r in pdf.itertuples(index=False):
                    arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                    rows.append(
                        {"image_id": r.image_id,
                         "bytes": codecs.encode_png(
                             (255 - np.asarray(arr)).astype(np.uint8)),
                         "fmt": "png"}
                    )
                yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

        b_df = a_df.select("image_id", "bytes", "fmt").mapInPandas(
            invert, schema="image_id string, bytes binary, fmt string"
        )
        expr = "where(A > 128, A, (A + B) / 2.0)"
        got = {
            r.image_id: r
            for r in calc_images({"A": a_df, "B": b_df}, expr).collect()
        }
        fn = compile_calc(expr, ["A", "B"])
        assert len(got) == 4
        for i in range(4):
            rec = fixtures.image_record(i, tier="t2")
            a = codecs.decode_image(rec["bytes"], rec["fmt"]).astype(np.float64)
            b = (255.0 - a)
            out = np.clip(np.round(fn({"A": a, "B": b})), 0, 255).astype(
                np.uint8
            )
            band = out if out.ndim == 2 else out[:, :, 0]
            r = got[rec["image_id"]]
            assert r.checksum == gdal_checksum(band), i
            np.testing.assert_array_equal(
                codecs.decode_image(bytes(r.bytes), "png"), out
            )


class TestReclassifyRange:
    def test_raw_sink_preserves_out_of_range_codes(self, spark, images16):
        import numpy as np

        from gdal_spark import codecs as C

        one = images16.limit(1)
        out = reclassify_images(
            one, [(0, 128, -9999.0), (128, 256, 70000.0)]
        ).collect()[0]
        arr = C.decode_image(bytes(out.bytes), "raw")
        vals = set(np.unique(arr).tolist())
        assert vals <= {-9999.0, 70000.0} and len(vals) >= 1


class TestEnhance:
    """gdalenhance analog: histogram equalization + percentile stretch."""

    def test_equalize_flattens_histogram(self):
        import numpy as np

        from gdal_spark.operators.stats import enhance_array

        rng = np.random.default_rng(8)
        # skewed band: most values in a narrow dark range
        band = np.clip(rng.normal(40, 12, size=(128, 128)), 0, 255).astype(np.uint8)
        out = enhance_array(band, "equalize")
        assert out.min() == 0 and out.max() >= 250
        # rank preserving: sort order of distinct values kept
        vals = np.unique(band)
        mapped = [int(out[band == v][0]) for v in vals]
        assert mapped == sorted(mapped)
        # equalization linearizes the CDF (discrete bins relocate, they
        # can't split — so test cdf(u) ~ u/255 at occupied levels, not a
        # per-bin uniformity statistic)
        h = np.bincount(out.ravel(), minlength=256).astype(float)
        cdf = np.cumsum(h) / h.sum()
        occ = np.nonzero(h)[0]
        assert float(np.max(np.abs(cdf[occ] - occ / 255.0))) < 0.05
        # while the input CDF is strongly non-linear
        hb = np.bincount(band.ravel(), minlength=256).astype(float)
        cdfb = np.cumsum(hb) / hb.sum()
        occb = np.nonzero(hb)[0]
        assert float(np.max(np.abs(cdfb[occb] - occb / 255.0))) > 0.3

    def test_equalize_constant_identity(self):
        import numpy as np

        from gdal_spark.operators.stats import enhance_array

        band = np.full((10, 10), 77, dtype=np.uint8)
        assert np.array_equal(enhance_array(band, "equalize"), band)

    def test_stretch_maps_percentiles(self):
        import numpy as np

        from gdal_spark.operators.stats import enhance_array

        band = np.linspace(50, 150, 10000).reshape(100, 100).astype(np.uint8)
        out = enhance_array(band, "stretch", low_pct=2.0, high_pct=98.0)
        assert out.min() == 0 and out.max() == 255
        lo = np.percentile(band, 2.0)
        hi = np.percentile(band, 98.0)
        mid_in = band[50, 50]
        exp = np.clip(round((mid_in - lo) * 255.0 / (hi - lo)), 0, 255)
        assert abs(int(out[50, 50]) - exp) <= 1

    def test_multiband_independent(self):
        import numpy as np

        from gdal_spark.operators.stats import enhance_array

        rng = np.random.default_rng(9)
        img = np.stack(
            [
                np.clip(rng.normal(40, 10, (32, 32)), 0, 255),
                np.clip(rng.normal(200, 10, (32, 32)), 0, 255),
                np.full((32, 32), 7.0),
            ],
            axis=2,
        ).astype(np.uint8)
        out = enhance_array(img, "equalize")
        assert out.shape == img.shape
        assert out[:, :, 0].min() == 0
        assert np.array_equal(out[:, :, 2], img[:, :, 2])  # constant band identity

    def test_images_operator(self, spark):
        import numpy as np

        from gdal_spark import fixtures
        from gdal_spark.operators.stats import enhance_images

        imgs = fixtures.images_df(spark, 4)
        rows = enhance_images(imgs, "equalize").collect()
        assert len(rows) == 4
        assert all(r.checksum >= 0 for r in rows)

    def test_bad_mode(self):
        import numpy as np
        import pytest

        from gdal_spark.operators.stats import enhance_array

        with pytest.raises(ValueError):
            enhance_array(np.zeros((4, 4), dtype=np.uint8), "gamma")

    def test_wide_dtype_clamped_not_wrapped(self):
        import numpy as np

        from gdal_spark.operators.stats import enhance_array

        band = np.array([[0, 300], [512, 70000]], dtype=np.uint16)
        out = enhance_array(band, "stretch", low_pct=0.0, high_pct=100.0)
        # 300/512/70000 clamp to 255 (identical after clamp), never wrap
        # to 44/0/123
        assert out[0, 1] == out[1, 0] == out[1, 1]
        assert out[0, 0] < out[0, 1]


class TestRasterInfo:
    """gdalinfo analog: one summary row per image."""

    def test_matches_pattern(self, spark, images16):
        import numpy as np

        from gdal_spark import fixtures
        from gdal_spark.operators.stats import raster_info

        out = {r.image_id: r for r in raster_info(images16).collect()}
        assert len(out) == 16
        for i in range(4):
            spec = fixtures.image_spec(i)
            r = out[spec["image_id"]]
            assert (r.w, r.h) == (spec["w"], spec["h"])
            assert r.srid == spec["srid"]
            gt = spec["gt"]
            assert r.ulx == gt[0] and r.uly == gt[3]
            assert r.lrx == gt[0] + spec["w"] * gt[1]
            assert r.lry == gt[3] + spec["h"] * gt[5]
            if spec["fmt"] == "jpg":
                continue
            arr = np.atleast_3d(fixtures.pattern_array(spec)).astype(float)
            assert r.n_bands == arr.shape[2]
            for b in range(arr.shape[2]):
                assert r.band_min[b] == arr[:, :, b].min()
                assert r.band_max[b] == arr[:, :, b].max()
                assert abs(r.band_mean[b] - arr[:, :, b].mean()) < 1e-9
