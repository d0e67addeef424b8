"""gdal_retile analog (operators/retile.py) — reference:
swig/python/gdal-utils/osgeo_utils/gdal_retile.py tile_info /
createTile / buildPyramid semantics."""

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.operators.retile import (
    retile_array,
    retile_counts,
    retile_images,
)


class TestCounts:
    @pytest.mark.parametrize(
        "xs,ys,tw,th,ov,want",
        [
            (512, 512, 256, 256, 0, (2, 2)),
            (513, 512, 256, 256, 0, (3, 2)),
            (256, 256, 256, 256, 0, (1, 1)),
            (255, 100, 256, 256, 0, (1, 1)),
            (512, 512, 256, 256, 16, (3, 3)),  # step 240: 0,240,480
            (1000, 10, 300, 300, 50, (4, 1)),
        ],
    )
    def test_formula(self, xs, ys, tw, th, ov, want):
        assert retile_counts(xs, ys, tw, th, ov) == want

    def test_matches_reference_loop(self):
        # brute-force: count offsets the reference loop would visit
        for xs in (1, 100, 256, 257, 511, 512, 513, 1000):
            for ov in (0, 16):
                cx, _ = retile_counts(xs, 10, 256, 256, ov)
                step = 256 - ov
                # every tile must contain >=1 new pixel; last tile covers end
                offs = [(i - 1) * step for i in range(1, cx + 1)]
                assert all(o < xs for o in offs)
                assert offs[-1] + 256 >= xs
                if cx > 1:
                    assert offs[-2] + 256 < xs or offs[-2] + 256 >= xs - step


class TestKernel:
    GT = (1000.0, 10.0, 0.0, 2000.0, 0.0, -10.0)

    def _arr(self, h=100, w=130, c=3):
        rng = np.random.default_rng(7)
        return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)

    def test_tiles_partition_without_overlap(self):
        arr = self._arr()
        tiles = retile_array(arr, self.GT, 64, 64)
        assert {(t["tx"], t["ty"]) for t in tiles} == {
            (x, y) for x in (1, 2, 3) for y in (1, 2)
        }
        # reassemble exactly
        out = np.zeros_like(arr)
        for t in tiles:
            ox, oy = (t["tx"] - 1) * 64, (t["ty"] - 1) * 64
            out[oy:oy + t["h"], ox:ox + t["w"]] = t["data"]
        np.testing.assert_array_equal(out, arr)
        # edge tiles clipped, not padded
        assert max(t["w"] for t in tiles if t["tx"] == 3) == 130 - 128
        assert max(t["h"] for t in tiles if t["ty"] == 2) == 100 - 64

    def test_georef_per_tile(self):
        arr = self._arr()
        for t in retile_array(arr, self.GT, 64, 64):
            ox, oy = (t["tx"] - 1) * 64, (t["ty"] - 1) * 64
            assert t["gt0"] == self.GT[0] + ox * self.GT[1]
            assert t["gt3"] == self.GT[3] + oy * self.GT[5]

    def test_overlap_shares_pixels(self):
        arr = self._arr(h=64, w=100, c=1)[:, :, 0]
        tiles = retile_array(arr, self.GT, 64, 64, overlap=16)
        t1 = next(t for t in tiles if t["tx"] == 1)
        t2 = next(t for t in tiles if t["tx"] == 2)
        # tile 2 starts at 64-16=48; columns 48..63 shared
        np.testing.assert_array_equal(
            t1["data"][:, 48:], t2["data"][:, : 64 - 48]
        )

    def test_pyramid_levels(self):
        arr = self._arr(h=128, w=128)
        tiles = retile_array(arr, self.GT, 64, 64, levels=2)
        by_level = {}
        for t in tiles:
            by_level.setdefault(t["level"], []).append(t)
        assert set(by_level) == {0, 1, 2}
        assert len(by_level[0]) == 4 and len(by_level[1]) == 1
        l1 = by_level[1][0]
        assert (l1["w"], l1["h"]) == (64, 64)
        # level gt doubles the pixel size, same origin
        assert l1["gt1"] == self.GT[1] * 2 and l1["gt0"] == self.GT[0]
        l2 = by_level[2][0]
        assert (l2["w"], l2["h"]) == (32, 32) and l2["gt1"] == self.GT[1] * 4

    def test_checksum_is_band0_gold(self):
        arr = self._arr(h=64, w=64)
        (t,) = retile_array(arr, self.GT, 64, 64)
        assert t["checksum"] == gdal_checksum(arr[:, :, 0])


class TestDistributed:
    def test_matches_kernel_on_fixtures(self, spark):
        from gdal_spark import fixtures

        df = fixtures.images_df(spark, 6, tier="t2", partitions=3)
        got = {}
        for r in retile_images(df, 48, 48, overlap=8, levels=1).collect():
            got[(r.image_id, r.level, r.tx, r.ty)] = r
        want = {}
        for i in range(6):
            rec = fixtures.image_record(i, tier="t2")
            arr = codecs.decode_image(rec["bytes"], rec["fmt"])
            gt = tuple(rec[f"gt{j}"] for j in range(6))
            for t in retile_array(arr, gt, 48, 48, overlap=8, levels=1):
                want[(rec["image_id"], t["level"], t["tx"], t["ty"])] = t
        assert set(got) == set(want)
        for k, w in want.items():
            r = got[k]
            assert (r.w, r.h) == (w["w"], w["h"]), k
            assert r.checksum == w["checksum"], k
            assert r.gt0 == pytest.approx(w["gt0"], rel=1e-15), k
            # png round-trips exactly
            np.testing.assert_array_equal(
                codecs.decode_image(bytes(r.data), "png"), w["data"]
            )


class TestReviewRegressions:
    GT = (0.0, 1.0, 0.0, 100.0, 0.0, -1.0)

    def test_overlap_ge_tile_raises(self):
        with pytest.raises(ValueError):
            retile_counts(512, 512, 256, 256, overlap=256)
        with pytest.raises(ValueError):
            retile_array(np.zeros((64, 64), np.uint8), self.GT, 32, 32,
                         overlap=40)

    def test_pyramid_preserves_uint16(self):
        arr = (np.arange(64 * 64, dtype=np.uint16) * 17 % 60000).reshape(
            64, 64
        )
        tiles = retile_array(arr, self.GT, 64, 64, levels=1)
        l1 = next(t for t in tiles if t["level"] == 1)
        assert l1["data"].dtype == np.uint16
        assert l1["data"].max() > 255  # no uint8 squash

    def test_pyramid_preserves_float(self):
        arr = np.linspace(0.0, 9000.0, 32 * 32).reshape(32, 32)
        tiles = retile_array(arr, self.GT, 32, 32, levels=1)
        l1 = next(t for t in tiles if t["level"] == 1)
        assert l1["data"].dtype == np.float64
        assert l1["data"].max() > 255.0
