"""gdalcompare analog (operators/compare.py) — reference:
swig/python/gdal-utils/osgeo_utils/gdalcompare.py compare_band /
compare_image_pixels semantics."""

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.operators.compare import compare_arrays, compare_images


def _img(seed: int, h: int = 32, w: int = 32, bands: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, bands), dtype=np.uint8)


class TestKernel:
    def test_identical(self):
        a = _img(1)
        rows = compare_arrays(a, a.copy())
        assert len(rows) == 3
        for r in rows:
            assert r["size_match"] and r["checksum_match"]
            assert r["diff_count"] == 0 and r["max_diff"] == 0.0
            assert r["found_diff"] == 0
            assert np.isinf(r["psnr"])
            assert r["checksum_golden"] == gdal_checksum(a[:, :, r["band"] - 1])

    def test_perturbed_counts_exact(self):
        a = _img(2)
        b = a.copy()
        b[4:8, 4:8, 1] ^= 0x10  # 16 pixels on band 2 only
        rows = compare_arrays(a, b)
        by_band = {r["band"]: r for r in rows}
        assert by_band[1]["found_diff"] == 0 and by_band[3]["found_diff"] == 0
        r2 = by_band[2]
        assert not r2["checksum_match"]
        assert r2["diff_count"] == 16
        assert r2["max_diff"] == 16.0
        assert r2["found_diff"] == 1

    def test_band_count_mismatch(self):
        a, b = _img(3, bands=3), _img(3, bands=2)
        rows = compare_arrays(a, b[:, :, :2])
        assert rows[2]["band"] == 3
        assert rows[2]["found_diff"] == 1
        assert rows[2]["checksum_new"] is None
        assert rows[2]["diff_count"] is None

    def test_size_mismatch_skips_pixel_scan(self):
        a = _img(4, h=32, w=32, bands=1)[:, :, 0]
        b = _img(4, h=16, w=32, bands=1)[:, :, 0]
        (r,) = compare_arrays(a, b)
        assert not r["size_match"]
        assert r["diff_count"] is None and r["max_diff"] is None
        assert r["found_diff"] >= 1

    def test_gray_2d(self):
        a = _img(5, bands=1)[:, :, 0]
        (r,) = compare_arrays(a, a + np.uint8(0))
        assert r["band"] == 1 and r["found_diff"] == 0

    def test_psnr_matches_codecs(self):
        a = _img(6, bands=1)[:, :, 0]
        b = a.copy()
        b[0, 0] ^= 0xFF
        (r,) = compare_arrays(a, b)
        assert r["psnr"] == pytest.approx(codecs.psnr(a, b))


class TestDistributed:
    def _tables(self, spark, n=6):
        from gdal_spark import fixtures

        golden = fixtures.images_df(spark, n, tier="t2", partitions=4)

        def perturb(iterator):
            import pandas as pd

            for pdf in iterator:
                out = []
                for r in pdf.itertuples(index=False):
                    buf, fmt = bytes(r.bytes), r.fmt
                    i = int("".join(filter(str.isdigit, r.image_id)))
                    if i % 2 == 1:
                        arr = codecs.decode_image(buf, fmt).copy()
                        arr[:8, :8, ...] ^= 0x20
                        buf = codecs.encode_image(arr, fmt)
                    out.append({"image_id": r.image_id, "bytes": buf,
                                "fmt": fmt})
                yield pd.DataFrame(out, columns=["image_id", "bytes", "fmt"])

        new = golden.select("image_id", "bytes", "fmt").mapInPandas(
            perturb, schema="image_id string, bytes binary, fmt string"
        )
        return golden, new

    def test_distributed_matches_local(self, spark):
        from gdal_spark import fixtures

        golden, new = self._tables(spark)
        got = {
            (r.image_id, r.band): r
            for r in compare_images(golden, new).collect()
        }
        # local replica
        want = {}
        for i in range(6):
            rec = fixtures.image_record(i, tier="t2")
            arr = codecs.decode_image(rec["bytes"], rec["fmt"])
            narr = arr
            if i % 2 == 1:
                narr = arr.copy()
                narr[:8, :8, ...] ^= 0x20
                # replicate the encode->decode round trip (lossy fmts)
                narr = codecs.decode_image(
                    codecs.encode_image(narr, rec["fmt"]), rec["fmt"]
                )
            for row in compare_arrays(arr, narr):
                want[(rec["image_id"], row["band"])] = row
        assert set(got) == set(want)
        for k, w in want.items():
            r = got[k]
            assert r.checksum_match == w["checksum_match"], k
            assert r.diff_count == w["diff_count"], k
            assert r.max_diff == pytest.approx(w["max_diff"]), k
            assert r.found_diff == w["found_diff"], k

    def test_even_ids_identical_odd_differ(self, spark):
        golden, new = self._tables(spark)
        agg = {
            r.image_id: r.n_diff
            for r in compare_images(golden, new)
            .groupBy("image_id")
            .agg(__import__("pyspark.sql.functions", fromlist=["x"])
                 .sum("found_diff").alias("n_diff"))
            .collect()
        }
        for iid, nd in agg.items():
            i = int("".join(filter(str.isdigit, iid)))
            if i % 2 == 0:
                assert nd == 0, iid
            else:
                assert nd >= 1, iid

    def test_missing_rows_flagged(self, spark):
        golden, new = self._tables(spark, n=4)
        new2 = new.filter("image_id NOT LIKE '%1'")
        rows = compare_images(golden, new2).filter("band = 0").collect()
        assert len(rows) == 1
        assert rows[0].found_diff == 1 and rows[0].size_match is False


class TestReviewRegressions:
    def test_fmt_diff_counted_once_per_image(self, spark):
        import pandas as pd

        arr = _img(21)
        golden = spark.createDataFrame(
            pd.DataFrame(
                {"image_id": ["img_a"],
                 "bytes": [codecs.encode_png(arr)], "fmt": ["png"]}
            )
        )
        new = spark.createDataFrame(
            pd.DataFrame(
                {"image_id": ["img_a"],
                 "bytes": [codecs.encode_image(arr, "raw")], "fmt": ["raw"]}
            )
        )
        rows = compare_images(golden, new).collect()
        assert len(rows) == 3  # 3 bands
        assert sum(r.found_diff for r in rows) == 1  # fmt diff ONCE
        assert all(r.checksum_match for r in rows)
