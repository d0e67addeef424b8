"""availableNow incremental drive: each run drains only new files; reruns
are no-ops; snapshots accumulate idempotently (SURVEY.md §2.9)."""

import os

import pytest

from gdal_spark import fixtures
from gdal_spark.plans.snapshots import SnapshotTable
from gdal_spark.streaming.incremental import run_incremental_tiles


@pytest.mark.slow
def test_incremental_tiling(spark, tmp_path):
    images_dir = str(tmp_path / "images")
    ckpt = str(tmp_path / "ckpt")
    table = SnapshotTable(str(tmp_path / "tiles"))

    # batch 1: 4 images land
    fixtures.images_df(spark, 4, tier="bench", partitions=2).write.mode(
        "append"
    ).parquet(images_dir)
    run_incremental_tiles(spark, images_dir, table, ckpt, zoom=3)
    n1 = table.read(spark).count()
    assert n1 > 0

    # rerun with no new data: stream drains nothing, table unchanged
    run_incremental_tiles(spark, images_dir, table, ckpt, zoom=3)
    assert table.read(spark).count() == n1

    # batch 2: 4 more images land -> only they are processed
    import pandas as pd

    more = fixtures.images_df(spark, 8, tier="bench", partitions=2).where(
        "image_id >= 'img00000004'"
    )
    more.write.mode("append").parquet(images_dir)
    run_incremental_tiles(spark, images_dir, table, ckpt, zoom=3)
    n2 = table.read(spark).count()
    assert n2 >= n1  # new tiles (or same keys merged idempotently)
    # every tile key unique
    tiles = table.read(spark)
    assert tiles.count() == tiles.select("z", "tx", "ty").distinct().count()


class TestStatefulDedupStream:
    def test_cross_batch_dedup_with_state(self, spark, tmp_path):
        """applyInPandasWithState: a fingerprint seen in run 1 must not
        be emitted again in run 2 (state persists via the checkpoint)."""
        import pandas as pd

        from gdal_spark.streaming.stateful import dedup_stream

        inp = str(tmp_path / "docs_in")
        outp = str(tmp_path / "docs_out")
        ckp = str(tmp_path / "ckp")
        schema = "doc_id long, text string"

        b1 = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha  beta"), (3, "gamma")], schema
        )
        b1.write.mode("append").parquet(inp)
        dedup_stream(spark, inp, outp, ckp, b1.schema)
        out1 = spark.read.parquet(outp).collect()
        # 1 and 2 normalize identically -> kept_id = min = 1
        assert sorted((r.kept_id, r.text) for r in out1) == [
            ("1", "alpha beta"), ("3", "gamma")
        ]

        b2 = spark.createDataFrame(
            [(4, "alpha beta"), (5, "delta"), (6, "gamma")], schema
        )
        b2.write.mode("append").parquet(inp)
        dedup_stream(spark, inp, outp, ckp, b1.schema)
        out2 = spark.read.parquet(outp).collect()
        # only 'delta' is new; alpha-beta and gamma are stateful dups
        texts = sorted(r.text for r in out2)
        assert texts == ["alpha beta", "delta", "gamma"]


class TestWatermarkedWindows:
    """Event-time windows + watermark: late rows drop in streaming,
    count in batch — the §2.9 late-data contract."""

    def test_late_row_dropped_streaming_counted_batch(self, spark, tmp_path):
        import datetime as dt

        from gdal_spark.streaming.windows import (
            run_windowed_counts,
            windowed_counts,
        )

        inp = str(tmp_path / "ev_in")
        outp = str(tmp_path / "ev_out")
        ckp = str(tmp_path / "ev_ck")
        schema = "ev_id long, ts timestamp"

        def t(minute):
            return dt.datetime(2026, 1, 1, 10, minute)

        # batch 1: three rows in [10:00, 10:10) + one at 10:20 that
        # advances the watermark to 10:10
        b1 = spark.createDataFrame(
            [(1, t(0)), (2, t(3)), (3, t(9)), (4, t(20))], schema
        )
        b1.write.mode("append").parquet(inp)
        run_windowed_counts(spark, inp, outp, ckp, schema)

        # batch 2: a LATE row at 10:01 (older than the persisted
        # watermark) + a row at 10:40 that finalizes everything < 10:30
        b2 = spark.createDataFrame([(5, t(1)), (6, t(40))], schema)
        b2.write.mode("append").parquet(inp)
        run_windowed_counts(spark, inp, outp, ckp, schema)

        got = {
            r.window_start.minute: r.n
            for r in spark.read.parquet(outp).collect()
        }
        # streaming: the 10:00 window finalized WITHOUT the late row
        assert got[0] == 3
        assert got.get(20) == 1
        # batch over the same files: withWatermark is a no-op, the late
        # row counts
        batch = {
            r.window_start.minute: r.n
            for r in windowed_counts(spark.read.parquet(inp)).collect()
        }
        assert batch[0] == 4
        assert batch[20] == 1 and batch[40] == 1
