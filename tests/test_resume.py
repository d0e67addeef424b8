"""Resumability: kill/rerun at a stage boundary produces the identical
committed tile set (north rule; gdal2tiles --resume semantics,
gdal2tiles.py:2848-2851, as snapshot left-anti joins)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark import fixtures
from gdal_spark.operators.tile import cut_base_tiles
from gdal_spark.plans.snapshots import SnapshotTable


@pytest.fixture(scope="module")
def world(spark):
    df = fixtures.images_df(spark, 1, tier="t2", partitions=1).persist()
    df.count()
    yield df
    df.unpersist()


def test_tile_stage_resume(spark, world, tmp_path):
    table = SnapshotTable(str(tmp_path / "tiles"))
    tiles = cut_base_tiles(world, zoom=2, resampling="bilinear").select(
        "z", "tx", "ty", "checksum", "n_src"
    )
    full = tiles.collect()
    assert len(full) == 16

    # simulate a crash after committing only half the tiles
    partial = tiles.where(F.col("tx") < 2)
    table.commit(partial, "partial run before crash")
    assert table.read(spark).count() == 8

    # resume: only the missing half is pending
    pending = table.anti_join_pending(tiles, ["z", "tx", "ty"])
    assert pending.count() == 8
    assert {(r.tx, r.ty) for r in pending.select("tx", "ty").collect()} == {
        (x, y) for x in (2, 3) for y in range(4)
    }

    # second run commits the remainder; result identical to a clean run
    table.append(tiles, ["z", "tx", "ty"], "resume run")
    final = table.read(spark).collect()
    assert len(final) == 16
    clean = {(r.z, r.tx, r.ty): r.checksum for r in full}
    resumed = {(r.z, r.tx, r.ty): r.checksum for r in final}
    assert clean == resumed

    # idempotence: a third run adds nothing, but still commits a snapshot
    table.append(tiles, ["z", "tx", "ty"], "no-op rerun")
    assert table.read(spark).count() == 16
    assert table.current_snapshot_id() == 3


def test_snapshot_over_hadoop_fs_uri(spark, world, tmp_path):
    """Scheme-qualified URI path exercises the Hadoop FileSystem API for
    BOTH the parquet snapshots and the driver-side manifest IO (the
    virtual-FS obligation): swapping file:// for s3a://bucket/... plus the
    connector jar changes nothing else in the pipeline."""
    table = SnapshotTable("file://" + str(tmp_path / "tiles_uri"))
    tiles = cut_base_tiles(world, zoom=2, resampling="bilinear").select(
        "z", "tx", "ty", "checksum", "n_src"
    )
    partial = tiles.where(F.col("tx") < 2)
    table.commit(partial, "partial run before crash")
    assert table.read(spark).count() == 8

    pending = table.anti_join_pending(tiles, ["z", "tx", "ty"])
    assert pending.count() == 8

    table.append(tiles, ["z", "tx", "ty"], "resume run")
    assert table.read(spark).count() == 16
    assert table.current_snapshot_id() == 2
    # the manifest itself resolves through the FileSystem API
    m = table.manifest()
    assert m["snapshots"][0]["description"] == "partial run before crash"
    # time travel to the pre-resume snapshot still works over the URI
    assert table.read(spark, snapshot_id=1).count() == 8


class TestAppendOnlyCommits:
    def test_append_writes_only_new_rows(self, spark, tmp_path):
        """Each append materializes ONLY the new rows (manifest lists
        prior dirs), so k incremental batches write O(total) bytes, not
        O(k * total)."""
        import glob
        import os

        from gdal_spark.plans.snapshots import SnapshotTable

        t = SnapshotTable(str(tmp_path / "tbl"))
        df1 = spark.range(0, 100).withColumnRenamed("id", "k")
        t.append(df1, ["k"])
        df2 = spark.range(50, 160).withColumnRenamed("id", "k")
        sid = t.append(df2, ["k"])
        # read() sees the deduped union
        got = t.read(spark)
        assert got.count() == 160
        # the second snapshot dir holds only the 60 new rows
        import pandas as pd

        snap2 = spark.read.parquet(str(tmp_path / "tbl" / f"snap-{sid}"))
        assert snap2.count() == 60
        # and the manifest references both dirs for the current snapshot
        m = t.manifest()
        entry = [e for e in m["snapshots"] if e["id"] == sid][0]
        assert len(entry["dirs"]) == 2
        # a third no-op append commits an empty dir, read unchanged
        t.append(df1, ["k"])
        assert t.read(spark).count() == 160
