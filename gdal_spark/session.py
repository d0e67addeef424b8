"""SparkSession factory tuned for the image workload.

Local sandbox runs ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
builder is driven by spark-submit conf. Design notes:

- AQE on (adaptive coalescing + skew-join): the z0 hot-cell skew the
  fixtures deliberately produce (FIXTURES.md §1) is handled by explicit
  salting *and* AQE, mirroring SURVEY.md §4 "skew handling".
- Arrow batches are capped (images are fat rows: a 256x256 RGB PNG is
  ~100 KB, so 10k-row default batches would blow executor memory at scale).
- Session timezone pinned to UTC so duckdb-oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "gdal_spark",
    shuffle_partitions: int | None = None,
    arrow_batch: int = 256,
    extra: dict | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", "0")
    ) or max(2 * cores, 32)
    arrow_batch = int(
        os.environ.get("SPARK_GRAFT_ARROW_BATCH", "0")
    ) or arrow_batch
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # pixel-group stages are CPU-bound per GROUP, not per byte: the
        # 64MB default advisory size would coalesce a 350MB tile shuffle
        # to ~6 partitions and cap parallelism regardless of cores
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # ContextCleaner reclaims shuffle files / broadcasts / checkpoint
        # state only when driver GC collects their referents; with a large
        # heap GC may not run for the whole session, so accumulated state
        # taxes every later stage (measured: tile job 133 img/s after 15
        # queries vs 221 img/s right after a forced GC — BENCH/NOTES.md).
        # 2min (default 30min) bounds the decay for long sessions.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
