"""Per-partition metrics + lineage — the GDALProgressFunc analog.

The reference threads a progress callback through every operator
(e.g. ogr/ogrsf_frmts/generic/ogrlayer.cpp:3410-3423). Distributed
equivalent: a metrics pass that records per-partition row/byte counts and
skew, emitted as a small DataFrame that the driver appends to a metrics
table. Skew ratio (max/mean rows per partition) is the signal that
triggers salting decisions for hot cells (SURVEY.md §4 skew handling).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def partition_metrics(df: DataFrame, byte_cols: list[str] | None = None) -> DataFrame:
    """(part_id, n_rows, n_bytes) per partition, computed in one narrow
    pass with spark_partition_id — no collect, no extra shuffle."""
    sizes = F.lit(0).cast("long")
    for c in byte_cols or []:
        sizes = sizes + F.coalesce(F.length(F.col(c)).cast("long"), F.lit(0))
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_sz", sizes)
        .groupBy("_pid")
        .agg(F.count("*").alias("n_rows"), F.sum("_sz").alias("n_bytes"))
        .withColumnRenamed("_pid", "part_id")
    )


def skew_report(df: DataFrame, byte_cols: list[str] | None = None) -> dict:
    """Driver-side summary: partitions, rows, bytes, skew ratios."""
    pm = partition_metrics(df, byte_cols).collect()
    if not pm:
        return {"partitions": 0, "rows": 0, "bytes": 0, "row_skew": 0.0, "byte_skew": 0.0}
    rows = [r.n_rows for r in pm]
    bts = [r.n_bytes for r in pm]
    mean_rows = sum(rows) / len(rows)
    mean_bytes = (sum(bts) / len(bts)) if any(bts) else 0
    return {
        "partitions": len(pm),
        "rows": int(sum(rows)),
        "bytes": int(sum(bts)),
        "row_skew": float(max(rows) / mean_rows) if mean_rows else 0.0,
        "byte_skew": float(max(bts) / mean_bytes) if mean_bytes else 0.0,
    }


def with_salt(df: DataFrame, key_cols: list[str], n_salt: int, salt_source: str | None = None):
    """Explicit salting of hot keys: adds a `salt` column derived from a
    stable per-row hash so one hot groupBy key fans out over n_salt
    partial groups; aggregate partials first, then merge (the
    partial+final aggregation shape, SURVEY.md §4 skew row)."""
    src = F.col(salt_source) if salt_source else F.hash(*[F.col(c) for c in df.columns[:1]])
    return df.withColumn("salt", F.pmod(src, F.lit(n_salt)))
