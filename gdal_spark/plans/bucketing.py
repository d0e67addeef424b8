"""Bucketed-table helpers: the pre-shuffle co-location lever for
repeated big joins (SURVEY.md §4; the north rule's "bucketing for
co-located joins"). Writing both sides of a recurring join bucketed +
sorted on the join key makes every later join a ZERO-EXCHANGE
sort-merge: the shuffle is paid once at write time instead of per
query — at 10^12 rows that is the difference between one ingest-time
shuffle and one per analysis.

Spark requires bucketed data to live in a catalog table (the bucket
layout is metastore metadata); the default in-memory catalog + an
explicit ``path`` keeps this deploy-free."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``keys`` into ``n_buckets``
    as catalog table ``table`` (external at ``path`` when given). Joins
    and aggregations on the bucket keys between tables with the SAME
    bucket count then run without any Exchange."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — the plan
    must show NO Exchange (asserted by the bucketed_join_no_shuffle
    audit in tools/explain_plans.py and tests/test_bucketing.py)."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on)
