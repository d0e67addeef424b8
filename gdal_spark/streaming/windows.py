"""Event-time windowed aggregation with a watermark — the Structured
Streaming late-data contract (SURVEY.md §2.9 is explicit that GDAL has
no streaming surface; this is the north-rule streaming obligation
alongside sessions/stateful/incremental).

Semantics (native JVM operators, no Python):
- batch DataFrame in  -> withWatermark is a no-op, every row counts;
- streaming DataFrame -> a row older than (max event time seen so far -
  watermark delay) is DROPPED, and a window is emitted (append mode)
  only once the watermark passes its end — the exactly-once late-data
  story a 100-TB ingest pipeline relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time counts: one row per finalized
    window (and per key when ``keys`` given) with
    (window_start, window_end, n). Works identically on batch and
    streaming inputs — the streaming run additionally drops
    late-beyond-watermark rows and only emits finalized windows."""
    grouped = (
        df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide or window),
            *(keys or []),
        )
        .agg(F.count("*").alias("n"))
    )
    return grouped.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(keys or []),
        "n",
    )


def run_windowed_counts(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> None:
    """One availableNow streaming pass over a file source: drains new
    files, drops late rows per the persisted watermark, appends
    FINALIZED windows to ``output_dir``. Re-runs resume from the
    checkpoint (the incremental.py drive shape)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = windowed_counts(stream, ts_col, window, watermark=watermark)
    (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
