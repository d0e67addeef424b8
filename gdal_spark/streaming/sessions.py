"""Session-window aggregation (sessionization) over an event stream.

Spark-native: ``F.session_window(ts, gap)`` — the same operator works
unchanged on a static DataFrame and inside Structured Streaming (where
watermark + state-store merging handles late data), so this is the
blessed scale path: one shuffle on the grouping key, session merging in
the JVM ExecSession state manager, no Python in the loop.

Semantics (Spark's SessionWindow): each event opens a window
``[ts, ts + gap)``; windows of the same key that overlap OR TOUCH are
merged. Two consecutive events merge iff ``next_ts <= prev_ts + gap``
— a next event exactly at ``prev_ts + gap`` still merges (closed
boundary, verified by test_sessions.py::test_boundary_merges).
The equivalent batch-SQL derivation is the classic gaps-and-islands:
``ts - lag(ts) > gap`` marks a session break, a running sum of breaks
numbers sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap: str = "4 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    aggs: list | None = None,
) -> DataFrame:
    """Per-key session windows with aggregates.

    Returns one row per (key, session): session_start (first event ts),
    session_end (last event ts + gap, i.e. the window close), n_events,
    plus any caller aggregates. Works on both batch DataFrames and
    streaming DataFrames (add a watermark upstream for streaming).
    """
    if aggs is None:
        aggs = []
    out = (
        df.groupBy(key_col, F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"), *aggs)
    )
    return out.select(
        key_col,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        *[c for c in out.columns if c not in (key_col, "session_window", "n_events")],
    )
