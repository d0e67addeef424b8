"""Line-level boilerplate removal — the C4/RefinedWeb corpus-cleaning
step: a line that repeats across many documents (nav menus, cookie
banners, "all rights reserved" footers) is boilerplate and is stripped
from every document; document order of the surviving lines is preserved.

Everything is Column math (split/posexplode/groupBy/anti-join), so the
DuckDB oracle replays the identical formula.

100-TB posture:
- the line-frequency count shuffles (trimmed-line, doc_id) rows once;
  at real scale pass ``hash_lines=True`` to shuffle xxhash64 keys
  (16-byte rows) instead of strings;
- the frequent-line set is SMALL by construction (only lines crossing
  the max_docs threshold) — it is broadcast, so the strip itself adds no
  shuffle beyond the per-doc rebuild groupBy;
- rebuild shuffles (doc_id, pos, line) — one row per KEPT line, never
  whole documents until the final array_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _lines(df: DataFrame, id_col: str, text_col: str, sep: str):
    return df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("norm", F.trim(F.col("line")))


def line_doc_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(line, n_docs): how many DISTINCT documents contain each
    (trimmed, non-empty) line — the boilerplate frequency table."""
    return (
        _lines(df, id_col, text_col, sep)
        .where(F.col("norm") != "")
        .groupBy(F.col("norm").alias("line"))
        .agg(F.count_distinct("_id").alias("n_docs"))
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 2,
    sep: str = "\n",
    hash_lines: bool = False,
) -> DataFrame:
    """Remove every line that appears in MORE than ``max_docs`` distinct
    documents (and every whitespace-only line), preserving the order of
    surviving lines. Returns the input columns plus:

    - n_lines   non-empty lines before the strip
    - n_removed lines stripped (boilerplate only, not the empty ones)
    - text_clean  the rebuilt text ('' when nothing survives)

    ``hash_lines=True`` counts and anti-joins on xxhash64(line) instead
    of the string — the at-scale setting (collision odds ~ lines²/2⁶⁴);
    default keeps strings so DuckDB reproduces the result exactly."""
    lines = _lines(df, id_col, text_col, sep).where(F.col("norm") != "")
    key = F.xxhash64("norm") if hash_lines else F.col("norm")
    lines = lines.withColumn("_k", key)
    freq = (
        lines.groupBy("_k")
        .agg(F.count_distinct("_id").alias("n_docs"))
        .where(F.col("n_docs") > max_docs)
        .select("_k")
    )
    # ONE pass over the exploded lines: the broadcast LEFT join marks
    # boilerplate rows (freq is distinct — no row multiplication), and a
    # single groupBy counts totals/removals AND rebuilds the clean text
    # (collect_list drops the NULLed boilerplate entries)
    marked = lines.join(
        F.broadcast(freq.withColumn("_bp", F.lit(1))), "_k", "left"
    )
    rebuilt = marked.groupBy("_id").agg(
        F.count("*").alias("n_lines"),
        F.count("_bp").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_bp").isNull(), F.struct("pos", "line"))
                    )
                ),
                lambda x: x["line"],
            ),
            sep,
        ).alias("text_clean"),
    )
    out = (
        df.join(
            rebuilt.select(
                F.col("_id").alias(id_col), "n_lines", "n_removed", "text_clean"
            ),
            id_col,
            "left",
        )
        .na.fill({"n_lines": 0, "n_removed": 0})
        .na.fill({"text_clean": ""})
    )
    return out
