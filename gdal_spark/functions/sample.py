"""Deterministic sampling and dataset splits over a key column.

Training pipelines need samples and train/val/test splits that are (a)
reproducible run-to-run, (b) stable under repartitioning and resume,
and (c) consistent across engines — `df.sample()` is none of these (it
is seed+partition dependent). The standard fix is hash-based
bucketing: bucket = H(salt || key) mod B, then select by bucket range.

The hash here is the first 8 hex digits of md5 interpreted as a uint32
— chosen over xxhash64/crc32 because md5 is bit-identical in every
engine (Spark, DuckDB, Python), so the oracle and any downstream
system reproduce the exact row sets. All Column math, one scan, no
shuffle; at 10^9 rows the split costs nothing beyond the filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int = BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from md5(salt || key)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets
    ).cast("int")


def hash_bucket_sql(expr: str, buckets: int = BUCKETS, salt: str = "") -> str:
    """The identical bucket in DuckDB SQL (fold 8 hex digits manually —
    DuckDB lacks a hex->int conv(); strpos arithmetic is exact)."""
    md5 = f"md5(concat('{salt}', CAST({expr} AS VARCHAR)))"
    # lambda var deliberately obscure: DuckDB lambda params SHADOW outer
    # columns, so a caller column named `i` would otherwise be captured
    digits = (
        f"list_transform(range(1, 9), __hx -> "
        f"strpos('0123456789abcdef', substr({md5}, __hx, 1)) - 1)"
    )
    return f"CAST(list_reduce({digits}, (a, b) -> a * 16 + b) % {buckets} AS INTEGER)"


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Keep ~fraction of rows, deterministically by key. The same key
    is kept or dropped identically in every run, partition layout, and
    engine — and samples nest: fraction 0.05 ⊂ fraction 0.10."""
    b = hash_bucket(F.col(key_col), buckets, salt)
    return df.where(b < int(round(fraction * buckets)))


def split_label(
    col: Column,
    weights: dict[str, float],
    salt: str = "",
    buckets: int = BUCKETS,
) -> Column:
    """Split-name label ('train'/'val'/'test'/...) by bucket range;
    weights need not sum to 1 (the remainder gets NULL = held out)."""
    b = hash_bucket(col, buckets, salt)
    expr, lo = None, 0
    for name, w in weights.items():
        hi = lo + int(round(w * buckets))
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return expr


def split_label_sql(
    key_expr: str,
    weights: dict[str, float],
    salt: str = "",
    buckets: int = BUCKETS,
) -> str:
    b = hash_bucket_sql(key_expr, buckets, salt)
    cases, lo = [], 0
    for name, w in weights.items():
        hi = lo + int(round(w * buckets))
        cases.append(f"WHEN {b} >= {lo} AND {b} < {hi} THEN '{name}'")
        lo = hi
    return "CASE " + " ".join(cases) + " ELSE NULL END"


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages:
    keep 100% of low-resource strata, 1% of the dominant one)."""
    b = hash_bucket(F.col(key_col), buckets, salt)
    thresh = None
    for value, frac in fractions.items():
        t = int(round(frac * buckets))
        cond = F.col(strata_col) == value
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = thresh.otherwise(int(round(default_fraction * buckets)))
    return df.where(b < thresh)
