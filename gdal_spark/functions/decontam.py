"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard recipe (GPT-3 appendix C / Dolma / RedPajama decontamination):
a training document is contaminated if any of its word n-grams (13-grams
at production scale; smaller n at test scale so collisions exist) also
appears in the eval set. Everything here is pure Column math so the DuckDB
oracle can re-derive the identical formula.

100-TB posture:
- the eval side is the small side by construction (benchmarks are a few
  hundred MB of text at most) — its DISTINCT gram set is broadcast, so the
  only shuffle is the per-doc groupBy counting hits;
- training-side grams never leave the row until the explode, and the
  exploded rows are (gram, doc_id) — narrow strings, no document bytes;
- at real scale the gram strings should be hashed to 64-bit before the
  join (`hash_grams=True`) so shuffle rows are 16 bytes; the oracle path
  keeps plain strings so DuckDB can reproduce it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import norm_text, token_count


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct word n-grams of normalized text as array<string>.

    A doc with fewer than ``n`` tokens has no n-grams (empty array) —
    guarded explicitly because sequence(0, negative) would DESCEND."""
    toks = F.split(norm_text(col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<string>"))


def eval_gram_set(
    eval_df: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """DISTINCT n-gram set of the eval corpus — one column ``g``. Small by
    construction; callers broadcast it."""
    return (
        eval_df.where(F.col(text_col).isNotNull())
        .select(F.explode(word_ngrams(F.col(text_col), n)).alias("g"))
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    hash_grams: bool = False,
) -> DataFrame:
    """Per-training-doc contamination report:
    (id, n_grams, n_hit, hit_frac, contaminated).

    ``n_grams``  = number of DISTINCT word n-grams in the doc,
    ``n_hit``    = how many of them appear anywhere in the eval set,
    ``contaminated`` = n_hit > 0 (the GPT-3 rule; callers wanting a
    fractional threshold filter on hit_frac).

    Docs with < n tokens have zero grams and are never contaminated.
    ``hash_grams=True`` replaces the gram string with xxhash64(gram) on
    BOTH sides before the join — the 100-TB setting (16-byte shuffle rows,
    collision odds ~ (grams²)/2⁶⁴); the default keeps strings so the
    result is exact and SQL-reproducible."""
    egrams = eval_gram_set(eval_df, n, eval_text_col or text_col)
    # ONE scan of the training text: the gram array is built once, its
    # size rides along through explode_outer (zero-gram docs survive as a
    # NULL gram row), hits are marked by a broadcast LEFT join (egrams is
    # distinct, so no row multiplication), and one groupBy(_id) shuffle
    # of narrow (id, n_grams, marker) rows aggregates the report.
    ex = train.select(
        F.col(id_col).alias("_id"),
        word_ngrams(F.col(text_col), n).alias("_grams"),
    ).select(
        "_id",
        F.size("_grams").alias("n_grams"),
        F.explode_outer("_grams").alias("g"),
    )
    if hash_grams:
        # xxhash64(NULL) is a non-NULL constant — keep the zero-gram
        # sentinel NULL so it can never collide with a real eval gram
        ex = ex.select(
            "_id",
            "n_grams",
            F.when(F.col("g").isNotNull(), F.xxhash64("g")).alias("g"),
        )
        egrams = egrams.select(F.xxhash64("g").alias("g"))
    marked = ex.join(
        F.broadcast(egrams.withColumn("_hit", F.lit(1))), "g", "left"
    )
    out = (
        marked.groupBy("_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count("_hit").alias("n_hit"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "n_hit",
            F.when(F.col("n_grams") > 0, F.col("n_hit") / F.col("n_grams"))
            .otherwise(F.lit(0.0))
            .alias("hit_frac"),
            (F.col("n_hit") > 0).alias("contaminated"),
        )
    )
    return out


def decontaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """ids of CLEAN training docs (the keep-set) — the composable form:
    train.join(decontaminated_ids(...), id_col, 'left_semi')."""
    rep = decontaminate(train, eval_df, n, id_col, text_col, **kw)
    return rep.where(~F.col("contaminated")).select(id_col)
