"""Repetition / duplication quality filters for LLM training corpora.

Re-derivation of the Gopher repetition heuristics (Rae et al. 2021,
"Scaling Language Models", Table A1) on word n-grams:

- ``dup_word_frac``      : 1 - distinct_words / total_words — the
  word-level analog of the duplicate-line fraction.
- ``top_bigram_frac``    : fraction of the text's characters covered by
  occurrences of the single most frequent word 2-gram
  (count * len(gram) / len(text); ties broken by the lexicographically
  smallest gram so the answer is deterministic).
- ``dup_5gram_frac``     : fraction of characters covered by word
  5-grams occurring more than once, the standard approximation
  sum(count * len(gram)) / len(text) WITHOUT the overlap correction the
  original applies, capped at 1.0. Documented deviation: exact overlap
  accounting needs positional interval merging per document; the capped
  approximation orders documents almost identically and stays exactly
  SQL-expressible.

Scale shape: ``dup_word_frac`` is pure Column math (no shuffle in its
own derivation); both n-gram statistics come from ONE explode pass
(each gram size tagged in the same (n, gram) stream) aggregated with
map-side combine on (doc_id, n, gram), then per-doc reductions (a
window for the top bigram, a sum for dup-5-grams) and two per-doc
joins back onto the base row. The source is scanned twice total (base
row + gram stream); nothing is quadratic and nothing collects.

Every formula is replicated verbatim in the DuckDB oracle
(q_repetition_filters_sql) — integer counts and single-division
fractions keep float parity exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_WS = "\\s+"


def words_col(text: Column) -> Column:
    """Whitespace tokens of trimmed text (same pattern as token_count,
    so the oracle's regexp_split_to_array agrees)."""
    return F.split(F.trim(text), _WS)


def ngrams_col(words: Column, n: int) -> Column:
    """Space-joined word n-grams as an array Column (empty when the
    document has fewer than n words)."""
    count = F.size(words) - (n - 1)
    # sequence(1, 0) DESCENDS to [1, 0] in Spark — guard short docs
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_word_frac(text: Column) -> Column:
    """1 - distinct/total words; 0 for empty text. Pure Column math."""
    w = words_col(text)
    return F.when(F.size(w) <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(w)) / F.size(w)
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition metrics: (id, n_words, dup_word_frac,
    top_bigram, top_bigram_frac, dup_5gram_frac)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(F.trim(F.col(text_col))).alias("n_chars"),
        words_col(F.col(text_col)).alias("words"),
        dup_word_frac(F.col(text_col)).alias("dup_word_frac"),
    ).withColumn("n_words", F.size("words"))

    # ONE explode pass emits both gram sizes as (n, gram) structs, so
    # the source is scanned and split once for all n-gram statistics
    # (instead of once per gram size), and one combine-shuffle on
    # (id, n, gram) feeds both downstream reductions
    grams = base.select(
        "id",
        F.explode(
            F.concat(
                F.transform(
                    ngrams_col(F.col("words"), 2),
                    lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
                ),
                F.transform(
                    ngrams_col(F.col("words"), 5),
                    lambda g: F.struct(F.lit(5).alias("n"), g.alias("gram")),
                ),
            )
        ).alias("g"),
    ).select("id", "g.n", "g.gram")
    counts = grams.groupBy("id", "n", "gram").agg(F.count("*").alias("cnt"))

    # top bigram by (count desc, gram asc)
    w2 = Window.partitionBy("id").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    top2 = (
        counts.where(F.col("n") == 2)
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") == 1)
        .select(
            "id",
            F.col("gram").alias("top_bigram"),
            (F.col("cnt") * F.length("gram")).alias("top2_chars"),
        )
    )

    dup5 = (
        counts.where((F.col("n") == 5) & (F.col("cnt") > 1))
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.length("gram")).alias("dup5_chars"))
    )

    out = (
        base.select("id", "n_chars", "n_words", "dup_word_frac")
        .join(top2, "id", "left")
        .join(dup5, "id", "left")
    )
    return out.select(
        "id",
        "n_words",
        "dup_word_frac",
        F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
        F.when(F.col("n_chars") <= 0, F.lit(0.0))
        .otherwise(F.coalesce("top2_chars", F.lit(0)) / F.col("n_chars"))
        .alias("top_bigram_frac"),
        F.least(
            F.lit(1.0),
            F.when(F.col("n_chars") <= 0, F.lit(0.0)).otherwise(
                F.coalesce("dup5_chars", F.lit(0)) / F.col("n_chars")
            ),
        ).alias("dup_5gram_frac"),
    )
