"""Corpus-trained n-gram language-model scoring — the CCNet-style
quality filter of a training-data pipeline, as pure DataFrame algebra.

Train add-k-smoothed bigram statistics over the corpus itself (or any
reference corpus), then score every document by its average bigram
log-probability; low scores flag boilerplate / gibberish. Published
formulation: P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V) with V the
corpus vocabulary size (Chen & Goodman smoothing baseline; the CCNet
paper uses a Kneser-Ney KenLM the same shape).

Scale shape: two groupBy counts over the exploded bigram relation (the
honest |tokens| cost of training), one shuffle join of the bigram
relation against the (vocabulary-sized) count tables, one final
per-doc aggregate. Nothing driver-side, no crossJoin except the 1-row
broadcast of (V). Model reuse: `bigram_model` returns the count
DataFrames so a trained model can be persisted and applied to a
different table than it was trained on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gdal_spark.functions.rank import tokens


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    n = F.size("toks")
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice("toks", 1, n - 1),
            F.slice("toks", 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    return (
        toks.select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def bigram_model(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
):
    """Returns (pair_counts, history_counts, vocab_size_df):
    c(w1,w2), c(w1) summed over bigram histories, and a 1-row frame
    with the distinct-token vocabulary size V."""
    pairs = _doc_bigrams(df, id_col, text_col)
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    return c12, c1, vocab


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.1,
    model=None,
) -> DataFrame:
    """(id, n_bigrams, avg_logp) per document with >= 1 bigram.

    `model` defaults to statistics trained on `df` itself; pass the
    triple from `bigram_model(reference_corpus)` to score against a
    fixed reference. Add-k smoothing keeps unseen pairs finite, so a
    doc scored against a foreign model never produces -inf.
    """
    c12, c1, vocab = model if model is not None else bigram_model(
        df, id_col, text_col
    )
    pairs = _doc_bigrams(df, id_col, text_col)
    scored = (
        pairs.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + k)
                / (F.coalesce(F.col("c1"), F.lit(0)) + k * F.col("v"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("lp").alias("avg_logp"),
    )
