"""Keyword relevance ranking over a document table — BM25 and TF-IDF.

The retrieval step of a training-data pipeline (dedup -> quality ->
*relevance selection*): score every document against a bag of query
terms and keep the best. Formulas are the published Okapi BM25
(Robertson & Zaragoza, "The Probabilistic Relevance Framework: BM25 and
Beyond", FnTIR 2009) with the Lucene idf smoothing
``ln(1 + (N - df + 0.5) / (df + 0.5))`` (non-negative for df > N/2).

Scale shape (one corpus scan, no collect):

- tokenize + doc length are Column math on the scan (codegen);
- only tokens in the (tiny, broadcast) query set are exploded, so the
  exploded relation is |matches|, not |tokens| — the filter sits under
  the generator and prunes before any shuffle;
- per-term document frequency is a groupBy over that small relation,
  broadcast back; corpus stats (N, avgdl) ride a 1-row broadcast
  crossJoin. Nothing driver-side, so 10^9 docs only pay the scan plus
  a |matching tokens|-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tokens(col, pattern: str = "[^a-z0-9]+"):
    """Lowercased alphanumeric tokens, empties dropped — expressible
    verbatim in DuckDB as list_filter(string_split_regex(...))."""
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), pattern),
        lambda t: t != "",
    )


def doc_length(col) -> "F.Column":
    return F.size(tokens(col))


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document containing >= 1 query term.

    Returns (id_col, bm25 double, n_hit_terms int). Deterministic given
    the corpus; sum association is per-(doc, term) scores -> sum.
    """
    toks = df.select(
        F.col(id_col), doc_length(F.col(text_col)).alias("dl"),
        tokens(F.col(text_col)).alias("toks"),
    )
    # corpus stats over ALL docs (zero-token docs count toward avgdl)
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qset = [t.lower() for t in query_terms]
    hits = (
        toks.select(id_col, "dl", F.explode("toks").alias("t"))
        .where(F.col("t").isin(qset))
        .groupBy(id_col, "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = hits.groupBy("t").agg(F.count(F.lit(1)).alias("dft"))
    scored = (
        hits.join(F.broadcast(dft), "t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("term_score").alias("bm25"),
        F.count(F.lit(1)).alias("n_hit_terms"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 (ties broken by id for determinism)."""
    s = bm25_scores(df, query_terms, id_col, text_col, k1, b)
    return s.orderBy(F.desc("bm25"), F.col(id_col)).limit(k)


def tfidf_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Sparse TF-IDF document vectors as (id, term, weight) triples —
    ln-scaled tf, smoothed idf ln(1 + N/df). Full-vocabulary variant
    (per-term df is a groupBy over the exploded tokens; the explode here
    is |tokens|-sized, the honest cost of building a global index)."""
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("toks")
    ).select(id_col, F.explode("toks").alias("t"))
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("t").agg(F.count(F.lit(1)).alias("dft"))
    if min_df > 1:
        dft = dft.where(F.col("dft") >= min_df)
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(dft, "t")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            F.col("t").alias("term"),
            (
                (1.0 + F.log(F.col("tf")))
                * F.log(1.0 + F.col("n_docs") / F.col("dft"))
            ).alias("weight"),
        )
    )
