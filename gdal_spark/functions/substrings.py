"""Exact duplicated-substring detection/removal — the ExactSubstr
corpus-dedup step of Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499): any token run of length >=
``min_len`` that occurs at least ``min_count`` times anywhere in the
corpus is a duplicated span and is located (and optionally stripped)
in every document that contains it.

The paper builds one giant suffix array; that is a single-machine
construction. This engine uses an EXACTLY equivalent distributed
reformulation over fixed-length grams:

    a token position t lies inside some duplicated substring of length
    >= L                                               <=>
    t is covered by at least one duplicated L-gram.

(=> every duplicated substring of length m >= L has all of its
m - L + 1 L-grams duplicated, and those grams cover all its tokens;
<= a duplicated L-gram IS a duplicated substring of length L.)
So counting L-gram occurrences and merging the covered token intervals
reproduces the suffix-array answer for the fixed threshold L — as pure
DataFrame ops (no per-row Python anywhere), which is why the DuckDB
oracle can replay the identical formula.

Tokenization matches ``functions.decontam``: lower + trim + collapse
whitespace + split on single spaces.

100-TB posture:
- gram construction is Column math over the token array (transform +
  slice + concat_ws); only (doc_id, pos, gram_key) rows ever shuffle —
  never documents;
- the occurrence count is ONE groupBy with map-side partial aggregation;
  marking positions is a semi-join on the gram key (AQE handles skew /
  broadcasts the dup-gram set when it is small, which it is for any
  corpus worth training on);
- ``hash_grams=True`` shuffles xxhash64 keys (8 bytes) instead of gram
  strings — the at-scale setting (collision odds ~ grams²/2⁶⁴); default
  keeps strings so the oracle reproduces the result exactly;
- span merging is a per-document window (lag + running sum — the
  gaps-and-islands construction), ONE shuffle on doc_id;
- the strip rebuilds text from one equi-join of the token explode
  against a per-doc span ARRAY (a higher-order-function filter, no
  range join), then one groupBy rebuild — the ``strip_boilerplate``
  shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str):
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col).alias("_id"), F.split(norm, " ").alias("toks"))


def _gram_positions(df: DataFrame, id_col: str, text_col: str, min_len: int,
                    hash_grams: bool):
    """(doc_id, pos, gram-key) for every L-gram start; docs shorter than
    L tokens contribute nothing."""
    t = _tokens(df, id_col, text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - min_len),
        lambda i: F.concat_ws(" ", F.slice("toks", i + 1, min_len)),
    )
    g = (
        t.where(F.size("toks") >= min_len)
        .select("_id", F.posexplode(grams).alias("pos", "gram"))
    )
    key = F.xxhash64("gram") if hash_grams else F.col("gram")
    return g.select("_id", "pos", key.alias("_k"))


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    min_count: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """All maximal duplicated token spans: (doc_id, span_start, span_end,
    n_tokens), token positions 0-based inclusive. A span is a maximal
    run of tokens each covered by an L-gram (L = ``min_len``) whose
    total occurrence count across the corpus (same-document repeats
    included, as in the paper) is >= ``min_count``."""
    pos = _gram_positions(df, id_col, text_col, min_len, hash_grams)
    dup = (
        pos.groupBy("_k")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
        .select("_k")
    )
    marked = pos.join(dup, "_k", "left_semi").select("_id", "pos")
    # covered token intervals [pos, pos+L-1] of two dup gram-starts merge
    # iff the later start is <= earlier + L (overlap or token-adjacency)
    w = Window.partitionBy("_id").orderBy("pos")
    islands = (
        marked.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("pos") - F.col("_prev") > min_len),
                1,
            ).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        islands.groupBy(F.col("_id").alias(id_col), "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + min_len - 1).alias("span_end"),
        )
        .withColumn(
            "n_tokens", F.col("span_end") - F.col("span_start") + F.lit(1)
        )
        .drop("_isl")
    )


def strip_duplicated_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    min_count: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """Remove every duplicated span from every document (the paper's
    dedup action). Returns one row per input document with:

    - n_tokens     tokens before the strip
    - n_dup_tokens tokens inside duplicated spans
    - dup_frac     n_dup_tokens / n_tokens (0.0 for empty docs)
    - text_clean   surviving tokens re-joined with single spaces
                   (normalized casing/whitespace, like the grams)
    """
    spans = duplicated_spans(df, id_col, text_col, min_len, min_count,
                             hash_grams)
    per_doc = spans.groupBy(F.col(id_col).alias("_id")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    t = _tokens(df, id_col, text_col).join(per_doc, "_id", "left")
    spans_arr = F.coalesce("_spans", F.array())
    keep = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 1),
            lambda i: F.struct(
                i.alias("i"),
                (~F.exists(
                    spans_arr,
                    lambda sp: (i >= sp["span_start"]) & (i <= sp["span_end"]),
                )).alias("keep"),
            ),
        ),
        lambda s: s["keep"],
    )
    n_tok = F.when(
        (F.size("toks") == 1) & (F.element_at("toks", 1) == ""), 0
    ).otherwise(F.size("toks"))
    return t.select(
        F.col("_id").alias(id_col),
        n_tok.alias("n_tokens"),
        F.aggregate(
            spans_arr, F.lit(0),
            lambda acc, sp: acc + sp["span_end"] - sp["span_start"] + 1,
        ).alias("n_dup_tokens"),
        F.concat_ws(
            " ", F.transform(keep, lambda s: F.element_at("toks", s["i"] + 1))
        ).alias("text_clean"),
    ).withColumn(
        "dup_frac",
        F.when(F.col("n_tokens") > 0,
               F.col("n_dup_tokens") / F.col("n_tokens")).otherwise(F.lit(0.0)),
    )
