"""Text analysis as pure Column math (JVM-side, WholeStageCodegen).

Every function here is deliberately expressible in ANSI SQL too, so the
DuckDB oracle can run the *same formula* — the tests then verify Spark's
plan computes it identically (the OGR SQL scalar-function surface,
ogr/swq_op_registrar.cpp:28-61, maps to the same builtins).

- token_count     : whitespace tokenization
- word-shape stats: alpha/digit/punct/space counts via regexp_replace
- quality_score   : length + punctuation + stopword + word-length blend
                    (the classic Gopher/C4-style heuristics, re-derived)
- lang_id         : marker-word counting via replace() arithmetic (no
                    regex, so Spark and DuckDB agree bit-for-bit)
- fingerprint     : md5 of whitespace-normalized lowercase text
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# marker words per language; replace()-count arithmetic keeps the exact
# same semantics in Spark SQL and DuckDB SQL (no regex dialect drift)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " in "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
    "es": [" el ", " que ", " los ", " una ", " para "],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def norm_text(col: Column) -> Column:
    """lowercase + collapse whitespace (shared normalization)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def token_count(col: Column) -> Column:
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring via replace-length arithmetic —
    identical semantics in any SQL engine."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def alpha_ratio(col: Column) -> Column:
    n = F.length(col)
    a = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(a / n)


def digit_ratio(col: Column) -> Column:
    n = F.length(col)
    d = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(d / n)


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def mean_word_len(col: Column) -> Column:
    # char count on NORMALIZED text: tabs/newlines are whitespace, not
    # word characters (a literal-space strip counted them as letters)
    nt = token_count(col)
    chars = F.length(F.replace(norm_text(col), F.lit(" "), F.lit("")))
    return F.when(nt == 0, F.lit(0.0)).otherwise(chars / nt)


def token_matches(col: Column, word: str) -> Column:
    """Exact count of tokens equal to ``word`` via split + filter —
    replace-counting on padded text misses every second ADJACENT
    occurrence ('the the the' -> 2, the shared delimiter space is
    consumed by the previous match). Same list-lambda form exists in
    DuckDB (list_filter)."""
    toks = F.split(norm_text(col), " ")
    return F.size(F.filter(toks, lambda t: t == F.lit(word)))


def stopword_ratio(col: Column) -> Column:
    """Fraction of tokens that are (English) stopwords (exact token
    matching)."""
    cnt = None
    for w in STOPWORDS:
        c = token_matches(col, w)
        cnt = c if cnt is None else cnt + c
    nt = token_count(col)
    return F.when(nt == 0, F.lit(0.0)).otherwise(cnt / nt)


def quality_score(col: Column) -> Column:
    """Blend of the classic quality heuristics in [0, 1]:
    0.25*len_ok + 0.25*alpha + 0.25*(1 - punct_excess) + 0.25*word_len_ok."""
    nt = token_count(col).cast("double")
    len_ok = F.when((nt >= 5) & (nt <= 10000), 1.0).otherwise(0.0)
    wl = mean_word_len(col)
    wl_ok = F.when((wl >= 3.0) & (wl <= 12.0), 1.0).otherwise(0.0)
    punct_excess = F.least(F.lit(1.0), punct_ratio(col) * 5.0)
    return (
        0.25 * len_ok + 0.25 * alpha_ratio(col) + 0.25 * (1.0 - punct_excess) + 0.25 * wl_ok
    )


def lang_scores(col: Column) -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            c = token_matches(col, m.strip())
            s = c if s is None else s + c
        out[lang] = s
    return out


def lang_id(col: Column) -> Column:
    """argmax language by marker-word count; 'und' (undetermined) when all
    scores are zero; ties break by LANG_MARKERS declaration order."""
    scores = lang_scores(col)
    langs = list(scores)
    best = F.greatest(*[scores[l] for l in langs])
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for l in reversed(langs):
        expr = F.when((best > 0) & (scores[l] == best), F.lit(l)).otherwise(expr)
    return expr


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of normalized text (md5 agrees across
    engines, unlike murmur/xxhash builtins)."""
    return F.md5(norm_text(col))


def with_text_stats(df, text_col: str = "text"):
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("alpha_ratio", alpha_ratio(c))
        .withColumn("digit_ratio", digit_ratio(c))
        .withColumn("punct_ratio", punct_ratio(c))
        .withColumn("mean_word_len", mean_word_len(c))
        .withColumn("stopword_ratio", stopword_ratio(c))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_pred", lang_id(c))
        .withColumn("fp", fingerprint(c))
    )
