"""Gopher-style repetition filters (functions/repetition.py)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.functions.repetition import repetition_stats


def _brute(text: str):
    t = text.strip()
    words = t.split() if t else [""]
    # NOTE: split('\\s+') of an empty string yields [''] in both Spark
    # and DuckDB; the brute force mirrors that
    if t == "":
        words = [""]
    n = len(words)
    dup_word = 0.0 if n <= 0 else 1.0 - len(set(words)) / n
    bigrams = [" ".join(words[i : i + 2]) for i in range(n - 1)]
    five = [" ".join(words[i : i + 5]) for i in range(n - 4)]
    from collections import Counter

    top_bigram, top_frac = "", 0.0
    if bigrams and len(t) > 0:
        c = Counter(bigrams)
        best = max(c.items(), key=lambda kv: (kv[1], [-ord(ch) for ch in kv[0]]))
        # deterministic tie-break: max count, lexicographically smallest
        mx = max(c.values())
        cand = sorted(g for g, k in c.items() if k == mx)
        top_bigram = cand[0]
        top_frac = c[top_bigram] * len(top_bigram) / len(t)
        del best
    dup5 = 0.0
    if five and len(t) > 0:
        c5 = Counter(five)
        dup5 = min(
            1.0,
            sum(k * len(g) for g, k in c5.items() if k > 1) / len(t),
        )
    return dict(
        n_words=n, dup_word_frac=dup_word, top_bigram=top_bigram,
        top_bigram_frac=top_frac, dup_5gram_frac=dup5,
    )


DOCS = [
    (1, "a b a b a b c d e f g h"),                      # heavy bigram rep
    (2, "the quick brown fox jumps over the lazy dog"),  # no repetition
    (3, "x x x x x x x x x x"),                          # one word repeated
    (4, "one two three four five one two three four five six"),  # dup 5gram
    (5, "solo"),                                          # single word
    (6, "  spaced   out   words  "),                      # messy whitespace
]


class TestAgainstBruteForce:
    def test_matches(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            r.id: r for r in repetition_stats(df).collect()
        }
        assert set(got) == {d[0] for d in DOCS}
        for did, text in DOCS:
            w = _brute(text)
            r = got[did]
            assert r.n_words == w["n_words"], did
            assert r.dup_word_frac == pytest.approx(w["dup_word_frac"]), did
            assert r.top_bigram == w["top_bigram"], did
            assert r.top_bigram_frac == pytest.approx(
                w["top_bigram_frac"]
            ), did
            assert r.dup_5gram_frac == pytest.approx(w["dup_5gram_frac"]), did

    def test_documents_table(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = repetition_stats(df).collect()
        assert len(out) == df.count()
        rows = {r.id: r for r in out}
        pdf = df.select("doc_id", "text").toPandas()
        for _, row in pdf.head(25).iterrows():
            w = _brute(row.text)
            r = rows[row.doc_id]
            assert r.dup_word_frac == pytest.approx(w["dup_word_frac"])
            assert r.top_bigram == w["top_bigram"]
            assert r.top_bigram_frac == pytest.approx(w["top_bigram_frac"])
            assert r.dup_5gram_frac == pytest.approx(w["dup_5gram_frac"])
