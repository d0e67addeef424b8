"""ExactSubstr duplicated-span dedup (functions.substrings) vs a
brute-force enumeration oracle.

The key claim under test: the gram-cover formulation is EXACTLY the
suffix-array answer — a token is covered iff it lies in some substring
of length >= L occurring >= min_count times corpus-wide. The oracle
enumerates ALL (start, length >= L) substrings, counts occurrences by
literal string equality, and marks covered tokens — a completely
different construction from the engine's L-gram count."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions.substrings import (
    duplicated_spans,
    strip_duplicated_substrings,
)


def _norm_tokens(text):
    return text.strip().lower().split()


def brute_covered(docs, L, min_count):
    """doc_id -> sorted covered token positions, via full substring
    enumeration (every length >= L, occurrences counted corpus-wide
    including same-doc repeats)."""
    toks = {d: _norm_tokens(t) for d, t in docs}
    from collections import Counter

    counts = Counter()
    for tk in toks.values():
        n = len(tk)
        for m in range(L, n + 1):
            for p in range(0, n - m + 1):
                counts[" ".join(tk[p : p + m])] += 1
    covered = {d: set() for d in toks}
    for d, tk in toks.items():
        n = len(tk)
        for m in range(L, n + 1):
            for p in range(0, n - m + 1):
                if counts[" ".join(tk[p : p + m])] >= min_count:
                    covered[d].update(range(p, p + m))
    return {d: sorted(v) for d, v in covered.items()}


def spans_to_covered(rows):
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).update(
            range(r["span_start"], r["span_end"] + 1)
        )
    return {d: sorted(v) for d, v in out.items()}


def _random_docs(n_docs, vocab, lo, hi, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for d in range(n_docs):
        n = int(rng.integers(lo, hi))
        docs.append((d, " ".join(words[int(i)] for i in rng.integers(0, vocab, n))))
    return docs


@pytest.mark.parametrize("L,min_count,seed", [(3, 2, 1), (4, 2, 2), (3, 3, 3)])
def test_spans_match_full_substring_enumeration(spark, L, min_count, seed):
    docs = _random_docs(24, 8, 6, 30, seed)  # tiny vocab -> dense repeats
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = duplicated_spans(df, min_len=L, min_count=min_count).collect()
    want = brute_covered(docs, L, min_count)
    got_cov = spans_to_covered([r.asDict() for r in got])
    want = {d: v for d, v in want.items() if v}
    assert got_cov == want
    # spans are maximal + disjoint: consecutive spans in a doc leave a gap
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for d, sp in by_doc.items():
        sp.sort()
        for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
            assert s2 > e1 + 1, f"doc {d}: spans {s1,e1} / {s2,e2} not merged"
        for s, e in sp:
            assert e - s + 1 >= L


def test_planted_duplicate_sentence(spark):
    filler = [f"u{i}" for i in range(50)]
    planted = "the quick brown fox jumps"
    docs = [
        (0, " ".join(filler[0:8]) + " " + planted + " " + " ".join(filler[8:15])),
        (1, " ".join(filler[15:20]) + " " + planted),
        (2, planted + " " + " ".join(filler[20:30])),
        (3, " ".join(filler[30:45])),  # clean doc
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = duplicated_spans(df, min_len=5, min_count=2).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans}
    assert got == {(0, 8, 12), (1, 5, 9), (2, 0, 4)}
    out = {
        r.doc_id: r
        for r in strip_duplicated_substrings(df, min_len=5, min_count=2).collect()
    }
    assert out[3].n_dup_tokens == 0 and out[3].dup_frac == 0.0
    assert out[3].text_clean == " ".join(filler[30:45])
    assert out[1].text_clean == " ".join(filler[15:20])
    assert out[2].text_clean == " ".join(filler[20:30])
    assert out[0].text_clean == " ".join(filler[0:8]) + " " + " ".join(filler[8:15])
    for d in (0, 1, 2):
        assert out[d].n_dup_tokens == 5
    assert out[1].n_tokens == 10 and abs(out[1].dup_frac - 0.5) < 1e-12


def test_overlapping_repeats_merge_into_one_span(spark):
    # "a b c d e" and "c d e f g" both duplicated -> one span 0..6 in doc 0
    docs = [
        (0, "a b c d e f g x y z"),
        (1, "p a b c d e q"),
        (2, "r c d e f g s"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, min_len=5, min_count=2).collect()
    }
    assert (0, 0, 6) in spans
    assert (1, 1, 5) in spans and (2, 1, 5) in spans
    assert len(spans) == 3


def test_short_and_empty_docs(spark):
    docs = [(0, "a b"), (1, ""), (2, "   "), (3, "x y z w x y z w")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = duplicated_spans(df, min_len=4, min_count=2).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in spans} == {(3, 0, 7)}
    out = {r.doc_id: r for r in
           strip_duplicated_substrings(df, min_len=4, min_count=2).collect()}
    assert out[0].n_tokens == 2 and out[0].text_clean == "a b"
    assert out[1].n_tokens == 0 and out[1].text_clean == ""
    assert out[2].n_tokens == 0 and out[2].dup_frac == 0.0
    assert out[3].n_dup_tokens == 8 and out[3].text_clean == ""
    assert out[3].dup_frac == 1.0


def test_hash_grams_matches_string_grams(spark):
    docs = _random_docs(30, 6, 8, 40, seed=9)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(
        map(tuple, duplicated_spans(df, min_len=3, hash_grams=False).collect())
    )
    b = sorted(
        map(tuple, duplicated_spans(df, min_len=3, hash_grams=True).collect())
    )
    assert a == b


def test_same_doc_repeat_counts(spark):
    # the paper counts occurrences, not documents: a phrase repeated
    # twice INSIDE one doc is duplicated even if no other doc has it
    docs = [(0, "m n o p q z z m n o p q"), (1, "a b c d e")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, min_len=5, min_count=2).collect()
    }
    assert spans == {(0, 0, 4), (0, 7, 11)}
