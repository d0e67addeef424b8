"""BPE tokenizer: distributed train/encode vs a naive independent replica.

The naive trainer recomputes every pair count from scratch over the fully
expanded corpus each round (no histogram, no incremental bookkeeping); the
naive encoder applies merges sequentially in rank order (not the greedy
min-rank loop). Agreement pins both the histogram reformulation and the
greedy-encode equivalence."""

import re
from collections import Counter

import pytest

from gdal_spark.functions.bpe import (
    PRETOKEN_PATTERN,
    decode_bpe,
    encode_bpe,
    train_bpe,
)

pytestmark = pytest.mark.usefixtures("spark")


def naive_train(texts, num_merges, min_frequency=2):
    pat = re.compile(PRETOKEN_PATTERN, re.ASCII)
    corpus = [list(w.encode("utf-8")) for t in texts for w in pat.findall(t)]
    merges = []
    for rank in range(num_merges):
        counts = Counter()
        for s in corpus:
            for p in zip(s, s[1:]):
                counts[p] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_frequency:
            break
        merges.append(best)
        nid = 256 + rank
        new_corpus = []
        for s in corpus:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(nid)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_corpus.append(out)
        corpus = new_corpus
    return merges


def naive_encode(text, merges):
    pat = re.compile(PRETOKEN_PATTERN, re.ASCII)
    ids = []
    for w in pat.findall(text):
        s = list(w.encode("utf-8"))
        for rank, (a, b) in enumerate(merges):
            nid = 256 + rank
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(nid)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        ids.extend(s)
    return ids


CORPUS = [
    "the lowest low lower newest new news the the",
    "a newer nest rests in the west, the widest nest",
    "low low low lower lower newest newest newest widest",
    "10 songs, 100 songs, 1000 songs in the west",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


class TestBPE:
    def test_train_matches_naive(self, spark):
        got = train_bpe(_df(spark, CORPUS), num_merges=24)
        assert got == naive_train(CORPUS, 24)
        assert len(got) == 24

    def test_train_partition_invariant(self, spark):
        one = train_bpe(_df(spark, CORPUS).coalesce(1), num_merges=16)
        many = train_bpe(_df(spark, CORPUS).repartition(7), num_merges=16)
        assert one == many

    def test_encode_matches_sequential_replay_and_roundtrip(self, spark):
        merges = train_bpe(_df(spark, CORPUS), num_merges=32)
        probes = CORPUS + [
            "unseen wording with newestness and 1001 lows",
            "punct!!! ...and\ttabs\nnewlines  doubled  spaces",
            "ünïcödé bytes survive byte-level BPE — exactly",
        ]
        out = {
            r.doc_id: r.tokens
            for r in encode_bpe(_df(spark, probes), merges).collect()
        }
        for i, t in enumerate(probes):
            assert out[i] == naive_encode(t, merges)
            assert decode_bpe(out[i], merges) == t.encode("utf-8")

    def test_frequent_word_collapses_to_one_token(self, spark):
        texts = ["the " * 50] * 4
        merges = train_bpe(_df(spark, texts), num_merges=8)
        toks = encode_bpe(_df(spark, [" the"]), merges).collect()[0].tokens
        assert len(toks) == 1 and toks[0] >= 256

    def test_null_text_and_empty(self, spark):
        merges = train_bpe(_df(spark, CORPUS), num_merges=4)
        df = spark.createDataFrame(
            [(0, None), (1, "")], "doc_id bigint, text string"
        )
        rows = {r.doc_id: r.tokens for r in encode_bpe(df, merges).collect()}
        assert rows[0] is None and rows[1] == []

    def test_min_frequency_stops_training(self, spark):
        merges = train_bpe(
            _df(spark, ["ab", "cd"]), num_merges=50, min_frequency=2
        )
        assert merges == []  # every pair occurs once

    def test_unicode_whitespace_pretokens_agree(self, spark):
        """NBSP / U+2028 / NEL are Unicode-\\s but NOT JVM-or-ASCII \\s:
        the JVM training scan and the re.ASCII encode pass must segment
        them identically (review finding: default Python \\s diverged)."""
        texts = ["euro\xa0sign and line \x85next, euro\xa0sign again"] * 3
        merges = train_bpe(_df(spark, texts), num_merges=12)
        assert merges == naive_train(texts, 12)
        out = encode_bpe(_df(spark, texts), merges).collect()[0].tokens
        assert out == naive_encode(texts[0], merges)
        assert decode_bpe(out, merges) == texts[0].encode("utf-8")
