"""Byte-pair-encoding tokenizer: distributed training + encoding.

The component a training-data pipeline needs between text curation and
packing: a REAL learned subword tokenizer (Sennrich et al. 2016, the
byte-level variant GPT-2 popularized), not the whitespace/regex token
counter in :mod:`text`. The reference repo has no tokenizer; this is one
of the beyond-reference LLM-pipeline operators.

Spark shape — why this scales to 100 TB:

- **TRAIN** (:func:`train_bpe`): the only corpus-scale pass is the
  word-type histogram — pre-tokenize with ONE JVM regexp (zero Python in
  the scan), ``groupBy(word).count()``. BPE training then runs on the
  histogram, bounded by DISTINCT word types (further capped at
  ``max_word_types`` most-frequent, the standard recipe of every
  production BPE trainer — HF tokenizers / SentencePiece train from word
  counts, never the raw corpus). The driver loop maintains pair counts
  incrementally, touching only the word types that contain the merged
  pair.
- **ENCODE** (:func:`encode_bpe`): the merge table (a few KB) ships in
  the UDF closure; one Arrow pass per batch encodes each DISTINCT word
  once (batch-level memo — web text is Zipfian, so the hit rate is the
  win) and maps token ids back per document.

Token id space: ``0..255`` are raw bytes; ``256 + r`` is the ``r``-th
merge. :func:`decode_bpe` inverts exactly — byte-level BPE is lossless on
arbitrary input.

Pre-tokenizer: `` ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+`` —
deliberately lookahead-free and ASCII-classed so the JVM regex used in
the training scan and the Python ``re`` used in the encode pass agree
byte-for-byte. GPT-2's contraction splits and unicode ``\\p{L}`` classes
are the documented deviation; merges never cross pre-token boundaries,
which is the property that matters.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

PRETOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def _word_pairs(seq):
    return zip(seq, seq[1:])


def _merge_seq(seq, a, b, new_id):
    """Merge every left-to-right occurrence of (a, b) in one scan."""
    out = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def train_bpe(
    df,
    text_col: str = "text",
    num_merges: int = 256,
    min_frequency: int = 2,
    max_word_types: int = 1_000_000,
) -> list[tuple[int, int]]:
    """Learn ``num_merges`` BPE merges from a corpus DataFrame.

    Returns the ranked merge list ``[(id_a, id_b), ...]``; merge ``r``
    creates token id ``256 + r``. Deterministic: the best pair each round
    is (highest count, then smallest (id_a, id_b)) — count ties never
    depend on partitioning because counts come from one global groupBy.

    The driver holds only the word-type histogram (``max_word_types``
    rows max; types beyond the cap are dropped by frequency, which for a
    Zipfian corpus loses a vanishing count mass — the cap exists so one
    adversarial high-entropy corpus cannot OOM the driver).
    """
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_PATTERN), F.lit(0))
        ).alias("w")
    )
    hist = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_word_types)
        .collect()
    )
    # word type -> (symbol sequence, corpus count)
    seqs: list[list[int]] = []
    cnts: list[int] = []
    for r in hist:
        seqs.append(list(r["w"].encode("utf-8")))
        cnts.append(int(r["c"]))

    pair_count: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, (s, c) in enumerate(zip(seqs, cnts)):
        for p in _word_pairs(s):
            pair_count[p] += c
            pair_words[p].add(wi)

    merges: list[tuple[int, int]] = []
    for rank in range(num_merges):
        if not pair_count:
            break
        best = min(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_count[best] < min_frequency:
            break
        new_id = 256 + rank
        merges.append(best)
        a, b = best
        for wi in list(pair_words[best]):
            old = seqs[wi]
            c = cnts[wi]
            for p in _word_pairs(old):
                pair_count[p] -= c
                if pair_count[p] <= 0:
                    del pair_count[p]
                pair_words[p].discard(wi)
            new = _merge_seq(old, a, b, new_id)
            seqs[wi] = new
            for p in _word_pairs(new):
                pair_count[p] += c
                pair_words[p].add(wi)
    return merges


def _encode_word(b: bytes, ranks: dict) -> list[int]:
    """Standard greedy BPE: repeatedly merge the lowest-rank adjacent pair
    (all its occurrences, left to right) until none applies. With merges
    learned in rank order this reproduces the training segmentation
    exactly (each merge's operands exist only after all lower ranks have
    been applied)."""
    s = list(b)
    while len(s) >= 2:
        best_pair = None
        best_rank = None
        for p in _word_pairs(s):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        s = _merge_seq(s, best_pair[0], best_pair[1], 256 + best_rank)
    return s


def encode_bpe(df, merges: list[tuple[int, int]], text_col: str = "text",
               out_col: str = "tokens"):
    """Add ``out_col: array<int>`` of BPE token ids. One Arrow pass; each
    distinct pre-token in a batch is encoded once (memo) — the merge
    table travels in the closure (KBs)."""
    ranks = {tuple(p): r for r, p in enumerate(merges)}
    # re.ASCII: Python's default \s is Unicode-aware (NBSP, U+2028, ...)
    # but the JVM regex used in the training scan is not — without this
    # flag, merges learned across an NBSP boundary could never apply at
    # encode time (train/encode segmentation must agree byte-for-byte)
    pat = re.compile(PRETOKEN_PATTERN, re.ASCII)

    @F.pandas_udf(ArrayType(IntegerType()))
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[int]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            ids: list[int] = []
            for w in pat.findall(t):
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w.encode("utf-8"), ranks)
                    memo[w] = got
                ids.extend(got)
            out.append(ids)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))


def vocab_bytes(merges: list[tuple[int, int]]) -> dict[int, bytes]:
    """Token id -> byte expansion (the decode table)."""
    table = {i: bytes([i]) for i in range(256)}
    for r, (a, b) in enumerate(merges):
        table[256 + r] = table[a] + table[b]
    return table


def decode_bpe(ids, merges: list[tuple[int, int]]) -> bytes:
    table = vocab_bytes(merges)
    return b"".join(table[int(i)] for i in ids)
