"""Token-window document chunking — RAG / training-sample preparation.

Splits every document into fixed-size TOKEN windows with optional
overlap (the standard retrieval-corpus and long-context-training prep
step), using the engine's own BPE tokenizer (:mod:`bpe`) so chunk
boundaries are measured in real subword tokens, not characters. The TOKEN
ids are the lossless representation (byte-level BPE invertibility):
concatenating a document's chunk tokens with the overlaps removed
reproduces the original text byte-for-byte — the invariant the tests
pin. The ``text`` column is a best-effort decode: a window boundary may
split a multi-byte UTF-8 character (its bytes live in different
chunks), in which case the cut character renders as U+FFFD at the
chunk edge — standard byte-level-tokenizer behavior.

Spark shape: ONE Arrow pass per batch (encode once per document via the
same distinct-word memo the encoder uses, then window the id array);
output is one row per chunk with (doc_id, chunk_idx, n_tokens, text).
No shuffle — chunking is embarrassingly row-parallel; any downstream
grouping (packing, dedup) pays its own exchange.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .bpe import PRETOKEN_PATTERN, _encode_word, decode_bpe

CHUNK_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("chunk_idx", IntegerType()),
    StructField("n_tokens", IntegerType()),
    StructField("text", StringType()),
    StructField("tokens", ArrayType(IntegerType())),
])


def chunk_documents(df, merges, chunk_tokens: int, overlap: int = 0,
                    doc_col: str = "doc_id", text_col: str = "text",
                    keep_tokens: bool = False):
    """One row per (document, window): windows start every
    ``chunk_tokens - overlap`` tokens; the last window is the remainder
    (never empty, never duplicated). ``overlap`` must be smaller than
    ``chunk_tokens``."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap({overlap}) < chunk_tokens({chunk_tokens})")
    ranks = {tuple(p): r for r, p in enumerate(merges)}
    merges = list(merges)
    pat = re.compile(PRETOKEN_PATTERN, re.ASCII)
    stride = chunk_tokens - overlap
    fields = CHUNK_SCHEMA if keep_tokens else StructType(CHUNK_SCHEMA.fields[:4])

    def do(batches):
        memo: dict[str, list[int]] = {}
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[doc_col], pdf[text_col]):
                if text is None:
                    continue
                ids: list[int] = []
                for w in pat.findall(text):
                    got = memo.get(w)
                    if got is None:
                        got = _encode_word(w.encode("utf-8"), ranks)
                        memo[w] = got
                    ids.extend(got)
                n = len(ids)
                start, ci = 0, 0
                while True:
                    window = ids[start:start + chunk_tokens]
                    if not window and ci > 0:
                        break
                    row = {
                        "doc_id": did,
                        "chunk_idx": ci,
                        "n_tokens": len(window),
                        "text": decode_bpe(window, merges).decode(
                            "utf-8", errors="replace"
                        ),
                    }
                    if keep_tokens:
                        row["tokens"] = window
                    rows.append(row)
                    ci += 1
                    if start + chunk_tokens >= n:
                        break
                    start += stride
            yield pd.DataFrame(
                rows, columns=[f.name for f in fields.fields]
            )

    return df.select(doc_col, text_col).mapInPandas(do, schema=fields)


def reassemble_chunks(chunks, merges=None, overlap: int = 0,
                      doc_col: str = "doc_id"):
    """Inverse check: concatenate each document's chunks in order with
    the first ``overlap`` TOKENS of every non-first chunk dropped —
    requires ``keep_tokens=True`` chunks. Returns (doc_id, text)."""

    def do(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk_idx")
        ids: list[int] = []
        for i, toks in enumerate(pdf["tokens"]):
            toks = list(toks)
            ids.extend(toks[overlap:] if i else toks)
        return pd.DataFrame({
            doc_col: [pdf[doc_col].iloc[0]],
            "text": [
                decode_bpe(ids, merges).decode("utf-8", errors="replace")
            ],
        })

    return chunks.groupBy(doc_col).applyInPandas(
        do, schema=f"{doc_col} long, text string"
    )
