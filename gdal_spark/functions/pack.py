"""Sequence packing: assign documents to fixed-capacity token bins for
training-example construction (the "pack short docs into one context
window" step of an LLM data pipeline).

Packing rule — FIRST-FIT SEQUENTIAL, deterministic and SQL-reproducible:
- shard docs by pmod(doc_id, n_shards); packing is independent per shard
  (the parallelism unit — bins never span shards);
- within a shard, walk docs in ascending id order keeping one open bin;
  if the doc does not fit in the remaining capacity AND the bin is
  non-empty, seal it and open the next (bin ids count from 0 per shard);
- a doc longer than the capacity occupies a bin alone (overflow=true) —
  the caller decides whether to split/truncate it downstream.

This is the streaming-friendly variant (one pass, no sorting by length),
the same rule a sequential data loader applies. Best-fit-decreasing packs
tighter but is order-destroying and not what pipelines that preserve
document order use.

100-TB posture: packing is inherently sequential WITHIN a bin stream, so
the shard is the unit of parallelism — n_shards scales with the corpus
(hash sharding keeps them even); the only shuffle is the groupBy(shard)
on (id, n_tokens) rows — 16 bytes each, never document bytes. The
per-shard loop is a numpy int walk, not per-token work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .text import token_count


def pack_sequences(
    df: DataFrame,
    capacity: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    split_overflow: bool = False,
) -> DataFrame:
    """Returns (shard, doc_id, chunk_idx, n_tokens, bin_id, bin_offset,
    overflow).

    ``bin_offset`` is the token offset of the doc (chunk) inside its
    bin. Token counts come from ``tokens_col`` if given, else
    text.token_count(text_col) (whitespace tokens — the same formula the
    token_count oracle uses, so DuckDB reproduces it). NULL-text rows
    (nothing to train on) are excluded.

    ``split_overflow=False`` (default): a doc longer than the capacity
    occupies a bin alone with overflow=true (chunk_idx always 0).
    ``split_overflow=True``: long docs are CHUNKED into
    ceil(n/capacity) consecutive pieces (full-capacity chunks + the
    remainder) before the walk — the standard training-pipeline
    behavior, so no bin ever exceeds the capacity and overflow is
    always false; chunk token offsets within the doc are
    chunk_idx * capacity.

    Determinism requires ids unique within a shard: the walk order is
    (doc_id, chunk_idx, n_tokens) ascending, so duplicate ids with equal
    token counts would tie on shuffle arrival order."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    tok = (
        F.col(tokens_col)
        if tokens_col
        else token_count(F.col(text_col))
    )
    base = (
        df.where(F.col(tokens_col).isNotNull() if tokens_col else F.col(text_col).isNotNull())
        .select(
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
            F.col(id_col).cast("long").alias("doc_id"),
            tok.cast("long").alias("n_tokens"),
        )
    )
    cap = int(capacity)
    if split_overflow:
        # explode docs into chunk rows with pure Column math: chunk k of
        # ceil(n/cap) carries min(cap, n - k*cap) tokens
        n_chunks = F.greatest(
            F.lit(1).cast("long"), F.ceil(F.col("n_tokens") / F.lit(cap))
        )
        base = base.select(
            "shard",
            "doc_id",
            F.posexplode(F.sequence(F.lit(1), n_chunks)).alias("chunk_idx", "_one"),
            "n_tokens",
        ).select(
            "shard",
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.least(
                F.lit(cap).cast("long"),
                F.col("n_tokens") - F.col("chunk_idx") * cap,
            ).alias("n_tokens"),
        )
        # zero-token docs keep their single zero chunk
        base = base.withColumn(
            "n_tokens", F.greatest(F.lit(0).cast("long"), F.col("n_tokens"))
        )
    else:
        base = base.withColumn("chunk_idx", F.lit(0).cast("long")).select(
            "shard", "doc_id", "chunk_idx", "n_tokens"
        )

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "chunk_idx", "n_tokens"]).reset_index(
            drop=True
        )
        toks = pdf["n_tokens"].to_numpy(dtype=np.int64)
        n = len(toks)
        bin_id = np.zeros(n, dtype=np.int64)
        offset = np.zeros(n, dtype=np.int64)
        cur_bin, fill = 0, 0
        for i in range(n):
            t = int(toks[i])
            if fill > 0 and fill + t > cap:
                cur_bin += 1
                fill = 0
            bin_id[i] = cur_bin
            offset[i] = fill
            fill += t
        pdf["bin_id"] = bin_id
        pdf["bin_offset"] = offset
        pdf["overflow"] = toks > cap
        return pdf

    return base.groupBy("shard").applyInPandas(
        pack_one,
        schema=(
            "shard long, doc_id long, chunk_idx long, n_tokens long, "
            "bin_id long, bin_offset long, overflow boolean"
        ),
    )


def bin_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-bin utilization: (shard, bin_id, n_docs, tokens_used,
    fill_frac) — the padding-waste report of a packing run."""
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("tokens_used"),
        (F.sum("n_tokens") / F.lit(float(capacity))).alias("fill_frac"),
    )
