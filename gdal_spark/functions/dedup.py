"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup — the dedup ladder of a training-data pipeline.

Design:
- exact         : groupBy(md5(norm_text)) — one shuffle, SQL-oracle-able.
- ngram jaccard : exact Jaccard over character shingles via explode ->
                  pair join -> |A∩B| / (|A|+|B|-|A∩B|). Quadratic only
                  within shingle buckets; the LSH variants below are the
                  100 TB path.
- minhash LSH   : shingle -> 64-bit polynomial rolling hash (own hash, so
                  it is reproducible anywhere) -> k minhashes via the
                  (a*x+b) mod p family -> band buckets -> candidate pairs
                  join -> exact-jaccard verify. banding theory per the
                  standard MMDS construction.
- simhash       : 64-bit hyperplane-free sketch of token hash bits;
                  near-dup = hamming distance <= t. Pairing via 4-way
                  band blocking on 16-bit chunks (any pair within
                  distance t<=3 shares an exact chunk: pigeonhole).
- embedding     : cosine near-dup via random-hyperplane LSH buckets,
                  verified exactly (used by simsearch too).

All heavy lifting is DataFrame explode/groupBy/join — shuffles are on
small (hash, id) rows, never on full documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

from .text import norm_text

MERSENNE = (1 << 61) - 1


def _fnv1a(data: bytes) -> int:
    """64-bit FNV-1a — deterministic across processes (the builtin hash()
    is salted per interpreter, so it must never reach a shuffle key)."""
    h = 0xCBF29CE484222325
    for byte in data:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """Groups of byte-identical (after normalization) documents:
    (fp, n_dups, keep_id, dup_ids). keep = min id (deterministic).
    NULL-text rows are excluded — md5(NULL) is NULL and groupBy would
    otherwise collapse every image-only / failed-extraction record into
    one bogus duplicate cluster."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.md5(norm_text(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """Keep one row (min id) per normalized-text group. Implemented as a
    window-free groupBy + semi join (scales; no global sort). NULL-text
    rows are never duplicates of each other — they all pass through."""
    with_text = df.where(F.col(text_col).isNotNull())
    keep = (
        with_text.select(
            F.col(id_col).alias("_id"),
            F.md5(norm_text(F.col(text_col))).alias("_fp"),
        )
        .groupBy("_fp")
        .agg(F.min("_id").alias(id_col))
        .select(id_col)
    )
    return with_text.join(keep, id_col, "left_semi").unionByName(
        df.where(F.col(text_col).isNull())
    )


# ---------------------------------------------------------------------------
# shingles + own 64-bit hash (reproducible across engines / versions)
# ---------------------------------------------------------------------------


@F.pandas_udf(ArrayType(LongType()))
def _shingle_hashes_udf(texts: pd.Series, widths: pd.Series) -> pd.Series:
    """Distinct polynomial hashes of character shingles (Arrow-vectorized
    per batch; numpy rolling-hash per row — the per-row loop is over rows
    of the batch, the hash itself is vectorized over the string)."""
    out = []
    for text, k in zip(texts, widths):
        k = int(k)
        s = " ".join(str(text).lower().split())
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < k:
            out.append([int(_fnv1a(s.encode("utf-8")) & 0x7FFFFFFFFFFFFFFF)])
            continue
        base = np.uint64(1099511628211)
        # polynomial hash of every k-window as k vectorized multiply-adds
        # (k is small; wraparound mod 2^64 is intentional)
        n = len(b) - k + 1
        hs = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            hs = hs * base + b[j : j + n]
        vals = np.unique(hs & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        out.append(vals.tolist())
    return pd.Series(out)


def with_shingles(df: DataFrame, text_col: str = "text", k: int = 5, out: str = "shingles"):
    return df.withColumn(out, _shingle_hashes_udf(F.col(text_col), F.lit(k)))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (explode + pair join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.8,
):
    """All pairs with shingle-Jaccard >= threshold.

    explode(shingles) -> self equi-join on the shingle -> per-pair
    intersection count -> Jaccard. The shingle join key distributes; the
    |A| / |B| sizes come from a tiny per-doc side table."""
    # shingles computed ONCE: sizes + the explode + the two size joins
    # all read this persisted stage (the O(len*k) shingle hashing is the
    # most expensive part of the query — same lesson as minhash_lsh)
    sh = with_shingles(
        df.select(F.col(id_col).alias("id"), text_col), text_col, k
    ).select("id", F.col("shingles")).persist()
    sizes = sh.select("id", F.size("shingles").alias("sz"))
    ex = sh.select("id", F.explode("shingles").alias("s"))
    a = ex.withColumnRenamed("id", "id_a")
    b = ex.withColumnRenamed("id", "id_b")
    inter = (
        a.join(b, "s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # materialize the result and release the shingle cache eagerly (same
    # discipline as minhash_lsh_pairs) so storage blocks don't linger in
    # long sessions waiting for the periodic driver GC
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def _minhash_params(num_hashes: int, seed: int = 42):
    """(a, b) for h_i(x) = (a*x + b) mod (2^61-1) with x masked to 31 bits
    and a < 2^30 — every product fits in uint64, so the whole hash family
    evaluates as one vectorized numpy expression (no bignum objects)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 30, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_hashes, dtype=np.uint64)
    return a, b


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 128,
    seed: int = 42,
    out: str = "minhash",
):
    sh = with_shingles(df, text_col, k)
    return sh.withColumn(
        out, _minhash_udf(num_hashes, seed)(F.col("shingles"))
    ).drop("shingles")


def _minhash_udf(num_hashes: int, seed: int):
    """Pandas UDF shingle-array -> minhash signature (shared by
    with_minhash and the shingle-reusing path in minhash_lsh_pairs)."""
    a_arr, b_arr = _minhash_params(num_hashes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def mh(shingles: pd.Series) -> pd.Series:
        A = a_arr[:, None]  # (H, 1) uint64
        B = b_arr[:, None]
        p = np.uint64(MERSENNE)
        res = []
        for sh in shingles:
            x = np.asarray(sh, dtype=np.uint64) & np.uint64(0x7FFFFFFF)
            if len(x) == 0:
                res.append([0] * len(a_arr))
                continue
            hs = (A * x[None, :] + B) % p  # (H, n), no overflow by design
            res.append(hs.min(axis=1).astype(np.int64).tolist())
        return pd.Series(res)

    return mh


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    verify: bool = True,
    seed: int = 42,
    est_margin: float = 0.15,
):
    """Candidate pairs whose minhash signatures collide in >=1 of `bands`
    bands (rows-per-band = num_hashes // bands), optionally verified with
    exact shingle Jaccard. The band bucket id is the join key — this is
    the standard LSH banding scheme; s-curve threshold ~ (1/b)^(1/r).
    ``est_margin`` widens the signature-agreement prefilter (est >=
    threshold - est_margin): raise it when recall matters more than the
    prefilter's cull rate (est ~ Binomial(num_hashes, J)/num_hashes, so
    a margin of k*sqrt(J(1-J)/num_hashes) keeps k-sigma dips)."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # shingles computed ONCE and persisted: the signature stage and the
    # exact-Jaccard verify stage both read this (the r2 bench showed the
    # double shingle pass as the query's main avoidable cost)
    sh_df = with_shingles(
        df.select(F.col(id_col).alias("id"), text_col), text_col, k
    ).select("id", "shingles")
    sh_df = sh_df.persist()
    mh = sh_df.select(
        "id",
        F.size("shingles").alias("n_sh"),
        _minhash_udf(num_hashes, seed)(F.col("shingles")).alias("minhash"),
    )
    mh = mh.persist()
    banded = mh.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.hash(*[F.col("minhash")[bi * r + j] for j in range(r)]).alias(
                            "bucket"
                        ),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.withColumnRenamed("id", "id_a")
    b = banded.withColumnRenamed("id", "id_b")
    cands = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    # NOTE: the exact size-ratio cut lives in the est stage below, NOT in
    # the band join — carrying n_sh through the bands-way explode widens
    # every banded row and was A/B-measured SLOWER (9.1-9.6s vs 7.3-7.6s
    # interleaved at sf0.1) than attaching sizes once per candidate pair.
    if not verify:
        cands = cands.localCheckpoint(eager=True)
        mh.unpersist()
        sh_df.unpersist()
        return cands
    # two-stage verify, both linear in |candidates| (never the all-pairs
    # shingle join, which explodes on shared-vocabulary corpora):
    # 1. signature-agreement estimate (64 longs per side, cheap zip_with)
    #    PLUS two EXACT set-size bounds — J >= t forces
    #    |sh_a|/|sh_b| in [t, 1/t] (since n_inter <= min and
    #    union >= max) — culling before any shingle array moves,
    # 2. exact shingle Jaccard only on the survivors.
    # The verify joins attach per-doc arrays to CANDIDATE PAIRS, and the
    # verify stage dominated this query's wall time when the corpus has
    # large near-dup clusters (pairs are quadratic in cluster size; at
    # sf0.1 ~772k pairs survived the est-only prefilter for 256 final
    # pairs — 3000x more verify work than output). The size-ratio cut is
    # exact (zero recall loss) and int-column-only, so the array-bearing
    # join downstream sees orders of magnitude fewer pairs.
    # NOTE: an explicit broadcast hint on the doc side was A/B-measured
    # SLOWER than letting Catalyst/AQE choose (20-25s vs 15.5s at sf0.1,
    # interleaved runs) — leave join selection to the optimizer.
    sig = mh
    est = (
        cands.join(
            sig.select(
                F.col("id").alias("id_a"),
                F.col("minhash").alias("mh_a"),
                F.col("n_sh").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sig.select(
                F.col("id").alias("id_b"),
                F.col("minhash").alias("mh_b"),
                F.col("n_sh").alias("n_b"),
            ),
            "id_b",
        )
        # exact bound first (cheap int compare, no array touch): J >= t
        # requires t*n_b <= n_a and t*n_a <= n_b
        .where(
            (F.col("n_a") >= F.lit(float(threshold)) * F.col("n_b"))
            & (F.col("n_b") >= F.lit(float(threshold)) * F.col("n_a"))
        )
        .withColumn(
            "est",
            F.size(
                F.filter(
                    F.zip_with("mh_a", "mh_b", lambda a, b: a == b),
                    lambda v: v,
                )
            )
            / F.lit(float(num_hashes)),
        )
        .where(F.col("est") >= threshold - est_margin)
        .select("id_a", "id_b")
    )
    sets = sh_df  # persisted shingles from the signature stage
    verified = (
        est.join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # materialize the (small) verified pair set so the signature cache can
    # be released immediately — long sessions must not accumulate storage
    verified = verified.localCheckpoint(eager=True)
    mh.unpersist()
    sh_df.unpersist()
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


@F.pandas_udf(LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = str(t).lower().split()
        if not toks:
            out[i] = 0
            continue
        hs = np.array(
            [np.uint64(_fnv1a(w.encode("utf-8"))) for w in set(toks)],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = (bits * 2 - 1).sum(axis=0)
        sig = np.uint64(0)
        for bit in range(64):
            if v[bit] > 0:
                sig |= np.uint64(1) << np.uint64(bit)
        # full 64-bit signature, stored as two's-complement int64 so bit 63
        # participates in the hamming distance
        s = int(sig)
        out[i] = s - (1 << 64) if s >= (1 << 63) else s
    return pd.Series(out)


def with_simhash(df: DataFrame, text_col: str = "text", out: str = "simhash"):
    """64-bit SimHash over FNV-1a token hashes (deterministic everywhere;
    stored as two's-complement int64)."""
    return df.withColumn(out, _simhash_udf(F.col(text_col)))


def _hamming_chunk_plan(max_hamming: int, n_chunks: int | None, max_tables: int = 32):
    """Pick the chunk count m and enumerate the (m-d)-subset tables for
    permuted multi-table blocking (Manku/Jain/Sarma WWW'07 construction).

    A pair within hamming distance d differs in at most d chunks, so it
    agrees on >= m-d chunks and therefore shares at least one of the
    C(m, d) keys made of (m-d) chunk values. Wider keys (larger m) mean
    exponentially fewer bucket collisions at the cost of C(m, d) tables
    of replication; m = 2d gives exactly 32-bit keys, capped so the
    table count stays <= max_tables."""
    from itertools import combinations
    from math import comb

    d = max_hamming
    if n_chunks is None:
        m = 2 * d
        while m > d + 1 and comb(m, d) > max_tables:
            m -= 1
        m = max(m, d + 1)
    else:
        m = n_chunks
    if not (d < m <= 64):
        raise ValueError("need max_hamming < n_chunks <= 64")
    bounds = [round(64 * i / m) for i in range(m + 1)]
    tables = list(combinations(range(m), m - d))
    return bounds, tables


def hamming_pairs(
    sigs: DataFrame,
    id_col: str = "id",
    sig_col: str = "sig",
    max_hamming: int = 3,
    n_chunks: int | None = None,
    salt: int = 1,
):
    """Generic near-dup pairs over ANY int64 signature column by hamming
    distance <= max_hamming, via permuted multi-table pigeonhole
    blocking: the 64 bits split into m chunks and every (m - d)-chunk
    combination becomes an equi-join key (hashed to one 64-bit value —
    hash collisions only add candidates, never lose pairs). With the
    default m = min(2d, table-capped), d=3 keys span 32 bits across 20
    tables (vs the naive d+1-chunk scheme's 16-bit keys, whose 65k
    buckets go quadratic at ~10^9 signatures). Works for SimHash text
    signatures and perceptual image hashes (``phash``) alike.

    ``salt`` > 1 spreads each bucket's quadratic candidate work over
    salt^2 tasks (left side replicates on salt_b, right on salt_a), for
    corpora with pathological buckets (e.g. a constant chunk across the
    whole corpus). Exact: every pair still meets exactly once per table.
    """
    bounds, tables = _hamming_chunk_plan(max_hamming, n_chunks)

    def chunk_val(ci):
        return F.shiftrightunsigned(F.col("simhash"), bounds[ci]).bitwiseAND(
            F.lit((1 << (bounds[ci + 1] - bounds[ci])) - 1)
        )

    sh = sigs.select(F.col(id_col).alias("id"), F.col(sig_col).alias("simhash"))
    keyed = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ti).alias("tbl"),
                        F.hash(*[chunk_val(ci) for ci in combo]).alias("key"),
                    )
                    for ti, combo in enumerate(tables)
                ]
            )
        ).alias("tk"),
    ).select("id", "simhash", "tk.tbl", "tk.key")
    join_keys = ["tbl", "key"]
    if salt > 1:
        s_lit = F.lit(salt)
        own = F.pmod(F.xxhash64("id"), s_lit)
        other = F.explode(F.sequence(F.lit(0), s_lit - 1))
        a_side = keyed.select(
            F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"),
            "tbl", "key", own.alias("salt_a"), other.alias("salt_b"),
        )
        b_side = keyed.select(
            F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"),
            "tbl", "key", other.alias("salt_a"), own.alias("salt_b"),
        )
        join_keys = join_keys + ["salt_a", "salt_b"]
    else:
        a_side = keyed.select(
            F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"), "tbl", "key"
        )
        b_side = keyed.select(
            F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"), "tbl", "key"
        )
    pairs = (
        a_side.join(b_side, join_keys)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
):
    """Near-dup pairs by SimHash hamming distance (the text front-end of
    :func:`hamming_pairs`)."""
    sh = with_simhash(df.select(F.col(id_col).alias("id"), text_col), text_col)
    return hamming_pairs(sh, id_col="id", sig_col="simhash", max_hamming=max_hamming)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_repetitions: int = 6,
    seed: int = 42,
    dim: int | None = None,
    exact: bool = False,
):
    """Pairs with cosine similarity >= threshold.

    exact=True: all-pairs via a self-join (oracle / small inputs).
    exact=False: random-hyperplane LSH with OR-amplification —
    ``n_repetitions`` independent ``n_planes``-bit sign signatures; a pair
    is a candidate if it agrees on ALL planes of >= 1 repetition, then
    verified exactly. Expected recall for true cosine s:
    1 - (1 - p^n_planes)^n_repetitions with p = 1 - acos(s)/pi
    (defaults: s=0.95 -> p~0.899 -> ~0.965 recall). One equi-join shuffle
    on (rep, bucket), never a cross join."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if exact:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
        return _with_cosine(pairs).where(F.col("cosine") >= threshold).select(
            "id_a", "id_b", "cosine"
        )

    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).limit(1).collect()
        dim = int(first[0].d) if first else 0
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.normal(size=(n_repetitions, n_planes, dim))

    reps = []
    for rep in range(n_repetitions):
        sig = None
        for p in range(n_planes):
            dot = _dot_literal(F.col("v"), planes[rep, p])
            bit = F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))
            sig = bit if sig is None else sig * 2 + bit
        reps.append(F.struct(F.lit(rep).alias("rep"), sig.alias("bucket")))
    # ids ONLY through the bucket join: the vectors would otherwise be
    # replicated n_repetitions times on both sides of the shuffle and
    # again through dropDuplicates; the deduped pair list re-attaches
    # each vector exactly once for the verify stage (same shape as the
    # minhash verify)
    bucketed = base.select(
        "id", F.explode(F.array(*reps)).alias("rb")
    ).select("id", "rb.rep", "rb.bucket")
    a = bucketed.select(F.col("id").alias("id_a"), "rep", "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), "rep", "bucket")
    cand_ids = (
        a.join(b, ["rep", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cands = cand_ids.join(
        base.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a"
    ).join(
        base.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b"
    )
    return _with_cosine(cands).where(F.col("cosine") >= threshold).select(
        "id_a", "id_b", "cosine"
    )


def _dot_literal(vec, plane: np.ndarray):
    """Dot product of an array column with a literal vector, as column math
    (zip_with + aggregate stay JVM-side)."""
    lit = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _with_cosine(pairs: DataFrame) -> DataFrame:
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform("va", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform("vb", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return pairs.withColumn("cosine", dot / (na * nb))


def dedup_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    embeddings: DataFrame | None = None,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    jaccard_threshold: float = 0.8,
    semantic_threshold: float = 0.95,
    n_clusters: int = 8,
    seed: int = 42,
    minhash_kw: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The composed dedup LADDER of a training-data pipeline, each rung
    cheaper-per-candidate than the next: exact (md5 groupBy) -> MinHash
    LSH near-dup clusters -> optional SemDeDup over embeddings of the
    survivors. Returns (kept_docs, report) where report is (id, stage)
    for every DROPPED doc, stage in {'exact', 'near', 'semantic'}.

    Each stage only sees the previous stage's survivors, so the
    expensive rungs run on a shrinking corpus (the production ordering).
    ``embeddings`` ids must share the doc id space (vec_id == doc_id);
    pass None to skip the semantic rung. NULL-text docs pass through
    (never duplicates of each other)."""
    with_text = docs.where(F.col(text_col).isNotNull())

    # rung 1: exact — drop everything but the min-id of each md5 group
    groups = exact_duplicates(docs, id_col, text_col)
    exact_drops = (
        groups.select(F.explode("dup_ids").alias("id"), "keep_id")
        .where(F.col("id") != F.col("keep_id"))
        .select("id")
        .localCheckpoint(eager=True)
    )
    s1 = with_text.join(
        exact_drops.withColumnRenamed("id", id_col), id_col, "left_anti"
    )

    # rung 2: MinHash-LSH pairs -> connected clusters -> keep reps
    # (minhash_kw tunes num_hashes/bands/est_margin — e.g. 64/32/0.3 for
    # the near-exact-recall configuration the oracle entries pin)
    pairs = minhash_lsh_pairs(
        s1, id_col, text_col, threshold=jaccard_threshold, seed=seed,
        **(minhash_kw or {}),
    )
    labels = dup_clusters(pairs)
    near_drops = labels.where(~F.col("keep")).select("id").localCheckpoint(
        eager=True
    )
    s2 = s1.join(near_drops.withColumnRenamed("id", id_col), id_col, "left_anti")

    drops = [
        exact_drops.select("id", F.lit("exact").alias("stage")),
        near_drops.select("id", F.lit("near").alias("stage")),
    ]
    kept = s2
    if embeddings is not None:
        emb2 = embeddings.join(
            s2.select(F.col(id_col).alias(vec_id_col)), vec_id_col, "left_semi"
        )
        sem_pairs = semantic_dedup_pairs(
            emb2, semantic_threshold, n_clusters, vec_id_col, vec_col,
            seed=seed,
        )
        sem_drops = (
            sem_pairs.select(F.col("id_b").alias("id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        kept = s2.join(
            sem_drops.withColumnRenamed("id", id_col), id_col, "left_anti"
        )
        drops.append(sem_drops.select("id", F.lit("semantic").alias("stage")))

    kept = kept.unionByName(docs.where(F.col(text_col).isNull()))
    report = drops[0]
    for d in drops[1:]:
        report = report.unionByName(d)
    return kept, report


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.85,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540 — public recipe): k-means cluster the embedding
    space, then compare vectors ONLY within their cluster; a pair with
    cosine >= threshold is a semantic duplicate. Returns
    (cluster, id_a, id_b, cosine) with id_a < id_b.

    100-TB posture: centroid training is the bounded-sample driver
    k-means shared with IVF (simsearch.train_ivf_centroids); assignment
    is ONE Arrow pass (a matmul per batch against the broadcast centroid
    matrix); the pair join shuffles narrow (cluster, id, vec) rows once
    and is quadratic only WITHIN a cluster — the paper's shape, where
    n_clusters grows with the corpus (they use ~10^5) so clusters stay
    bounded. Approximation is the clustering itself: a cross-cluster
    near-dup pair is missed by construction (documented SemDeDup
    behavior), which is why the oracle passes the same centroids and
    re-derives the assignment rather than comparing to all-pairs."""
    from .simsearch import train_ivf_centroids, _unit_rows

    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec_col, n_clusters, seed=seed)
    C = np.asarray(centroids, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["cluster", "id", "v"])
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = _unit_rows(M)
            cid = np.argmax(Mn @ C.T, axis=1)
            yield pd.DataFrame(
                {"cluster": cid.astype(np.int64), "id": pdf[id_col], "v": pdf[vec_col]}
            )

    id_type = corpus.schema[id_col].dataType.simpleString()
    vec_type = corpus.schema[vec_col].dataType.simpleString()
    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign, schema=f"cluster long, id {id_type}, v {vec_type}"
    )
    # both join sides read the assignment: materialize it ONCE (eager
    # local checkpoint, the minhash convention) so the Arrow assign pass
    # and the corpus scan don't run twice
    assigned = assigned.localCheckpoint(eager=True)
    a = assigned.select("cluster", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = assigned.select("cluster", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, "cluster").where(F.col("id_a") < F.col("id_b"))
    return (
        _with_cosine(pairs)
        .where(F.col("cosine") >= threshold)
        .select("cluster", "id_a", "id_b", "cosine")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.85,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "lowest_id",
    **kw,
) -> DataFrame:
    """Rows that SURVIVE semantic dedup.

    keep='lowest_id' (default): drop every vector that has a LOWER-id
    neighbor with cosine >= threshold in its cluster — one left-anti
    join against the distinct drop set, no group resolution needed.

    keep='low_centroid_sim': the PAPER's rule (SemDeDup §3: within each
    duplicate group keep the example with LOWEST cosine similarity to
    its cluster centroid — the least prototypical one). Groups are the
    connected components of the pair graph (distributed cc via
    dup_clusters); the representative per group is argmin centroid
    similarity with id as the deterministic tie-break."""
    pairs = semantic_dedup_pairs(
        corpus, threshold, n_clusters, id_col, vec_col, **kw
    )
    if keep == "lowest_id":
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return corpus.join(drop, id_col, "left_anti")
    if keep != "low_centroid_sim":
        raise ValueError(
            f"keep must be 'lowest_id' or 'low_centroid_sim', got {keep!r}"
        )
    from pyspark.sql.window import Window

    from .simsearch import _unit_rows, train_ivf_centroids

    centroids = kw.get("centroids")
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col, n_clusters, seed=kw.get("seed", 42)
        )
    C = np.asarray(centroids, dtype=np.float64)

    def csim(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["id", "csim"])
                continue
            M = _unit_rows(np.array(list(pdf[vec_col]), dtype=np.float64))
            sims = M @ C.T
            yield pd.DataFrame(
                {"id": pdf[id_col], "csim": sims.max(axis=1)}
            )

    id_type = corpus.schema[id_col].dataType.simpleString()
    sims = corpus.select(id_col, vec_col).mapInPandas(
        csim, schema=f"id {id_type}, csim double"
    )
    labels = dup_clusters(pairs)  # (id, cluster, keep-by-min-id)
    ranked = labels.join(sims, "id").withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("cluster").orderBy(
                F.col("csim").asc(), F.col("id").asc()
            )
        ),
    )
    drop = ranked.where(F.col("_rk") > 1).select(F.col("id").alias(id_col))
    return corpus.join(drop, id_col, "left_anti")


def dup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Resolve duplicate PAIRS into duplicate CLUSTERS: distributed
    connected components over the pair graph (reuses the min-label
    propagation + pointer doubling of operators.polygonize.cc_labels —
    nothing proportional to the edge count touches the driver). Output:
    one row per doc that appears in any pair — (id, cluster, keep) where
    cluster is the component-minimum doc id and keep marks the canonical
    representative. Docs in no pair are implicitly kept (left-anti join
    this table to drop duplicates from the corpus)."""
    from ..operators.polygonize import cc_labels

    for col in (id_a, id_b):
        if not isinstance(pairs.schema[col].dataType, (LongType, IntegerType)):
            # cast('long') on a non-numeric id (e.g. 'doc-0012') yields
            # NULL silently and the CC propagates garbage — fail loudly;
            # hash or dictionary-encode string ids upstream instead
            raise TypeError(
                f"dup_clusters needs integer ids; {col} is "
                f"{pairs.schema[col].dataType.simpleString()}"
            )
    edges = pairs.select(
        F.col(id_a).cast("long").alias("key"), F.col(id_b).cast("long").alias("key_b")
    )
    labels = cc_labels(edges)
    return labels.select(
        F.col("key").alias("id"),
        F.col("gkey0").alias("cluster"),
        (F.col("key") == F.col("gkey0")).alias("keep"),
    )
