"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      : exact brute-force top-k — the baseline. Queries
  are broadcast; each corpus partition computes its local top-k with one
  numpy matmul (Arrow batch in, (k x nq) out), then a tiny global top-k
  reduce. The shuffle carries only per-partition candidates (k*nq rows),
  never the corpus — the map-side partial top-k pattern.
- ``lsh_topk``         : random-hyperplane bucketed approximate variant —
  the 100 TB path: probe only buckets within `probe_hamming` of the
  query's signature, so the scan is a partition-pruned equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _unit_rows(M: np.ndarray) -> np.ndarray:
    """Row-normalize; zero-norm rows (which have no direction) divide by
    1 instead of 0 so they score cosine 0 against everything rather than
    poisoning results with NaN."""
    n = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.where(n == 0.0, 1.0, n)


def cosine_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]] | DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    queries: [(qid, vector), ...] (small, broadcast inside the UDF
    closure) or a DataFrame with (qid, vector) to collect first.
    Returns (qid, vec_id, cosine, rank)."""
    if isinstance(queries, DataFrame):
        queries = [(r[0], list(r[1])) for r in queries.collect()]
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    Q = np.array([q[1] for q in queries], dtype=np.float64)
    Qn = _unit_rows(Q)

    schema = "qid long, vec_id long, cosine double"

    def partial(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(M) == 0:
                yield pd.DataFrame(columns=["qid", "vec_id", "cosine"])
                continue
            Mn = _unit_rows(M)
            sims = Mn @ Qn.T  # (n, nq)
            kk = min(k, len(ids))
            # local top-k per query via partition (no full sort) — keep
            # ALL rows tied with the kk-th score so the global
            # (cosine desc, vec_id asc) window sees every tied candidate
            # and the result never depends on partition row order
            thresh = -np.partition(-sims, kk - 1, axis=0)[kk - 1]  # (nq,)
            ridx, qidx = np.nonzero(sims >= thresh[None, :])
            rows = {
                "qid": qids[qidx],
                "vec_id": ids[ridx],
                "cosine": sims[ridx, qidx],
            }
            yield pd.DataFrame(rows)

    partials = corpus.select(id_col, vec_col).mapInPandas(partial, schema=schema)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def with_lsh_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    dim: int | None = None,
    out: str = "bucket",
):
    """Random-hyperplane signature as column math (JVM-side aggregate over
    zip_with; no Python in the scan)."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).limit(1).collect()
        dim = int(first[0].d)
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.normal(size=(n_planes, dim))
    sig = None
    for p in range(n_planes):
        lit = F.array(*[F.lit(float(x)) for x in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        sig = bit if sig is None else sig * 2 + bit
    return df.withColumn(out, sig), planes


def train_kmeans_distributed(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 12,
    seed: int = 42,
    init_sample: int = 4096,
    init: np.ndarray | None = None,
) -> np.ndarray:
    """DISTRIBUTED Lloyd's k-means on the FULL corpus (spherical — rows
    are L2-normalized, assignment by max cosine, centroids re-normalized
    each round): the 100-TB trainer VERDICT r4 task #7 asks for, for
    when a sampled quantizer is not representative enough.

    Each iteration is ONE Arrow pass over the vectors: every batch
    computes its (k x dim) partial sum matrix + k counts, the shuffle
    carries only those tiny partials (k rows per partition, never a
    vector row), and the driver folds them into new centroids —
    map-side-combine k-means, the classic MLlib shape re-expressed over
    mapInPandas. Initialization is seeded k-means++ on a bounded sample
    (``init_sample``; or pass ``init`` explicitly). Deterministic for a
    given corpus/seed/partitioning; across DIFFERENT partitionings the
    per-cluster partial sums fold in a different float order, so
    centroids can drift by ~1 ulp (assignments are argmax over well-
    separated scores and stay identical in practice — the parity test
    pins 1-partition vs 8-partition equality to 1e-12).

    Returns (k, dim) L2-normalized centroids. Same fixed point as local
    full-data Lloyd from the same init (tests pin parity)."""
    if init is not None:
        C = np.asarray(init, dtype=np.float64).copy()
        k = len(C)
    else:
        C = train_ivf_centroids(
            corpus, vec_col, k, sample=init_sample, iters=0, seed=seed
        )
    vecs = corpus.select(vec_col).persist()
    try:
        dim = C.shape[1]

        def partials_factory(C_now):
            def partials(batches):
                sums = np.zeros((k, dim), dtype=np.float64)
                counts = np.zeros(k, dtype=np.int64)
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    M = _unit_rows(
                        np.array(list(pdf[vec_col]), dtype=np.float64)
                    )
                    a = np.argmax(M @ C_now.T, axis=1)
                    np.add.at(sums, a, M)
                    counts += np.bincount(a, minlength=k)
                yield pd.DataFrame(
                    {
                        "cluster": np.arange(k, dtype=np.int64),
                        "cnt": counts,
                        "s": list(sums),
                    }
                )

            return partials

        for _ in range(iters):
            rows = (
                vecs.mapInPandas(
                    partials_factory(C.copy()),
                    schema="cluster long, cnt long, s array<double>",
                )
                .collect()
            )
            sums = np.zeros((k, dim), dtype=np.float64)
            counts = np.zeros(k, dtype=np.int64)
            # fold per-partition partials in (partition order agnostic:
            # addition per cluster cell is the only reduction)
            for r in sorted(rows, key=lambda r: r.cluster):
                sums[r.cluster] += np.asarray(r.s, dtype=np.float64)
                counts[r.cluster] += r.cnt
            for j in range(k):
                if counts[j]:
                    v = sums[j] / counts[j]
                    n = np.linalg.norm(v)
                    if n > 0:
                        C[j] = v / n
        return C
    finally:
        vecs.unpersist()


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    sample: int = 4096,
    iters: int = 12,
    seed: int = 42,
) -> np.ndarray:
    """IVF coarse quantizer: Lloyd's k-means on a bounded driver-side
    SAMPLE (the standard IVF training recipe — centroids come from a
    sample, assignment is distributed; for full-corpus training use
    ``train_kmeans_distributed``). Deterministic: seeded k-means++
    init, fixed iteration count. Returns (n_lists, dim) L2-normalized
    centroids."""
    rows = corpus.select(vec_col).limit(sample).collect()
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    Xn = _unit_rows(X)
    rng = np.random.Generator(np.random.PCG64(seed))
    # k-means++ init on cosine distance
    cents = [Xn[rng.integers(len(Xn))]]
    for _ in range(n_lists - 1):
        d = 1.0 - np.max(np.stack([Xn @ c for c in cents]), axis=0)
        d = np.clip(d, 0, None)
        p = d / d.sum() if d.sum() > 0 else np.full(len(Xn), 1.0 / len(Xn))
        cents.append(Xn[rng.choice(len(Xn), p=p)])
    C = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                v = Xn[m].mean(axis=0)
                n = np.linalg.norm(v) or 1.0
                if n > 0:
                    C[j] = v / n
    return C


def ivf_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k — the inverted-list ANN path: every corpus
    vector is assigned to its nearest centroid (one Arrow pass, a single
    matmul per batch), each query probes its ``nprobe`` nearest lists,
    and exact cosine re-ranks the candidates. ``nprobe == n_lists`` is
    exhaustive and equals the brute-force answer (the oracle setting);
    smaller nprobe trades recall for scanning only nprobe/n_lists of the
    corpus. Same output schema as cosine_topk."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec_col, n_lists, seed=seed)
    C = np.asarray(centroids, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["list_id", id_col, vec_col])
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = _unit_rows(M)
            lid = np.argmax(Mn @ C.T, axis=1)
            out = pdf[[id_col, vec_col]].copy()
            out.insert(0, "list_id", lid.astype(np.int64))
            yield out

    # re-emit the id/vector columns with their ORIGINAL types — a
    # hardcoded array<float> schema would silently truncate
    # array<double> embeddings before the exact re-rank
    id_type = corpus.schema[id_col].dataType.simpleString()
    vec_type = corpus.schema[vec_col].dataType.simpleString()
    listed = corpus.select(id_col, vec_col).mapInPandas(
        assign,
        schema=f"list_id long, {id_col} {id_type}, {vec_col} {vec_type}",
    )

    Q = np.array([q[1] for q in queries], dtype=np.float64)
    Qn = _unit_rows(Q)
    order = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]
    probe_rows = [
        (int(qid), int(lst))
        for (qid, _), lists in zip(queries, order)
        for lst in lists
    ]
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, "qid long, list_id long")
    cand = listed.join(F.broadcast(probes), "list_id")

    qmap = {int(qid): np.asarray(v, dtype=np.float64) for qid, v in queries}

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["qid", "vec_id", "cosine"])
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = _unit_rows(M)
            sims = np.empty(len(pdf))
            for qid in pdf["qid"].unique():
                m = (pdf["qid"] == qid).to_numpy()
                qv = qmap[int(qid)]
                qn = np.linalg.norm(qv)
                qv = qv / (qn if qn else 1.0)
                sims[m] = Mn[m] @ qv
            yield pd.DataFrame(
                {"qid": pdf["qid"], "vec_id": pdf[id_col], "cosine": sims}
            )

    scored = cand.select("qid", id_col, vec_col).mapInPandas(
        score, schema="qid long, vec_id long, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    probe_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: scan only corpus buckets whose signature is
    within ``probe_hamming`` bits of the query signature (multi-probe
    LSH). Returns the same schema as cosine_topk; recall < 1 by design."""
    bucketed, planes = with_lsh_signature(corpus, vec_col, n_planes, seed)
    Q = np.array([q[1] for q in queries], dtype=np.float64)
    qsig = ((Q @ planes.T) >= 0).astype(np.int64)
    weights = 2 ** np.arange(n_planes - 1, -1, -1)

    # probe set per query: own bucket + all buckets within hamming radius
    from itertools import combinations

    probe_rows = []
    for (qid, _), sig in zip(queries, qsig):
        base = int((sig * weights).sum())
        buckets = {base}
        for r in range(1, probe_hamming + 1):
            for flip in combinations(range(n_planes), r):
                b = base
                for f in flip:
                    b ^= int(weights[n_planes - 1 - f])
                buckets.add(b)
        probe_rows.extend((qid, b) for b in buckets)
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, "qid long, bucket long")
    cand = bucketed.join(F.broadcast(probes), "bucket")
    # exact cosine on the candidates only
    qmap = {qid: np.asarray(v, dtype=np.float64) for qid, v in queries}

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["qid", "vec_id", "cosine"])
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = _unit_rows(M)
            sims = np.empty(len(pdf))
            for qid in pdf["qid"].unique():
                m = (pdf["qid"] == qid).to_numpy()
                qv = qmap[int(qid)]
                qn = np.linalg.norm(qv)
                qv = qv / (qn if qn else 1.0)
                sims[m] = Mn[m] @ qv
            yield pd.DataFrame(
                {"qid": pdf["qid"], "vec_id": pdf[id_col], "cosine": sims}
            )

    scored = cand.select("qid", id_col, vec_col).mapInPandas(
        score, schema="qid long, vec_id long, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-compressed ANN (ADC scan)
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    sample: int = 4096,
    iters: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace Lloyd's k-means codebooks (the standard PQ training
    recipe: bounded driver-side sample, distributed encoding). Vectors
    are L2-normalized first so ADC inner products are cosines. Returns
    (m, 2^nbits, dim/m)."""
    k = 1 << nbits
    rows = corpus.select(vec_col).limit(sample).collect()
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    X = _unit_rows(X)
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.Generator(np.random.PCG64(seed))
    books = np.zeros((m, k, dsub))
    for sub in range(m):
        S = X[:, sub * dsub : (sub + 1) * dsub]
        # k-means++ init (L2)
        cents = [S[rng.integers(n)]]
        for _ in range(k - 1):
            d2 = np.min(
                ((S[:, None, :] - np.stack(cents)[None, :, :]) ** 2).sum(-1), axis=1
            )
            s = d2.sum()
            p = d2 / s if s > 0 else np.full(n, 1.0 / n)
            cents.append(S[rng.choice(n, p=p)])
        C = np.stack(cents)
        for _ in range(iters):
            a = np.argmin(((S[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1)
            for j in range(k):
                msk = a == j
                if msk.any():
                    C[j] = S[msk].mean(axis=0)
        books[sub] = C
    return books


def exact_pq_codebooks(corpus: DataFrame, vec_col: str = "embedding", m: int = 8):
    """ORACLE-GATED variant: codebooks = every distinct subvector of the
    (normalized) corpus, so quantization error is exactly zero and
    pq_topk == cosine_topk bit-for-bit in score space. Collects the
    corpus — small-SF correctness harness only, never the scale path."""
    rows = corpus.select(vec_col).collect()
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    X = _unit_rows(X)
    d = X.shape[1]
    dsub = d // m
    books = []
    for sub in range(m):
        books.append(np.unique(X[:, sub * dsub : (sub + 1) * dsub], axis=0))
    kmax = max(len(b) for b in books)
    out = np.zeros((m, kmax, dsub))
    for sub, b in enumerate(books):
        out[sub, : len(b)] = b
        out[sub, len(b) :] = b[-1]  # pad with copies (never argmin-unique)
    return out


def ivfpq_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 8,
    nprobe: int = 4,
    m: int = 8,
    nbits: int = 8,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    by_residual: bool = False,
    seed: int = 42,
) -> DataFrame:
    """FAISS-style IVF-PQ (the combined scale path of the ANN ladder):
    ONE Arrow pass assigns every corpus vector to its nearest coarse
    centroid AND PQ-encodes it (d floats -> m codes); only the (list_id,
    id, codes) rows ever reach a shuffle — the raw vectors never leave
    the scan, which is the 10^12-row memory story (m bytes/row touched,
    nprobe/n_lists of the corpus scanned per query).

    ``by_residual=False`` (default) encodes vectors DIRECTLY: with
    ``nprobe == n_lists`` and exact_pq_codebooks the ADC scores equal
    exact cosines, so the output EQUALS brute force — the oracle
    setting. ``by_residual=True`` is the FAISS default at scale: PQ
    encodes x - centroid(list), and scoring adds the per-(query, list)
    q.centroid constant to the LUT sum — residuals are tighter than raw
    vectors, so the same m bytes quantize finer (higher recall), at the
    cost of the zero-error oracle trick (recall is asserted in tests
    instead). Scoring = per-query (m, k) LUT gathers + the same
    tie-preserving partial top-k as pq_topk/cosine_topk."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec_col, n_lists, seed=seed)
    C = np.asarray(centroids, dtype=np.float64)
    if codebooks is None:
        if by_residual:
            codebooks = _train_residual_codebooks(
                corpus, C, vec_col, m, nbits, seed=seed
            )
        else:
            codebooks = train_pq_codebooks(corpus, vec_col, m, nbits, seed=seed)
    B = np.asarray(codebooks, dtype=np.float64)
    m_, _kk, dsub = B.shape

    def assign_encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["list_id", "id", "codes"])
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = _unit_rows(M)
            lid = np.argmax(Mn @ C.T, axis=1)
            X = Mn - C[lid] if by_residual else Mn
            codes = np.empty((len(Mn), m_), dtype=np.int32)
            for sub in range(m_):
                S = X[:, sub * dsub : (sub + 1) * dsub]
                half = 0.5 * (B[sub] ** 2).sum(axis=1)
                codes[:, sub] = np.argmax(S @ B[sub].T - half[None, :], axis=1)
            yield pd.DataFrame(
                {
                    "list_id": lid.astype(np.int64),
                    "id": pdf[id_col],
                    "codes": list(codes),
                }
            )

    id_type = corpus.schema[id_col].dataType.simpleString()
    encoded = corpus.select(id_col, vec_col).mapInPandas(
        assign_encode, schema=f"list_id long, id {id_type}, codes array<int>"
    )

    Q = np.array([q[1] for q in queries], dtype=np.float64)
    Qn = _unit_rows(Q)
    order = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]
    probe_rows = [
        (int(qid), int(lst))
        for (qid, _), lists in zip(queries, order)
        for lst in lists
    ]
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, "qid long, list_id long")
    cand = encoded.join(F.broadcast(probes), "list_id")

    qids = np.array([q[0] for q in queries], dtype=np.int64)
    lut = np.einsum("qsd,skd->qsk", Qn.reshape(len(Qn), m_, dsub), B)
    qc = Qn @ C.T  # (nq, n_lists): the q.centroid constant per list
    qpos = {int(q): i for i, q in enumerate(qids)}

    def score(batches):
        subs = np.arange(m_)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["qid", "vec_id", "cosine"])
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            ids = pdf["id"].to_numpy(dtype=np.int64)
            lids = pdf["list_id"].to_numpy(dtype=np.int64)
            rows = []
            for qid in pdf["qid"].unique():
                msk = (pdf["qid"] == qid).to_numpy()
                sims = lut[qpos[int(qid)]][subs[None, :], codes[msk]].sum(axis=1)
                if by_residual:
                    # score = q.(c_list + r) = q.c_list + q.r
                    sims = sims + qc[qpos[int(qid)], lids[msk]]
                take = min(k, len(sims))
                thresh = -np.partition(-sims, take - 1)[take - 1]
                sel = np.nonzero(sims >= thresh)[0]
                sub_ids = ids[msk]
                rows.extend(
                    (int(qid), int(sub_ids[j]), float(sims[j])) for j in sel
                )
            yield pd.DataFrame(rows, columns=["qid", "vec_id", "cosine"])

    scored = cand.select("qid", "id", "codes", "list_id").mapInPandas(
        score, schema="qid long, vec_id long, cosine double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _train_residual_codebooks(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    m: int,
    nbits: int,
    sample: int = 4096,
    iters: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """PQ codebooks trained on RESIDUALS x - centroid(x) of a bounded
    driver-side sample (FAISS IndexIVFPQ training recipe)."""
    C = np.asarray(centroids, dtype=np.float64)
    rows = corpus.select(vec_col).limit(sample).collect()
    X = _unit_rows(np.array([list(r[0]) for r in rows], dtype=np.float64))
    R = X - C[np.argmax(X @ C.T, axis=1)]
    k = 1 << nbits
    n, d = R.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.Generator(np.random.PCG64(seed))
    books = np.zeros((m, k, dsub))
    for sub in range(m):
        S = R[:, sub * dsub : (sub + 1) * dsub]
        cents = [S[rng.integers(n)]]
        for _ in range(k - 1):
            d2 = np.min(
                ((S[:, None, :] - np.stack(cents)[None, :, :]) ** 2).sum(-1),
                axis=1,
            )
            tot = d2.sum()
            p = d2 / tot if tot > 0 else np.full(n, 1.0 / n)
            cents.append(S[rng.choice(n, p=p)])
        Cb = np.stack(cents)
        for _ in range(iters):
            a = np.argmin(((S[:, None, :] - Cb[None, :, :]) ** 2).sum(-1), axis=1)
            for j in range(k):
                msk = a == j
                if msk.any():
                    Cb[j] = S[msk].mean(axis=0)
        books[sub] = Cb
    return books


def pq_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
    m: int = 8,
    nbits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """PQ + ADC top-k: corpus vectors encode to m uint codes (one Arrow
    pass, one argmin-matmul per subspace — the stored corpus shrinks from
    d floats to m bytes per row, the 10^12-scale memory path); each query
    precomputes an (m, k) inner-product lookup table against the
    codebooks, and scoring is m LUT gathers + a sum per corpus row. The
    same map-side partial top-k as cosine_topk carries only k*nq rows to
    the driver. With exact_pq_codebooks the ADC scores equal exact
    cosines (zero quantization error) — the oracle setting."""
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, vec_col, m, nbits, seed=seed)
    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m_, kk, dsub = B.shape

    Q = np.array([q[1] for q in queries], dtype=np.float64)
    Qn = _unit_rows(Q)
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    # per-query ADC tables: lut[qi, sub, code] = q_sub . c_code
    lut = np.einsum("qsd,skd->qsk", Qn.reshape(len(Qn), m_, dsub), B)

    topk_schema = "qid long, vec_id long, cosine double"

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["qid", "vec_id", "cosine"])
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            Mn = _unit_rows(M)
            # encode: argmin ||x - c||^2 == argmax(x.c - |c|^2/2) — the
            # identity form is one (n, k) matmul per subspace instead of
            # an (n, k, dsub) difference tensor (at nbits=8, dsub=16 the
            # tensor was ~330 MB per 10k-row batch)
            codes = np.empty((len(Mn), m_), dtype=np.int64)
            for sub in range(m_):
                S = Mn[:, sub * dsub : (sub + 1) * dsub]
                half = 0.5 * (B[sub] ** 2).sum(axis=1)  # (k,)
                codes[:, sub] = np.argmax(S @ B[sub].T - half[None, :], axis=1)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            rows = []
            subs = np.arange(m_)
            for qi in range(len(qids)):
                sims = lut[qi][subs[None, :], codes].sum(axis=1)
                take = min(k, len(sims))
                # keep boundary TIES so the global window decides
                # deterministically (same rationale as cosine_topk)
                thresh = -np.partition(-sims, take - 1)[take - 1]
                for j in np.nonzero(sims >= thresh)[0]:
                    rows.append((int(qids[qi]), int(ids[j]), float(sims[j])))
            yield pd.DataFrame(rows, columns=["qid", "vec_id", "cosine"])

    partial = corpus.select(id_col, vec_col).mapInPandas(scan, schema=topk_schema)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return partial.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
