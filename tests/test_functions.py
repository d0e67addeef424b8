"""Tests: text analysis, dedup ladder, similarity search, multimodal
plumbing, snapshots/resume, metrics — with numpy/duckdb brute-force
oracles where meaningful."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import dedup, simsearch, text
from gdal_spark.functions.multimodal import (
    fake_audio_features,
    image_resize,
    probe_metadata,
    with_metadata,
)
from gdal_spark.plans.metrics import partition_metrics, skew_report, with_salt
from gdal_spark.plans.snapshots import SnapshotTable

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog and the cat."),
    (1, "The quick brown fox jumps over the lazy dog and the cat."),  # exact dup
    (2, "The quick brown fox jumps over the lazy dog and the rat."),  # near dup
    (3, "Der Hund ist nicht der Freund und die Katze ist nicht da."),
    (4, "le chat et le chien et les oiseaux des villes"),
    (5, "el perro que corre para los gatos una vez"),
    (6, "completely different content about spark engines and tiles"),
    (7, ""),
    (8, "a b c"),
    (9, "  The   quick brown fox jumps over the lazy dog and the cat. "),  # ws dup
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").persist()
    df.count()
    yield df
    df.unpersist()


class TestText:
    def test_token_count(self, spark, docs):
        got = {r.doc_id: r.n for r in docs.select("doc_id", text.token_count(F.col("text")).alias("n")).collect()}
        for did, t in DOCS:
            assert got[did] == len(t.split()), (did, t)

    def test_lang_id(self, spark, docs):
        got = {r.doc_id: r.l for r in docs.select("doc_id", text.lang_id(F.col("text")).alias("l")).collect()}
        assert got[0] == "en"
        assert got[3] == "de"
        assert got[4] == "fr"
        assert got[5] == "es"
        assert got[7] == "und"

    def test_quality_monotone(self, spark, docs):
        got = {r.doc_id: r.q for r in docs.select("doc_id", text.quality_score(F.col("text")).alias("q")).collect()}
        assert got[0] > got[7]  # real sentence beats empty
        assert got[0] > got[8]  # beats "a b c"
        assert 0.0 <= min(got.values()) and max(got.values()) <= 1.0

    def test_fingerprint_normalizes_whitespace(self, spark, docs):
        got = {r.doc_id: r.fp for r in docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()}
        assert got[0] == got[9]
        assert got[0] == got[1]
        assert got[0] != got[2]

    def test_matches_duckdb_formula(self, spark, docs):
        """The same replace-arithmetic formula in DuckDB gives identical
        counts (oracle-compatibility of the SQL surface)."""
        import duckdb

        con = duckdb.connect()
        con.execute("create table d(doc_id bigint, text varchar)")
        con.executemany("insert into d values (?, ?)", DOCS)
        oracle = dict(
            con.execute(
                "select doc_id, cast((length(x) - length(replace(x, ' the ', '')))/5 as int) "
                "from (select doc_id, ' ' || regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || ' ' as x from d)"
            ).fetchall()
        )
        padded = F.concat(F.lit(" "), text.norm_text(F.col("text")), F.lit(" "))
        got = {
            r.doc_id: r.c
            for r in docs.select(
                "doc_id", text.count_occurrences(padded, " the ").alias("c")
            ).collect()
        }
        assert got == oracle


class TestDedup:
    def test_exact_groups(self, spark, docs):
        groups = dedup.exact_duplicates(docs).collect()
        assert len(groups) == 1
        g = groups[0]
        assert g.n_dups == 3 and g.keep_id == 0 and g.dup_ids == [0, 1, 9]

    def test_dedup_exact_keeps_min(self, spark, docs):
        out = dedup.dedup_exact(docs)
        ids = {r.doc_id for r in out.select("doc_id").collect()}
        assert 0 in ids and 1 not in ids and 9 not in ids
        assert out.count() == 8

    def test_jaccard_pairs_vs_brute(self, spark, docs):
        out = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
        got = {(r.id_a, r.id_b): r.jaccard for r in out}

        def shingles(t, k=5):
            s = " ".join(t.lower().split())
            return {s[i : i + k] for i in range(len(s) - k + 1)} if len(s) >= k else {s}

        for (ia, ta) in DOCS:
            for (ib, tb) in DOCS:
                if ia >= ib:
                    continue
                A, B = shingles(ta), shingles(tb)
                j = len(A & B) / len(A | B) if A | B else 0.0
                if j >= 0.5:
                    assert (ia, ib) in got, (ia, ib, j)
                    assert abs(got[(ia, ib)] - j) < 1e-9
                else:
                    assert (ia, ib) not in got

    def test_minhash_lsh_finds_near_dups(self, spark, docs):
        pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=64, bands=16)
        got = {(r.id_a, r.id_b) for r in pairs.select("id_a", "id_b").collect()}
        assert (0, 1) in got and (0, 9) in got and (1, 9) in got
        assert (0, 2) in got  # near dup (one word differs)
        assert not any(6 in p for p in got)

    def test_simhash_near_dup(self, spark, docs):
        pairs = dedup.simhash_pairs(docs, max_hamming=6).collect()
        got = {(r.id_a, r.id_b) for r in pairs}
        assert (0, 1) in got and (0, 9) in got
        assert (0, 6) not in got

    @pytest.mark.parametrize("d,n_chunks,salt", [(3, None, 1), (3, 5, 1), (6, None, 1), (3, None, 4)])
    def test_hamming_pairs_vs_brute(self, spark, d, n_chunks, salt):
        """Permuted multi-table blocking is EXACT (pigeonhole guarantee):
        output equals the all-pairs brute force for any chunk plan/salt."""
        rng = np.random.default_rng(7)
        sigs = rng.integers(-(1 << 63), 1 << 63, size=80, dtype=np.int64)
        # plant near-dups: flip <= d bits of earlier sigs
        for i in range(20):
            v = np.uint64(sigs[i])
            for bit in rng.choice(64, size=rng.integers(0, d + 1), replace=False):
                v ^= np.uint64(1) << np.uint64(bit)
            sigs = np.append(sigs, np.int64(v.astype(np.int64)))
        df = spark.createDataFrame(
            [(i, int(s)) for i, s in enumerate(sigs)], "id long, sig long"
        )
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in dedup.hamming_pairs(
                df, max_hamming=d, n_chunks=n_chunks, salt=salt
            ).collect()
        }
        exp = {}
        u = sigs.astype(np.uint64)
        for i in range(len(u)):
            ham = np.array([bin(int(u[i] ^ x)).count("1") for x in u])
            for j in np.nonzero(ham <= d)[0]:
                if i < j:
                    exp[(i, int(j))] = int(ham[j])
        assert got == exp

    def test_hamming_pairs_adversarial_million(self, spark):
        """10^6 signatures that all share one 16-bit chunk value — the
        naive (d+1)-chunk scheme would funnel all 10^6 rows into a single
        bucket (10^12 candidate pairs); the 32-bit permuted tables keep
        buckets sparse. Asserts the planted cluster's pairs are all
        recovered (exactness) in bounded time."""
        n = 1_000_000
        # random high 48 bits, constant low 16 bits (adversarial chunk)
        base = spark.range(n).select(
            F.col("id"),
            F.shiftleft(F.xxhash64("id"), 16)
            .bitwiseOR(F.lit(0xBEEF))
            .alias("sig"),
        )
        center = np.uint64(0x123456789ABCBEEF)
        planted, rng = [], np.random.default_rng(13)
        for i in range(40):
            v = center
            for bit in rng.choice(64, size=i % 4, replace=False):
                v ^= np.uint64(1) << np.uint64(bit)
            planted.append((n + i, int(v.astype(np.int64))))
        df = base.unionAll(spark.createDataFrame(planted, "id long, sig long"))
        pairs = dedup.hamming_pairs(df, max_hamming=3, salt=4)
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in pairs.where(F.col("id_a") >= n).collect()
        }
        u = np.array([s for _, s in planted], dtype=np.int64).astype(np.uint64)
        exp = {}
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                h = bin(int(u[i] ^ u[j])).count("1")
                if h <= 3:
                    exp[(n + i, n + j)] = h
        assert got == exp

    def test_embedding_neardup_lsh_vs_exact(self, spark):
        rng = np.random.default_rng(3)
        base = rng.normal(size=(20, 16))
        rows = []
        for i, v in enumerate(base):
            rows.append((i, [float(x) for x in v]))
            if i < 5:  # 5 near-duplicates
                rows.append((100 + i, [float(x) for x in v + rng.normal(scale=0.01, size=16)]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        exact = dedup.embedding_neardup_pairs(df, threshold=0.99, exact=True)
        expected = {(r.id_a, r.id_b) for r in exact.collect()}
        assert {(i, 100 + i) for i in range(5)} <= expected
        approx = dedup.embedding_neardup_pairs(df, threshold=0.99, n_planes=8)
        got = {(r.id_a, r.id_b) for r in approx.collect()}
        # LSH recall on near-identical vectors is high (same signature)
        assert len(got & expected) >= 4
        assert got <= expected  # verification removes false positives


class TestSimSearch:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rng = np.random.default_rng(11)
        M = rng.normal(size=(300, 24))
        df = spark.createDataFrame(
            [(i, [float(x) for x in M[i]]) for i in range(300)],
            "vec_id long, embedding array<float>",
        ).repartition(8).persist()
        df.count()
        return df, M

    def test_brute_topk_matches_numpy(self, spark, corpus):
        df, M = corpus
        rng = np.random.default_rng(12)
        Q = rng.normal(size=(5, 24))
        queries = [(i, [float(x) for x in Q[i]]) for i in range(5)]
        out = simsearch.cosine_topk(df, queries, k=7)
        got = {}
        for r in sorted(out.collect(), key=lambda r: (r.qid, r.rank)):
            got.setdefault(r.qid, []).append(r.vec_id)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        sims = Mn @ Qn.T
        for q in range(5):
            order = np.lexsort((np.arange(300), -sims[:, q]))[:7]
            assert got[q] == list(order), q

    def test_lsh_topk_recall(self, spark, corpus):
        df, M = corpus
        # queries = corpus rows themselves: rank-1 hit must be the row
        queries = [(i, [float(x) for x in M[i]]) for i in range(8)]
        out = simsearch.lsh_topk(df, queries, k=3, n_planes=8, probe_hamming=1)
        top1 = {r.qid: r.vec_id for r in out.collect() if r.rank == 1}
        hits = sum(1 for q, v in top1.items() if q == v)
        assert hits >= 7  # own bucket always probed -> self is found


class TestMultimodal:
    def test_probe_and_resize(self, spark):
        from gdal_spark import fixtures

        df = fixtures.images_df(spark, 8, partitions=2)
        meta = with_metadata(df)
        rows = meta.select("image_id", "modality", "width", "height", "ok").collect()
        assert all(r.ok and r.modality == "image" for r in rows)
        small = image_resize(df, 32, 32, out_fmt="png")
        out = small.select("image_id", "bytes", "fmt", "caption").collect()
        from gdal_spark import codecs

        for r in out:
            arr = codecs.decode_png(bytes(r.bytes))
            assert arr.shape[:2] == (32, 32)
            assert "ünïcodé" in r.caption

    def test_decode_stub_raises(self):
        from gdal_spark.functions.multimodal import decode_any

        with pytest.raises(NotImplementedError):
            decode_any(b"\x00\x01", "mp4")

    def test_fake_audio_features_deterministic(self):
        a = fake_audio_features(b"abcdefgh" * 100)
        b = fake_audio_features(b"abcdefgh" * 100)
        np.testing.assert_array_equal(a, b)


class TestSnapshots:
    def test_commit_read_resume(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "tiles"))
        df1 = spark.range(0, 10).withColumnRenamed("id", "k")
        sid1 = t.commit(df1, "first")
        assert sid1 == 1 and t.current_snapshot_id() == 1
        back = t.read(spark)
        assert back.count() == 10
        # resume: 5 old + 5 new keys -> anti-join keeps only the new
        df2 = spark.range(5, 15).withColumnRenamed("id", "k")
        pending = t.anti_join_pending(df2, ["k"])
        assert {r.k for r in pending.collect()} == set(range(10, 15))
        sid2 = t.append(df2, ["k"], "second")
        assert sid2 == 2
        assert t.read(spark).count() == 15
        # time travel to snapshot 1
        assert t.read(spark, snapshot_id=1).count() == 10

    def test_append_is_idempotent(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t2"))
        df = spark.range(0, 8).withColumnRenamed("id", "k")
        t.commit(df)
        t.append(df, ["k"])  # re-running the same stage
        assert t.read(spark).count() == 8


class TestMetrics:
    def test_partition_metrics_totals(self, spark):
        df = spark.range(0, 1000, 1, 8).withColumn("payload", F.lit("x" * 10))
        pm = partition_metrics(df, ["payload"]).collect()
        assert sum(r.n_rows for r in pm) == 1000
        assert sum(r.n_bytes for r in pm) == 10_000

    def test_skew_report_flags_hot_key(self, spark):
        skewed = spark.range(0, 1000).withColumn(
            "key", F.when(F.col("id") < 900, 0).otherwise(F.col("id"))
        ).repartition(8, "key")
        rep = skew_report(skewed)
        assert rep["rows"] == 1000
        assert rep["row_skew"] > 3.0

    def test_salting_spreads_hot_key(self, spark):
        skewed = spark.range(0, 1000).withColumn("key", F.lit(0))
        salted = with_salt(skewed, ["key"], 16, salt_source="id")
        n = salted.select("salt").distinct().count()
        assert n == 16
        rep = skew_report(salted.repartition(16, "key", "salt"))
        assert rep["row_skew"] < 2.0


class TestWavAudio:
    """Real RIFF/PCM16 WAV codec + FFT band features (no external libs)."""

    def test_wav_roundtrip(self):
        import numpy as np

        from gdal_spark.functions.multimodal import decode_wav, encode_wav

        t = np.arange(16000) / 16000.0
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
        buf = encode_wav(sig, 16000)
        out, rate = decode_wav(buf)
        assert rate == 16000 and out.shape == (16000, 1)
        np.testing.assert_allclose(
            out[:, 0] / 32767.0, sig, atol=1.0 / 32767.0
        )

    def test_stereo_and_probe(self):
        import numpy as np

        from gdal_spark.functions.multimodal import (
            decode_wav,
            encode_wav,
            probe_metadata,
        )

        stereo = np.stack(
            [np.ones(100) * 0.25, -np.ones(100) * 0.25], axis=1
        )
        buf = encode_wav(stereo, 8000)
        out, rate = decode_wav(buf)
        assert out.shape == (100, 2) and rate == 8000
        meta = probe_metadata(buf, "wav")
        assert meta["modality"] == "audio"
        assert meta["channels"] == 2 and meta["width"] == 100

    def test_features_tone_peak_band(self):
        import numpy as np

        from gdal_spark.functions.multimodal import audio_features, encode_wav

        t = np.arange(16000) / 16000.0
        # 16 bands over the 0..8000 Hz rFFT range = 500 Hz per band;
        # a 6 kHz tone lands in band floor(6000/500) = 11 (0-based)
        sig = np.sin(2 * np.pi * 6000 * t)
        f = audio_features(encode_wav(sig, 16000), n_bands=16)
        assert f["duration"] == pytest.approx(1.0)
        assert f["rms"] == pytest.approx(1 / np.sqrt(2), abs=0.01)
        assert int(np.argmax(f["band_energy"])) == 11
        # zero-crossing rate of a 6 kHz tone at 16 kHz ~ 2*6000/16000
        assert f["zcr"] == pytest.approx(0.75, abs=0.05)

    def test_with_audio_features_df(self, spark):
        import numpy as np

        from gdal_spark.functions.multimodal import encode_wav, with_audio_features

        t = np.arange(4000) / 8000.0
        rows = [
            (f"a{i}", bytearray(encode_wav(np.sin(2 * np.pi * (200 + 100 * i) * t), 8000)))
            for i in range(4)
        ]
        df = spark.createDataFrame(rows, "audio_id string, bytes binary")
        out = with_audio_features(df).collect()
        assert len(out) == 4
        for r in out:
            assert r.rate == 8000 and r.duration == pytest.approx(0.5)
            assert len(r.band_energy) == 16


class TestIvfTopk:
    """IVF ANN: exhaustive probing equals brute force; partial probing
    keeps high recall while scanning a fraction of the lists."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        rows = [
            (i, [float(v) for v in rng.standard_normal(16)]) for i in range(400)
        ]
        return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_exhaustive_equals_bruteforce(self, spark, corpus):
        from gdal_spark.functions.simsearch import cosine_topk, ivf_topk

        rows, df = corpus
        queries = [(i, rows[i][1]) for i in range(3)]
        brute = {(r.qid, r.rank): r.vec_id for r in cosine_topk(df, queries, k=5).collect()}
        ivf = {(r.qid, r.rank): r.vec_id for r in ivf_topk(
            df, queries, k=5, n_lists=8, nprobe=8
        ).collect()}
        assert ivf == brute

    def test_partial_probe_recall(self, spark, corpus):
        from gdal_spark.functions.simsearch import cosine_topk, ivf_topk

        rows, df = corpus
        queries = [(i, rows[i][1]) for i in range(5)]
        brute = cosine_topk(df, queries, k=10).collect()
        truth = {(r.qid, r.vec_id) for r in brute}
        got = {(r.qid, r.vec_id) for r in ivf_topk(
            df, queries, k=10, n_lists=8, nprobe=3
        ).collect()}
        recall = len(got & truth) / len(truth)
        assert recall >= 0.5  # scanning ~3/8 of the corpus

    def test_centroids_deterministic(self, spark, corpus):
        import numpy as np

        from gdal_spark.functions.simsearch import train_ivf_centroids

        _rows, df = corpus
        c1 = train_ivf_centroids(df, n_lists=8)
        c2 = train_ivf_centroids(df, n_lists=8)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0)


class TestDupClusters:
    def test_matches_union_find(self, spark):
        """Distributed CC over a pair graph with chains, stars and
        singletons-by-absence vs a driver union-find."""
        from gdal_spark.functions.dedup import dup_clusters

        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22),
                 (22, 20), (30, 31), (5, 40), (40, 6)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["id"]: (r["cluster"], r["keep"]) for r in dup_clusters(df).collect()}

        parent = {}
        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {n for e in edges for n in e}
        expect = {n: (find(n), n == find(n)) for n in nodes}
        assert got == expect


class TestPqTopk:
    """Product quantization: exact codebooks reproduce brute force
    (zero quantization error); k-means codebooks trade recall for a
    d-floats -> m-bytes corpus (the 10^12-scale memory path)."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        rows = [
            (i, [float(v) for v in rng.standard_normal(32)]) for i in range(300)
        ]
        return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_exact_codebooks_equal_bruteforce(self, spark, corpus):
        from gdal_spark.functions.simsearch import (
            cosine_topk,
            exact_pq_codebooks,
            pq_topk,
        )

        rows, df = corpus
        queries = [(i, rows[i][1]) for i in range(3)]
        brute = {(r.qid, r.rank): r.vec_id for r in cosine_topk(df, queries, k=5).collect()}
        books = exact_pq_codebooks(df, m=8)
        pq = {(r.qid, r.rank): r.vec_id for r in pq_topk(
            df, queries, k=5, codebooks=books
        ).collect()}
        assert pq == brute

    def test_kmeans_codebooks_recall(self, spark, corpus):
        from gdal_spark.functions.simsearch import (
            cosine_topk,
            pq_topk,
            train_pq_codebooks,
        )

        rows, df = corpus
        queries = [(i, rows[i][1]) for i in range(4)]
        truth = {(r.qid, r.vec_id) for r in cosine_topk(df, queries, k=5).collect()}
        books = train_pq_codebooks(df, m=16, nbits=6, iters=10)
        assert books.shape == (16, 64, 2)
        got = {(r.qid, r.vec_id) for r in pq_topk(
            df, queries, k=5, codebooks=books
        ).collect()}
        recall = len(got & truth) / len(truth)
        assert recall >= 0.5, recall

    def test_codebooks_deterministic(self, spark, corpus):
        import numpy as np

        from gdal_spark.functions.simsearch import train_pq_codebooks

        _rows, df = corpus
        b1 = train_pq_codebooks(df, m=8, nbits=4, iters=5)
        b2 = train_pq_codebooks(df, m=8, nbits=4, iters=5)
        np.testing.assert_array_equal(b1, b2)


class TestDedupNullText:
    def test_null_text_rows_pass_through(self, spark):
        from gdal_spark.functions.dedup import dedup_exact, exact_duplicates

        df = spark.createDataFrame(
            [(1, "same text"), (2, "same text"), (3, None), (4, None),
             (5, None)],
            "doc_id long, text string",
        )
        kept = dedup_exact(df).collect()
        ids = sorted(r.doc_id for r in kept)
        # one of the two dup rows survives; ALL null-text rows survive
        assert ids == [1, 3, 4, 5]
        groups = exact_duplicates(df).collect()
        assert len(groups) == 1 and groups[0].n_dups == 2

    def test_dup_clusters_rejects_string_ids(self, spark):
        import pytest as _pytest

        from gdal_spark.functions.dedup import dup_clusters

        pairs = spark.createDataFrame(
            [("doc-1", "doc-2")], "id_a string, id_b string"
        )
        with _pytest.raises(TypeError, match="integer ids"):
            dup_clusters(pairs)
