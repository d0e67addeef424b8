"""PII redaction, bigram-LM scoring, deterministic hash sampling."""

import hashlib
import math
import re

import pytest

from tests.conftest import spark  # noqa: F401


class TestRedact:
    DOCS = [
        (0, "mail me at a.b-c+x@sub.example.org or root@h.io today"),
        (1, "server 10.0.255.3 and 192.168.1.1; version 1.2.3.4 too"),
        (2, "call +14155550123 or (415) 555-0123 or 415-555-0199"),
        (3, "no pii here, just text with numbers 12345 and 1.5"),
        (4, "edge: x@y.zz next to 8.8.8.8 and +1234567"),
        (5, None),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_counts_and_redaction(self, spark):
        from gdal_spark.functions import redact as R
        from pyspark.sql import functions as F

        out = {
            r.doc_id: r
            for r in R.with_pii(
                self._df(spark).withColumn("text", F.coalesce("text", F.lit("")))
            ).collect()
        }
        assert (out[0].n_email, out[0].n_ipv4, out[0].n_phone) == (2, 0, 0)
        assert "<EMAIL>" in out[0].redacted and "@" not in out[0].redacted
        assert out[1].n_ipv4 == 3  # 1.2.3.4 matches the simple pattern too
        assert out[2].n_phone == 3
        assert "555" not in out[2].redacted
        assert out[3].redacted == self.DOCS[3][1]
        assert (out[4].n_email, out[4].n_ipv4, out[4].n_phone) == (1, 1, 1)

    def test_duckdb_parity(self, spark):
        """The oracle_exprs SQL must reproduce Spark's output exactly
        on adversarial inputs (dialect drift is the failure mode)."""
        import duckdb

        from gdal_spark.functions import redact as R
        from pyspark.sql import functions as F

        got = (
            R.with_pii(
                self._df(spark).withColumn("text", F.coalesce("text", F.lit("")))
            )
            .select("doc_id", "n_email", "n_ipv4", "n_phone", "redacted")
            .orderBy("doc_id")
            .collect()
        )
        con = duckdb.connect()
        ex = R.oracle_exprs("coalesce(text, '')")
        rows = con.execute(
            "SELECT doc_id, "
            + ", ".join(f"{ex[k]} AS {k}" for k in
                        ("n_email", "n_ipv4", "n_phone"))
            + f", {ex['redacted']} AS redacted "
            + "FROM (SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, '{(t or '').replace(chr(39), chr(39)*2)}')"
                for i, t in self.DOCS
            )
            + ") AS t(doc_id, text)) ORDER BY doc_id"
        )
        want = rows.fetchall()
        assert [
            (r.doc_id, r.n_email, r.n_ipv4, r.n_phone, r.redacted) for r in got
        ] == [tuple(w) for w in want]


class TestBigramLM:
    CORPUS = [
        (0, "the cat sat on the mat"),
        (1, "the cat ate the rat"),
        (2, "dogs bark"),
        (3, "single"),
        (4, ""),
        (5, "the cat sat on the mat again and again"),
    ]

    def _brute(self, k=0.1):
        toks = {
            i: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
            for i, s in self.CORPUS
        }
        pairs = [
            (w1, w2)
            for v in toks.values()
            for w1, w2 in zip(v, v[1:])
        ]
        from collections import Counter

        c12, c1 = Counter(pairs), Counter(p[0] for p in pairs)
        v = len({t for ts in toks.values() for t in ts})
        out = {}
        for i, ts in toks.items():
            bgs = list(zip(ts, ts[1:]))
            if not bgs:
                continue
            lps = [
                math.log((c12[bg] + k) / (c1[bg[0]] + k * v)) for bg in bgs
            ]
            out[i] = (len(bgs), sum(lps) / len(lps))
        return out

    def test_matches_brute_force(self, spark):
        from gdal_spark.functions.lm import bigram_lm_scores

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_bigrams, r.avg_logp)
            for r in bigram_lm_scores(df).collect()
        }
        want = self._brute()
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0]
            assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)

    def test_foreign_model_no_inf(self, spark):
        """Scoring unseen text against a trained model stays finite
        (add-k smoothing) and repeated text scores higher than noise."""
        from gdal_spark.functions.lm import bigram_lm_scores, bigram_model

        train = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        model = bigram_model(train)
        test = spark.createDataFrame(
            [(10, "the cat sat"), (11, "zz qq ww ee rr")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.avg_logp for r in
               bigram_lm_scores(test, model=model).collect()}
        assert math.isfinite(got[10]) and math.isfinite(got[11])
        assert got[10] > got[11]


class TestHashSample:
    def _py_bucket(self, key, buckets=10_000, salt=""):
        h = hashlib.md5((salt + str(key)).encode()).hexdigest()
        return int(h[:8], 16) % buckets

    def test_bucket_matches_python_md5(self, spark):
        from gdal_spark.functions.sample import hash_bucket
        from pyspark.sql import functions as F

        df = spark.range(0, 500).select(F.col("id").alias("k"))
        got = {
            r.k: r.b
            for r in df.select(
                "k", hash_bucket(F.col("k")).alias("b")
            ).collect()
        }
        for k in range(500):
            assert got[k] == self._py_bucket(k), k

    def test_bucket_matches_duckdb_sql(self, spark):
        import duckdb

        from gdal_spark.functions.sample import hash_bucket_sql

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT i, {hash_bucket_sql('i')} FROM range(0, 500) t(i)"
        ).fetchall()
        for k, b in rows:
            assert b == self._py_bucket(k), k

    def test_sample_fraction_and_nesting(self, spark):
        from gdal_spark.functions.sample import hash_sample
        from pyspark.sql import functions as F

        df = spark.range(0, 20_000).select(F.col("id").alias("k"))
        s10 = {r.k for r in hash_sample(df, "k", 0.10).collect()}
        s05 = {r.k for r in hash_sample(df, "k", 0.05).collect()}
        assert s05 <= s10  # nesting
        assert abs(len(s10) / 20_000 - 0.10) < 0.01
        # repartition-invariant
        s10b = {r.k for r in
                hash_sample(df.repartition(13), "k", 0.10).collect()}
        assert s10b == s10

    def test_split_labels_partition_and_cover(self, spark):
        from gdal_spark.functions.sample import split_label
        from pyspark.sql import functions as F

        df = spark.range(0, 10_000).select(F.col("id").alias("k"))
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        out = df.select(
            "k", split_label(F.col("k"), w).alias("s")
        ).groupBy("s").count().collect()
        counts = {r.s: r["count"] for r in out}
        assert set(counts) == {"train", "val", "test"}  # no NULL leftover
        assert abs(counts["train"] / 10_000 - 0.8) < 0.02

    def test_stratified(self, spark):
        from gdal_spark.functions.sample import stratified_sample
        from pyspark.sql import functions as F

        df = spark.range(0, 6_000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        )
        out = stratified_sample(
            df, "k", "lang", {"en": 1.0, "de": 0.1}
        ).groupBy("lang").count().collect()
        c = {r.lang: r["count"] for r in out}
        assert c["en"] == 2_000  # keep all
        assert abs(c["de"] / 4_000 - 0.1) < 0.03
