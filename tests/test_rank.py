"""BM25 / TF-IDF ranking vs a brute-force in-process oracle."""

import math
import re

import pytest

from tests.conftest import spark  # noqa: F401


def _brute_bm25(corpus, query, k1=1.2, b=0.75):
    toks = {i: [t for t in re.split(r"[^a-z0-9]+", (s or "").lower()) if t]
            for i, s in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dft = {q: sum(1 for v in toks.values() if q in v) for q in query}
    out = {}
    for i, v in toks.items():
        s, hits = 0.0, 0
        for q in query:
            tf = v.count(q)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1 + (n - dft[q] + 0.5) / (dft[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if hits:
            out[i] = (s, hits)
    return out


CORPUS = [
    (0, "Spark joins the window; spark SPARK hash!"),
    (1, "vector hash vector join vector"),
    (2, "nothing relevant here at all"),
    (3, ""),                      # zero-token doc still counts toward avgdl
    (4, "join join join join join join join join"),
    (5, "the quick spark fox; window-hash vector_join"),
]
QUERY = ["spark", "join", "window", "hash", "vector"]


class TestBM25:
    def test_matches_brute_force(self, spark):
        from gdal_spark.functions.rank import bm25_scores

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        got = {
            r.doc_id: (r.bm25, r.n_hit_terms)
            for r in bm25_scores(df, QUERY).collect()
        }
        want = _brute_bm25(CORPUS, QUERY)
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == pytest.approx(want[i][0], rel=1e-12), i
            assert got[i][1] == want[i][1]

    def test_topk_order_and_ties(self, spark):
        from gdal_spark.functions.rank import bm25_topk

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        rows = bm25_topk(df, QUERY, k=3).collect()
        want = _brute_bm25(CORPUS, QUERY)
        order = sorted(want, key=lambda i: (-want[i][0], i))[:3]
        assert [r.doc_id for r in rows] == order

    def test_no_match_terms_empty(self, spark):
        from gdal_spark.functions.rank import bm25_scores

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        assert bm25_scores(df, ["zzz", "qqq"]).count() == 0

    def test_plan_filters_before_shuffle(self, spark):
        """The query-term filter must sit under the explode side of the
        aggregation — the shuffled relation is |matches|, not |tokens|."""
        from gdal_spark.functions.rank import bm25_scores

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        plan = bm25_scores(df, QUERY)._jdf.queryExecution().executedPlan().toString()
        gen = plan.index("Generate explode")
        # a Filter on t appears after (deeper than) the generate node
        assert "Filter t#" in plan[:gen] or "t IN" in plan or "isin" in plan.lower()


class TestTfIdf:
    def test_weights(self, spark):
        from gdal_spark.functions.rank import tfidf_vectors

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        w = {
            (r.doc_id, r.term): r.weight
            for r in tfidf_vectors(df).collect()
        }
        # doc 4: 'join' tf=8; df from the same tokenization
        toks = {i: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
                for i, s in CORPUS}
        dfj = sum(1 for v in toks.values() if "join" in v)
        want = (1 + math.log(8)) * math.log(1 + 6 / dfj)
        assert w[(4, "join")] == pytest.approx(want, rel=1e-12)
        # every weight positive, no empty terms
        assert all(v > 0 for v in w.values())
        assert all(t for (_i, t) in w)

    def test_min_df_prunes(self, spark):
        from gdal_spark.functions.rank import tfidf_vectors

        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        terms = {r.term for r in tfidf_vectors(df, min_df=3).collect()}
        # only terms in >= 3 docs survive
        assert "join" in terms and "relevant" not in terms
