"""Token-window chunking: lossless reassembly + window math."""

import pytest

from gdal_spark.functions.bpe import train_bpe
from gdal_spark.functions.chunk import chunk_documents, reassemble_chunks

pytestmark = pytest.mark.usefixtures("spark")

CORPUS = [
    "the quick brown fox jumps over the lazy dog " * 6,
    "pack my box with five dozen liquor jugs, zephyrs vex! " * 4,
    "short one",
    "ünïcödé content survives byte-level chunking — exactly. " * 3,
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


class TestChunking:
    def test_window_math_and_lossless_reassembly(self, spark):
        df = _df(spark)
        merges = train_bpe(df, num_merges=32)
        chunks = chunk_documents(
            df, merges, chunk_tokens=20, overlap=4, keep_tokens=True
        ).persist()
        rows = chunks.collect()
        # every non-final window is exactly chunk_tokens
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc, rs in by_doc.items():
            rs.sort(key=lambda r: r.chunk_idx)
            assert [r.chunk_idx for r in rs] == list(range(len(rs)))
            for r in rs[:-1]:
                assert r.n_tokens == 20
            assert 0 < rs[-1].n_tokens <= 20
            # consecutive windows share exactly `overlap` tokens
            for a, b in zip(rs, rs[1:]):
                assert list(a.tokens[-4:]) == list(b.tokens[:4]) or \
                    b.chunk_idx == len(rs) - 1  # remainder may start earlier
        back = {
            r.doc_id: r.text
            for r in reassemble_chunks(chunks, merges, overlap=4).collect()
        }
        for i, t in enumerate(CORPUS):
            assert back[i] == t  # byte-for-byte
        chunks.unpersist()

    def test_no_overlap_and_short_doc(self, spark):
        df = _df(spark)
        merges = train_bpe(df, num_merges=16)
        chunks = chunk_documents(df, merges, chunk_tokens=1000)
        rows = [r for r in chunks.collect() if r.doc_id == 2]
        assert len(rows) == 1 and rows[0].text == "short one"
        with pytest.raises(ValueError):
            chunk_documents(df, merges, chunk_tokens=10, overlap=10)
