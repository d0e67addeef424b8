"""Session-window aggregation (streaming/sessions.py)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.streaming.sessions import sessionize

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _df(spark, offsets_s, key=1):
    rows = [(key, T0 + dt.timedelta(seconds=s)) for s in offsets_s]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


class TestSemantics:
    def test_boundary_merges(self, spark):
        # second event exactly at prev_ts + gap -> still the SAME
        # session (Spark merges touching windows); one second past the
        # boundary breaks
        out = sessionize(_df(spark, [0, 600]), gap="10 minutes").collect()
        assert len(out) == 1 and out[0].n_events == 2
        out2 = sessionize(_df(spark, [0, 601]), gap="10 minutes").collect()
        assert len(out2) == 2

    def test_merge_inside_gap(self, spark):
        out = sessionize(_df(spark, [0, 599]), gap="10 minutes").collect()
        assert len(out) == 1
        assert out[0].n_events == 2

    def test_transitive_chain(self, spark):
        # each consecutive pair within gap, total span way over gap
        out = sessionize(
            _df(spark, [0, 500, 1000, 1500, 2000]), gap="10 minutes"
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_events == 5
        assert r.session_start == T0
        # window close = last event + gap
        assert r.session_end == T0 + dt.timedelta(seconds=2000 + 600)

    def test_two_keys_independent(self, spark):
        a = _df(spark, [0, 100], key=1)
        b = _df(spark, [0, 100000], key=2)
        out = sessionize(a.union(b), gap="10 minutes").collect()
        per_key = {}
        for r in out:
            per_key[r.user_id] = per_key.get(r.user_id, 0) + 1
        assert per_key == {1: 1, 2: 2}


class TestAgainstGapsAndIslands:
    def test_events_table(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        got = (
            sessionize(
                ev, gap="4 hours",
                aggs=[F.round(F.sum("value"), 6).alias("sum_value")],
            )
            .orderBy("user_id", "session_start")
            .toPandas()
        )
        # brute-force gaps-and-islands in pandas
        pdf = ev.select("user_id", "ts", "value").toPandas()
        pdf = pdf.sort_values(["user_id", "ts"]).reset_index(drop=True)
        gap = pd.Timedelta(hours=4)
        want = []
        for uid, g in pdf.groupby("user_id"):
            brk = (g["ts"].diff() > gap).fillna(True)
            sid = brk.cumsum()
            for _, s in g.groupby(sid):
                want.append(
                    (
                        uid,
                        s["ts"].iloc[0],
                        s["ts"].iloc[-1] + gap,
                        len(s),
                        round(float(s["value"].sum()), 6),
                    )
                )
        want.sort(key=lambda r: (r[0], r[1]))
        assert len(got) == len(want)
        for row, w in zip(got.itertuples(index=False), want):
            assert row.user_id == w[0]
            assert pd.Timestamp(row.session_start) == w[1]
            assert pd.Timestamp(row.session_end) == w[2]
            assert row.n_events == w[3]
            assert row.sum_value == pytest.approx(w[4], abs=1e-6)


class TestStreaming:
    def test_streaming_matches_batch(self, spark, tmp_path):
        """The SAME sessionize() call runs as a Structured Streaming
        query: two parquet files drained as separate micro-batches
        (maxFilesPerTrigger=1), session state merged by the streaming
        state store, final complete-mode result == the batch answer."""
        src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        in_dir = str(tmp_path / "events_in")
        src.repartition(2).write.parquet(in_dir)

        schema = spark.read.parquet(in_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            # watermarks require TIMESTAMP (the table stores NTZ; the
            # session pins UTC so the cast is value-preserving)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "0 seconds")
        )
        agg = sessionize(stream, gap="4 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("sess_stream")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM sess_stream").collect()
        }
        want = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in sessionize(
                src.withColumn("ts", F.col("ts").cast("timestamp")),
                gap="4 hours",
            ).collect()
        }
        assert got == want and len(got) > 100
