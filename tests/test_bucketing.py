"""Bucketed co-located joins: same-bucketed tables join with ZERO
exchanges; the identical unbucketed join shuffles both sides."""

import re

import pytest
from pyspark.sql import functions as F

from gdal_spark.plans.bucketing import bucketed_join, write_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _tree_exchanges(df) -> int:
    # broadcast exchanges count too: the claim is NO data movement
    return len(re.findall(r"\(\d+\) (Broadcast)?Exchange", _plan(df)))


@pytest.fixture()
def cells(spark, tmp_path):
    a = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("cell"), F.col("id").alias("left_id")
    )
    b = spark.range(0, 3000).select(
        (F.col("id") % 97).alias("cell"), (F.col("id") * 7).alias("right_val")
    )
    write_bucketed(a, "bk_left", "cell", 8, path=str(tmp_path / "l"))
    write_bucketed(b, "bk_right", "cell", 8, path=str(tmp_path / "r"))
    # broadcast joins have no shuffle WITHOUT bucketing — disable them
    # so the assertion exercises the bucketed sort-merge path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield a, b
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


class TestBucketedJoin:
    def test_no_exchange_and_same_result(self, spark, cells):
        a, b = cells
        j = bucketed_join(spark, "bk_left", "bk_right", "cell")
        assert _tree_exchanges(j) == 0  # the co-location payoff
        assert "SortMergeJoin" in _plan(j)
        assert "Bucketed: true" in _plan(j)
        # identical join on the raw (bucket-less) frames must shuffle
        plain = a.join(b, "cell")
        assert _tree_exchanges(plain) >= 1
        # results identical
        assert j.count() == plain.count()
        ja = j.agg(F.sum("right_val")).collect()[0][0]
        pa = plain.agg(F.sum("right_val")).collect()[0][0]
        assert ja == pa

    def test_bucketed_groupby_no_exchange(self, spark, cells):
        g = spark.table("bk_left").groupBy("cell").agg(
            F.count("*").alias("n")
        )
        assert _tree_exchanges(g) == 0  # agg on the bucket key: no shuffle
