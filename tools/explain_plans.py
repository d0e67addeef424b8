#!/usr/bin/env python
"""Physical-plan audit: print .explain('formatted') for the key operator
plans and grep the properties the engine promises (SURVEY.md §4):

- parquet scans show PushedFilters + pruned ReadSchema
- tile assignment stays inside WholeStageCodegen (no Python in the scan)
- the PIP join phase 1 is a BroadcastHashJoin (or cell equi SortMerge)
- aggregations have partial (map-side) aggregation

Writes PLANS.md with the audit result per plan.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def audit(name, df, expect, out):
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    checks = []
    for label, pattern in expect:
        ok = re.search(pattern, plan) is not None
        checks.append((label, ok))
    out.append((name, checks, plan))
    status = ", ".join(f"{l}={'PASS' if ok else 'FAIL'}" for l, ok in checks)
    print(f"{name}: {status}")


def main():
    from gdal_spark.session import get_spark
    from gdal_spark import fixtures
    from gdal_spark.operators.tile import assign_tiles
    from gdal_spark.operators.spatial_join import point_in_polygon_join

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    out = []

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")

    # 1. filter + projection pushdown to parquet
    q = orders.where(F.col("o_orderkey") < 100).select("o_orderkey", "o_totalprice")
    audit(
        "parquet_pushdown",
        q,
        [
            ("pushed_filter", r"PushedFilters: \[.*LessThan\(o_orderkey"),
            ("pruned_schema", r"ReadSchema:[^\n]*o_orderkey[^\n]*o_totalprice"),
            ("codegen", r"codegen id"),
        ],
        out,
    )

    # 2. tile assignment is pure column math (no BatchEvalPython/ArrowEval)
    imgs = fixtures.images_df(spark, 8, partitions=2)
    ta = assign_tiles(imgs.select("image_id", "minx", "miny", "maxx", "maxy"), 6)
    audit(
        "tile_assignment_no_python",
        ta,
        [
            ("no_python_eval", r"^(?!.*(BatchEvalPython|ArrowEvalPython|MapInPandas))",),
            ("codegen", r"codegen id"),
        ],
        out,
    )

    # 3. PIP join phase 1 broadcasts the polygon side
    pts = spark.createDataFrame(
        [fixtures.point_record(i) for i in range(64)], schema=fixtures.POINT_COLUMNS
    )
    feats = fixtures.features_df(spark, 16)
    j = point_in_polygon_join(pts, feats, how="inner")
    audit(
        "pip_join_broadcast",
        j,
        [
            ("broadcast", r"Broadcast(NestedLoop|Hash)Join"),
            ("arrow_refine", r"(ArrowEvalPython|FlatMapsInPandas|BatchEvalPython)"),
        ],
        out,
    )

    # 4. partial aggregation on groupBy
    g = orders.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("s"))
    audit(
        "partial_agg",
        g,
        [("partial", r"HashAggregate.*partial|partial_sum"), ("codegen", r"codegen id|AdaptiveSparkPlan")],
        out,
    )

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("# PLANS — physical-plan audit (.explain formatted)\n\n")
        for name, checks, plan in out:
            f.write(f"## {name}\n\n")
            for label, ok in checks:
                f.write(f"- {label}: {'PASS' if ok else 'FAIL'}\n")
            f.write("\n```\n")
            f.write(plan[:4000])
            f.write("\n```\n\n")
    spark.stop()


if __name__ == "__main__":
    main()
