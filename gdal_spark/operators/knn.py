"""kNN join by cell-ring expansion — the distributed analog of the
reference's quadtree radius search.

Reference semantics: GDALGridInverseDistanceToAPowerNearestNeighbor
(alg/gdalgrid.cpp:245-340) searches a quadtree (port/cpl_quad_tree.cpp)
with a growing radius, sorts candidates by distance, keeps <= nMaxPoints
and requires >= nMinPoints. Here the quadtree is the hierarchical cell
grid: candidates come from the query's cell plus k Chebyshev rings;
queries that miss re-run with a doubled radius (driver-side loop over the
*remaining* queries only, so each round shrinks).

Everything is DataFrame ops: explode(neighbor cells) -> equi-join on cell
-> window row_number to keep the k nearest (ties broken by point id, so
results are deterministic). AQE re-plans each round; the candidate join
broadcasts the query side automatically when it is small.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..grid import EARTH_RADIUS, ORIGIN_SHIFT


def _tile_coord(m, zoom: int, tile_size: int = 256):
    ir = 2 * math.pi * EARTH_RADIUS / tile_size
    res = ir / (2.0**zoom)
    t = (F.ceil(((m + ORIGIN_SHIFT) / res) / float(tile_size)) - 1).cast("long")
    n1 = F.lit((1 << zoom) - 1).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(n1, t))


def _with_cell_xy(df, x: str, y: str, zoom: int, prefix: str):
    return df.withColumn(f"{prefix}tx", _tile_coord(F.col(x), zoom)).withColumn(
        f"{prefix}ty", _tile_coord(F.col(y), zoom)
    )


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    query_key: str = "qid",
    point_key: str = "pid",
    qx: str = "x",
    qy: str = "y",
    px: str = "x",
    py: str = "y",
    zoom: int = 7,
    max_radius_cells: int = 64,
    max_search_dist: float | None = None,
) -> DataFrame:
    """For each query row, the k nearest point rows (Euclidean, in the
    shared planar CRS). Returns queries' key columns + point key + dist +
    rank. Radius-bounded variant: pass ``max_search_dist`` (the reference's
    dfSearchRadius); rows then may have fewer than k neighbors.
    """
    spark = queries.sparkSession
    pts = _with_cell_xy(points, px, py, zoom, "p_").select(
        F.col(point_key).alias("_pk"),
        F.col(px).alias("_px"),
        F.col(py).alias("_py"),
        "p_tx",
        "p_ty",
    )
    pts = pts.persist()
    remaining = _with_cell_xy(queries, qx, qy, zoom, "q_").select(
        F.col(query_key).alias("_qk"),
        F.col(qx).alias("_qx"),
        F.col(qy).alias("_qy"),
        "q_tx",
        "q_ty",
    )

    n_side = 1 << zoom
    results = None
    radius = 1
    while True:
        # candidate cells: Chebyshev disk of `radius` around the query cell
        offs = spark.range(-radius, radius + 1).toDF("d")
        cand = (
            remaining.crossJoin(offs.withColumnRenamed("d", "dx"))
            .crossJoin(offs.withColumnRenamed("d", "dy"))
            .withColumn("c_tx", F.pmod(F.col("q_tx") + F.col("dx"), F.lit(n_side)))
            .withColumn("c_ty", F.col("q_ty") + F.col("dy"))
            .where((F.col("c_ty") >= 0) & (F.col("c_ty") < n_side))
        )
        joined = cand.join(
            pts, (F.col("c_tx") == F.col("p_tx")) & (F.col("c_ty") == F.col("p_ty")), "inner"
        ).withColumn(
            # plain multiplication, not pow(): bitwise-identical to the
            # (a-b)*(a-b) form any SQL oracle uses
            "dist",
            F.sqrt(
                (F.col("_qx") - F.col("_px")) * (F.col("_qx") - F.col("_px"))
                + (F.col("_qy") - F.col("_py")) * (F.col("_qy") - F.col("_py"))
            ),
        )
        if max_search_dist is not None:
            joined = joined.where(F.col("dist") <= max_search_dist)
        w = Window.partitionBy("_qk").orderBy(F.col("dist").asc(), F.col("_pk").asc())
        topk = (
            joined.select("_qk", "_qx", "_qy", "q_tx", "q_ty", "_pk", "dist")
            .dropDuplicates(["_qk", "_pk"])
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        # truncate lineage: each round's plan must not replay all prior
        # rounds (the loop otherwise builds an exponentially deep DAG)
        topk = topk.localCheckpoint(eager=True)
        # a query is DONE if its k-th neighbor lies within the guaranteed
        # radius: every point within (radius-? ) cells is in the candidate
        # set, so dist <= radius * cell_size is certainly complete
        cell_size = (2 * ORIGIN_SHIFT) / n_side
        guaranteed = radius * cell_size
        counts = topk.groupBy("_qk").agg(
            F.count("*").alias("_n"), F.max("dist").alias("_maxd")
        )
        done_keys = counts.where(
            (F.col("_n") >= k) & (F.col("_maxd") <= guaranteed)
        ).select("_qk")
        bounded_complete = (
            max_search_dist is not None and max_search_dist <= guaranteed
        )
        if bounded_complete:
            done_keys = counts.select("_qk")  # search radius fully covered
        done = topk.join(done_keys, "_qk", "left_semi")
        results = done if results is None else results.unionByName(done)
        if bounded_complete:
            # EVERY query's bounded neighborhood is fully scanned now —
            # zero-result queries are not in `counts` and would
            # otherwise churn through the remaining doubling rounds
            # producing nothing
            break
        remaining = remaining.join(
            done_keys, remaining["_qk"] == done_keys["_qk"], "left_anti"
        ).localCheckpoint(eager=True)
        if radius >= max_radius_cells:
            # emit whatever the widest search found for the stragglers
            leftovers = topk.join(done_keys, "_qk", "left_anti")
            results = results.unionByName(leftovers)
            break
        if remaining.isEmpty():
            break
        radius *= 2
    out = results.select(
        F.col("_qk").alias(query_key),
        F.col("_pk").alias(point_key),
        "dist",
        "rank",
    )
    # every round's topk was localCheckpointed, so `out` no longer depends
    # on the cached points — release the cache before handing the plan back
    pts.unpersist()
    return out


def radius_join(
    queries: DataFrame,
    points: DataFrame,
    radius: float,
    query_key: str = "qid",
    point_key: str = "pid",
    qx: str = "x",
    qy: str = "y",
    px: str = "x",
    py: str = "y",
    zoom: int = 7,
) -> DataFrame:
    """All (query, point) pairs within Euclidean ``radius`` — the search
    ellipse of the GDALGrid algorithms (circular: radius1 == radius2,
    angle 0; alg/gdal_alg.h GDALGridMovingAverageOptions). One cell
    equi-join over a FIXED Chebyshev ring (ceil(radius / cell_size)), no
    iteration. Returns query keys + point key + dist."""
    n_side = 1 << zoom
    cell_size = (2 * ORIGIN_SHIFT) / n_side
    ring = int(math.ceil(radius / cell_size))
    spark = queries.sparkSession
    pts = _with_cell_xy(points, px, py, zoom, "p_").select(
        F.col(point_key).alias("_pk"),
        F.col(px).alias("_px"), F.col(py).alias("_py"),
        "p_tx", "p_ty",
    )
    qs = _with_cell_xy(queries, qx, qy, zoom, "q_").select(
        F.col(query_key).alias("_qk"),
        F.col(qx).alias("_qx"), F.col(qy).alias("_qy"),
        "q_tx", "q_ty",
    )
    offs = spark.range(-ring, ring + 1).toDF("d")
    cand = (
        qs.crossJoin(offs.withColumnRenamed("d", "dx"))
        .crossJoin(offs.withColumnRenamed("d", "dy"))
        .withColumn("c_tx", F.pmod(F.col("q_tx") + F.col("dx"), F.lit(n_side)))
        .withColumn("c_ty", F.col("q_ty") + F.col("dy"))
        .where((F.col("c_ty") >= 0) & (F.col("c_ty") < n_side))
    )
    joined = cand.join(
        pts, (F.col("c_tx") == F.col("p_tx")) & (F.col("c_ty") == F.col("p_ty")), "inner"
    ).withColumn(
        "dist",
        F.sqrt(
            (F.col("_qx") - F.col("_px")) * (F.col("_qx") - F.col("_px"))
            + (F.col("_qy") - F.col("_py")) * (F.col("_qy") - F.col("_py"))
        ),
    ).where(F.col("dist") <= radius)
    return joined.select(
        F.col("_qk").alias(query_key), F.col("_pk").alias(point_key), "dist"
    ).dropDuplicates([query_key, point_key])


def grid_moving_average(
    queries: DataFrame,
    points: DataFrame,
    radius: float,
    value_col: str = "z",
    min_points: int = 0,
    query_key: str = "qid",
    point_key: str = "pid",
    zoom: int = 7,
) -> DataFrame:
    """GDALGridMovingAverage (alg/gdalgrid.cpp): arithmetic mean of all
    point values inside the search circle; fewer than ``min_points``
    neighbours -> row dropped (the reference writes nodata)."""
    rj = radius_join(queries, points, radius, query_key, point_key, zoom=zoom)
    vals = points.select(F.col(point_key).alias("_vpk"), F.col(value_col).alias("_val"))
    j = rj.join(vals, rj[point_key] == vals["_vpk"], "inner")
    out = j.groupBy(query_key).agg(
        F.avg("_val").alias("avg_z"), F.count("*").alias("n")
    )
    if min_points > 0:
        out = out.where(F.col("n") >= min_points)
    return out


def grid_nearest(
    queries: DataFrame,
    points: DataFrame,
    value_col: str = "z",
    query_key: str = "qid",
    point_key: str = "pid",
    zoom: int = 7,
) -> DataFrame:
    """GDALGridNearestNeighbor: value of the single nearest point."""
    nn = knn_join(queries, points, 1, query_key=query_key, point_key=point_key, zoom=zoom)
    vals = points.select(F.col(point_key).alias("_vpk"), F.col(value_col).alias("_val"))
    return nn.join(vals, nn[point_key] == vals["_vpk"], "inner").select(
        query_key, F.col("_val").alias("nearest_z"), "dist"
    )


def grid_data_metrics(
    queries: DataFrame,
    points: DataFrame,
    radius: float,
    value_col: str = "z",
    query_key: str = "qid",
    point_key: str = "pid",
    zoom: int = 7,
) -> DataFrame:
    """GDALGrid data-metrics family (alg/gdal_alg.h:402-416 /
    gdalgrid.cpp:649-800): per node over the search circle —
    minimum, maximum, range, count, average_distance (point->node)."""
    rj = radius_join(queries, points, radius, query_key, point_key, zoom=zoom)
    vals = points.select(F.col(point_key).alias("_vpk"), F.col(value_col).alias("_val"))
    j = rj.join(vals, rj[point_key] == vals["_vpk"], "inner")
    return j.groupBy(query_key).agg(
        F.min("_val").alias("min_z"),
        F.max("_val").alias("max_z"),
        (F.max("_val") - F.min("_val")).alias("range_z"),
        F.count("*").alias("n"),
        F.avg("dist").alias("avg_dist"),
    )


def idw_interpolate(
    queries: DataFrame,
    points: DataFrame,
    value_col: str = "z",
    k: int = 8,
    power: float = 2.0,
    smoothing: float = 0.0,
    query_key: str = "qid",
    point_key: str = "pid",
    zoom: int = 7,
) -> DataFrame:
    """Inverse-distance-weighted value at each query from its k nearest
    points (GDALGridInverseDistanceToAPower semantics, alg/gdalgrid.cpp:
    120-230: weight = 1/dist^power, exact hit short-circuits)."""
    nn = knn_join(queries, points, k, query_key=query_key, point_key=point_key, zoom=zoom)
    vals = points.select(F.col(point_key).alias("_vpk"), F.col(value_col).alias("_val"))
    j = nn.join(vals, nn[point_key] == vals["_vpk"], "inner")
    d2 = F.col("dist") * F.col("dist") + F.lit(smoothing * smoothing)
    if smoothing != 0.0:
        # GDAL only short-circuits when d2 ~ 0; with smoothing the
        # coincident point gets a FINITE weight and averages with the
        # rest (gdalgrid.cpp:170-188)
        j = j.withColumn("_w", F.pow(d2, -power / 2.0))
        return j.groupBy(query_key).agg(
            (F.sum(F.col("_w") * F.col("_val")) / F.sum("_w")).alias("idw")
        )
    w = F.when(d2 == 0, F.lit(None)).otherwise(F.pow(d2, -power / 2.0))
    j = j.withColumn("_w", w)
    # deterministic exact hit: the coincident point with the smallest key
    exact = j.where(F.col("dist") == 0).groupBy(query_key).agg(
        F.min_by("_val", "_vpk").alias("idw")
    )
    approx = (
        j.where(F.col("dist") > 0)
        .groupBy(query_key)
        .agg((F.sum(F.col("_w") * F.col("_val")) / F.sum("_w")).alias("idw"))
        .join(exact.select(query_key), query_key, "left_anti")
    )
    return exact.unionByName(approx)
