"""Spatial join + kNN parity vs brute-force oracles (SURVEY.md §5(d))."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import fixtures, geom
from gdal_spark.operators.knn import idw_interpolate, knn_join
from gdal_spark.operators.spatial_join import (
    point_in_polygon_join,
    polygon_aggregate_join,
    with_envelope_cells,
)

N_POINTS = 600
N_FEATURES = 40


@pytest.fixture(scope="module")
def pts(spark):
    df = spark.createDataFrame(
        [fixtures.point_record(i) for i in range(N_POINTS)],
        schema=fixtures.POINT_COLUMNS,
    ).withColumnRenamed("pid", "pid")
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def feats(spark):
    df = fixtures.features_df(spark, N_FEATURES).persist()
    df.count()
    yield df
    df.unpersist()


def brute_force_pairs():
    """O(n*m) reference join."""
    pairs = set()
    recs = [fixtures.feature_record(f) for f in range(N_FEATURES)]
    parsed = [(r["fid"], geom.parse_wkb(r["wkb"])) for r in recs]
    P = [fixtures.point_record(i) for i in range(N_POINTS)]
    px = np.array([p["x"] for p in P])
    py = np.array([p["y"] for p in P])
    for fid, g in parsed:
        inside = geom.points_in_geometry(px, py, g)
        for i in np.nonzero(inside)[0]:
            pairs.add((int(P[i]["pid"]), fid))
    return pairs


class TestPIPJoin:
    def test_broadcast_matches_brute_force(self, spark, pts, feats):
        out = point_in_polygon_join(pts, feats, how="inner").select("pid", "fid").collect()
        got = {(r.pid, r.fid) for r in out}
        assert got == brute_force_pairs()

    def test_cell_join_matches_broadcast(self, spark, pts, feats):
        out = point_in_polygon_join(
            pts, feats, how="inner", cell_zoom=4
        ).select("pid", "fid").collect()
        got = {(r.pid, r.fid) for r in out}
        assert got == brute_force_pairs()

    def test_degenerate_ring_never_matches(self, spark, pts, feats):
        # fid=2 is the <4-point ring (ogr/ogrlinearring.cpp:480-481)
        out = point_in_polygon_join(pts, feats, how="inner").where(F.col("fid") == 2)
        assert out.count() == 0

    def test_hole_semantics(self, spark, feats):
        # a point in fid=1's hole must not match
        rec = fixtures.feature_record(1)
        g = geom.parse_wkb(rec["wkb"])
        hole = g.parts[1]
        hx, hy = float(hole[:, 0].mean()), float(hole[:, 1].mean())
        inside_hole = geom.points_on_surface(
            np.array([hx]), np.array([hy]), [g.parts[1]]
        )[0]
        test_pts = [(0, hx, hy), (1, *_point_inside_not_hole(g))]
        df = spark.createDataFrame(test_pts, "pid long, x double, y double")
        out = point_in_polygon_join(df, feats, how="inner").where(F.col("fid") == 1)
        got = {r.pid for r in out.select("pid").collect()}
        if inside_hole:
            assert 0 not in got
        assert 1 in got

    def test_left_join_first_match(self, spark, pts, feats):
        out = point_in_polygon_join(
            pts, feats, how="left", point_key="pid", first_match_order="fid"
        )
        assert out.count() == N_POINTS  # every point exactly once
        bf = {}
        for pid, fid in sorted(brute_force_pairs()):
            bf.setdefault(pid, fid)  # first (lowest) fid
        got = {r.pid: r.fid for r in out.select("pid", "fid").collect()}
        for pid, fid in bf.items():
            assert got[pid] == fid
        # non-matching points present with null fid
        assert sum(1 for v in got.values() if v is None) == N_POINTS - len(bf)

    def test_semi_and_anti(self, spark, pts, feats):
        semi = point_in_polygon_join(pts, feats, how="left_semi", point_key="pid")
        anti = point_in_polygon_join(pts, feats, how="left_anti", point_key="pid")
        matched = {p for p, _ in brute_force_pairs()}
        assert {r.pid for r in semi.select("pid").collect()} == matched
        assert {r.pid for r in anti.select("pid").collect()} == (
            {p["pid"] for p in [fixtures.point_record(i) for i in range(N_POINTS)]} - matched
        )

    def test_zonal_aggregate(self, spark, pts, feats):
        out = polygon_aggregate_join(
            pts,
            feats,
            aggs=[F.count("*").alias("n"), F.avg("z").alias("mean_z")],
        ).collect()
        bf = {}
        P = {p["pid"]: p for p in [fixtures.point_record(i) for i in range(N_POINTS)]}
        for pid, fid in brute_force_pairs():
            bf.setdefault(fid, []).append(P[pid]["z"])
        for r in out:
            assert r.n == len(bf[r.fid])
            assert abs(r.mean_z - np.mean(bf[r.fid])) < 1e-9

    def test_envelope_cells_cover(self, spark, feats):
        cells = with_envelope_cells(feats, 4).select("fid", "cell").collect()
        # every feature produces >= 1 cell; count matches the numpy oracle
        from gdal_spark.grid import MercatorGrid

        merc = MercatorGrid()
        by_fid = {}
        for r in cells:
            by_fid.setdefault(r.fid, set()).add(r.cell)
        for f in range(N_FEATURES):
            rec = fixtures.feature_record(f)
            tminx, tminy, tmaxx, tmaxy = merc.tile_range(
                rec["minx"], rec["miny"], rec["maxx"], rec["maxy"], 4
            )
            n = (int(tmaxx) - int(tminx) + 1) * (int(tmaxy) - int(tminy) + 1)
            assert len(by_fid[f]) == n


def _point_inside_not_hole(g):
    """A point inside the exterior ring but outside the hole."""
    outer = g.parts[0]
    hole = g.parts[1]
    # walk from hole centroid toward an outer vertex until outside the hole
    hx, hy = hole[:, 0].mean(), hole[:, 1].mean()
    ox, oy = outer[0]
    for t in np.linspace(0.05, 0.95, 50):
        x = hx + (ox - hx) * t
        y = hy + (oy - hy) * t
        if (
            geom.points_on_surface(np.array([x]), np.array([y]), [outer])[0]
            and not geom.points_in_ring(np.array([x]), np.array([y]), hole)[0]
        ):
            return float(x), float(y)
    raise AssertionError("no interior point found")


class TestKNN:
    def knn_brute(self, k, nq=12):
        P = [fixtures.point_record(i) for i in range(N_POINTS)]
        out = {}
        for q in range(nq):
            qr = fixtures.point_record(10_000 + q)
            d = sorted(
                (np.hypot(p["x"] - qr["x"], p["y"] - qr["y"]), p["pid"]) for p in P
            )
            out[10_000 + q] = [pid for _, pid in d[:k]]
        return out

    @pytest.fixture(scope="class")
    def queries(self, spark):
        df = spark.createDataFrame(
            [fixtures.point_record(10_000 + i) for i in range(12)],
            schema=fixtures.POINT_COLUMNS,
        ).withColumnRenamed("pid", "qid")
        return df

    def test_knn_matches_brute_force(self, spark, pts, queries):
        k = 5
        out = knn_join(queries, pts, k, zoom=3).collect()
        got = {}
        for r in sorted(out, key=lambda r: (r.qid, r.rank)):
            got.setdefault(r.qid, []).append(r.pid)
        assert got == self.knn_brute(k)

    def test_knn_radius_bound(self, spark, pts, queries):
        # radius-bounded kNN (alg/gdalgrid.cpp dfSearchRadius): no neighbor
        # farther than the bound is returned
        out = knn_join(queries, pts, 5, zoom=3, max_search_dist=2e6).collect()
        assert all(r.dist <= 2e6 for r in out)

    def test_idw_matches_numpy(self, spark, pts, queries):
        k = 4
        out = {r.qid: r.idw for r in idw_interpolate(queries, pts, k=k, zoom=3).collect()}
        P = {p["pid"]: p for p in [fixtures.point_record(i) for i in range(N_POINTS)]}
        bf = self.knn_brute(k)
        for qid, pids in bf.items():
            qr = fixtures.point_record(qid)
            d = np.array([np.hypot(P[p]["x"] - qr["x"], P[p]["y"] - qr["y"]) for p in pids])
            v = np.array([P[p]["z"] for p in pids])
            w = d ** -2.0
            expected = (w * v).sum() / w.sum()
            assert abs(out[qid] - expected) < 1e-6, qid


class TestGridFamily:
    """GDALGrid radius algorithms (alg/gdalgrid.cpp): moving average,
    nearest, data metrics — vs brute-force oracles."""

    @pytest.fixture(scope="class")
    def pts(self, spark):
        import numpy as np

        rng = np.random.default_rng(3)
        rows = [
            (i, float(x), float(y), float(z))
            for i, (x, y, z) in enumerate(
                zip(
                    rng.uniform(-1e7, 1e7, 300),
                    rng.uniform(-1e7, 1e7, 300),
                    rng.uniform(0, 100, 300),
                )
            )
        ]
        return rows, spark.createDataFrame(rows, "pid long, x double, y double, z double")

    def test_moving_average_matches_brute(self, spark, pts):
        import numpy as np

        from gdal_spark.operators.knn import grid_moving_average

        rows, df = pts
        queries = spark.createDataFrame(
            [(0, 0.0, 0.0), (1, 5e6, -5e6)], "qid long, x double, y double"
        )
        out = {r.qid: (r.avg_z, r.n) for r in grid_moving_average(
            queries, df, radius=4e6, zoom=3
        ).collect()}
        for qid, (qx, qy) in ((0, (0.0, 0.0)), (1, (5e6, -5e6))):
            sel = [z for _i, x, y, z in rows if np.hypot(x - qx, y - qy) <= 4e6]
            assert out[qid][1] == len(sel)
            assert out[qid][0] == pytest.approx(np.mean(sel))

    def test_nearest_matches_brute(self, spark, pts):
        import numpy as np

        from gdal_spark.operators.knn import grid_nearest

        rows, df = pts
        queries = spark.createDataFrame([(0, 1e6, 1e6)], "qid long, x double, y double")
        r = grid_nearest(queries, df).collect()[0]
        d = [(np.hypot(x - 1e6, y - 1e6), z) for _i, x, y, z in rows]
        d.sort()
        assert r.nearest_z == pytest.approx(d[0][1])

    def test_data_metrics_matches_brute(self, spark, pts):
        import numpy as np

        from gdal_spark.operators.knn import grid_data_metrics

        rows, df = pts
        queries = spark.createDataFrame([(0, -2e6, 3e6)], "qid long, x double, y double")
        r = grid_data_metrics(queries, df, radius=5e6, zoom=3).collect()[0]
        sel = [(z, np.hypot(x + 2e6, y - 3e6)) for _i, x, y, z in rows
               if np.hypot(x + 2e6, y - 3e6) <= 5e6]
        zs = [z for z, _d in sel]
        assert r.n == len(sel)
        assert r.min_z == pytest.approx(min(zs))
        assert r.max_z == pytest.approx(max(zs))
        assert r.avg_dist == pytest.approx(np.mean([d for _z, d in sel]))
