"""gdal_grid `linear` (Delaunay TIN) — kernel properties + distributed
parity. Reference: alg/gdalgrid.cpp GDALGridLinear (global Delaunay,
barycentric facet interpolation, NN fallback outside the hull)."""

import numpy as np
import pytest

from gdal_spark.operators.tin import (
    _circumcircles,
    delaunay,
    grid_linear,
    grid_linear_local,
    tin_interpolate,
)


class TestDelaunay:
    @pytest.mark.parametrize("seed", [7, 23])
    def test_empty_circumcircle_property(self, seed):
        rng = np.random.Generator(np.random.PCG64(seed))
        P = rng.random((70, 2)) * 100
        tris = delaunay(P)
        assert len(tris) >= 2 * 70 - 5 - 2 * 8  # Euler bound ballpark
        cc, r2 = _circumcircles(P, tris)
        for t in range(len(tris)):
            d2 = ((P - cc[t]) ** 2).sum(1)
            inside = d2 < r2[t] * (1 - 1e-12)
            inside[tris[t]] = False
            assert not inside.any()

    def test_collinear_points_no_triangles(self):
        P = np.stack([np.arange(10.0), 2 * np.arange(10.0)], axis=1)
        assert len(delaunay(P)) == 0


class TestTinInterpolate:
    def test_linear_field_exact_inside_hull(self):
        rng = np.random.Generator(np.random.PCG64(5))
        P = rng.random((90, 2)) * 100
        Z = 3.0 + 0.5 * P[:, 0] - 0.25 * P[:, 1]
        Q = rng.random((150, 2)) * 80 + 10
        vals, cc, r2, nnd = tin_interpolate(P, Z, Q)
        want = 3.0 + 0.5 * Q[:, 0] - 0.25 * Q[:, 1]
        tin = np.isfinite(r2)  # nodes resolved by a facet (not NN fallback)
        assert tin.sum() > 100
        assert np.abs(vals[tin] - want[tin]).max() < 1e-9

    def test_outside_hull_radius_semantics(self):
        P = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
        Z = np.array([1.0, 2.0, 3.0, 4.0])
        Qo = np.array([[50.0, 50.0]])
        # radius=0 -> nodata (NaN); negative -> unbounded NN; positive bounds
        assert np.isnan(grid_linear_local(P, Z, Qo, radius=0.0)[0])
        assert grid_linear_local(P, Z, Qo, radius=-1.0)[0] == 4.0
        assert np.isnan(grid_linear_local(P, Z, Qo, radius=5.0)[0])
        assert grid_linear_local(P, Z, Qo, radius=100.0)[0] == 4.0

    def test_node_on_data_point(self):
        rng = np.random.Generator(np.random.PCG64(3))
        P = rng.random((40, 2)) * 10
        Z = rng.random(40)
        v = grid_linear_local(P, Z, P[7:8])
        assert v[0] == pytest.approx(Z[7], abs=1e-12)


class TestDistributedGridLinear:
    def test_matches_local_bitwise(self, spark):
        """Per-cell TIN + halo + certainty retry == the global kernel,
        BITWISE (canonical facet order makes barycentric arithmetic a pure
        function of the geometry)."""
        rng = np.random.Generator(np.random.PCG64(11))
        P = (rng.random((250, 2)) - 0.5) * 2.0e6  # spans many zoom-7 cells
        Z = 2.0 + 1e-6 * P[:, 0] - 2e-6 * P[:, 1] + np.sin(P[:, 0] / 3e5)
        Q = (rng.random((120, 2)) - 0.5) * 1.6e6
        pts = spark.createDataFrame(
            [(float(x), float(y), float(z)) for (x, y), z in zip(P, Z)],
            "x double, y double, z double",
        )
        qs = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(Q)],
            "qid long, x double, y double",
        )
        got = {r.qid: r.linear_z for r in grid_linear(qs, pts, zoom=7).collect()}
        want = grid_linear_local(P, Z, Q)
        for i in range(len(Q)):
            if np.isfinite(want[i]):
                assert got[i] == want[i], i  # bitwise
            else:
                assert i not in got

    def test_inside_global_hull_never_certified_nn(self, spark):
        """Regression: a node outside its CELL-local hull but inside the
        GLOBAL hull must get the barycentric answer, not a 'certain' NN
        fallback — outside-hull status is only certifiable against the
        global hull (distributed partial-hull reduction)."""
        th = np.linspace(0, 2 * np.pi, 40, endpoint=False)
        # jittered radii: a perfect circle is COCIRCULAR (non-generic, the
        # one configuration where Delaunay is not unique)
        rr = 5e5 * (1.0 + 0.04 * np.sin(7 * th) + 0.03 * np.cos(3 * th))
        P = np.stack([rr * np.cos(th), rr * np.sin(th)], axis=1)
        Z = 7.0 + 3e-6 * P[:, 0] - 5e-6 * P[:, 1]
        # ring spans >3 zoom-7 cells, so no first-pass kernel for a
        # center node gathers the whole ring; center nodes sit inside the
        # global hull but outside every local one
        Q = np.array([[1e4, 1e4], [-2e5, 1.2e5], [0.0, -3e5], [9e5, 0.0]])
        pts = spark.createDataFrame(
            [(float(x), float(y), float(z)) for (x, y), z in zip(P, Z)],
            "x double, y double, z double",
        )
        qs = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(Q)],
            "qid long, x double, y double",
        )
        got = {r.qid: r.linear_z for r in grid_linear(qs, pts, zoom=7).collect()}
        want = grid_linear_local(P, Z, Q)
        for i in range(3):  # barycentric (≈ the linear field), bitwise
            assert got[i] == want[i]
            assert abs(got[i] - (7.0 + 3e-6 * Q[i, 0] - 5e-6 * Q[i, 1])) < 1e-9
        assert got[3] == want[3]  # outside global hull: NN fallback

    def test_radius_zero_drops_outside_hull(self, spark):
        P = np.array([[0.0, 0.0], [4e5, 0.0], [0.0, 4e5]])
        pts = spark.createDataFrame(
            [(float(x), float(y), 1.0) for x, y in P], "x double, y double, z double"
        )
        qs = spark.createDataFrame(
            [(0, 1e5, 1e5), (1, 3e6, 3e6)], "qid long, x double, y double"
        )
        out = {r.qid: r.linear_z for r in
               grid_linear(qs, pts, radius=0.0, zoom=6).collect()}
        assert 0 in out and 1 not in out
