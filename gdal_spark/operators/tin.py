"""gdal_grid ``linear`` — Delaunay-TIN interpolation.

Reference: alg/gdalgrid.cpp GDALGridLinear (gdalgrid.cpp:2459-2530):
a Delaunay triangulation over the data points; each grid node inside the
hull gets the barycentric interpolation of its containing facet's three
vertex values; outside the hull, ``radius=0`` writes nodata and any other
radius falls back to GDALGridNearestNeighbor (negative radius = unbounded
nearest). The reference triangulates globally (internal qhull,
alg/delaunay.c); this engine re-expresses the operator Spark-first:

- points and grid nodes are bucketed into mercator cells (same zoom-cell
  machinery as :mod:`knn`); each cell's kernel triangulates the points of
  the cell plus a ``halo_cells`` ring (Bowyer-Watson, from scratch) and
  interpolates the cell's own nodes — parallelism O(cells), no global
  state;
- a node's answer is CERTAIN when its containing triangle's circumcircle
  lies inside the gathered halo box (the empty-circumcircle property then
  guarantees the facet is also in the global Delaunay triangulation); a
  nearest-neighbour answer is certain only when the node is outside the
  GLOBAL convex hull (computed once, distributed partial-hull reduction —
  :mod:`hull`; 'outside the local hull' is never certifiable from a
  bounded view because one unseen far point can wrap the hull around the
  node) AND the neighbour is closer than the gathered box's boundary;
  everything else retries once at 4x the cell size (zoom-2). Nodes still
  uncertain after the retry keep the locally-Delaunay answer — only
  reachable when a triangle's circumcircle spans >4 cells, i.e. data
  sparser than the grid itself;
- float determinism: points enter Bowyer-Watson in canonical (lexsorted)
  order, barycentric weights are evaluated with the triangle's vertices
  in canonical (x, y)-sorted order, and facets are scanned in canonical
  coordinate order, so the same node produces the BITWISE-same value
  whether the triangle came from a per-cell or a global triangulation
  (the oracle relies on this);
- COCIRCULAR caveat: on exactly-cocircular configurations (e.g. points
  on a regular grid) the Delaunay triangulation is not unique — any
  implementation (the reference's qhull included) picks a diagonal
  arbitrarily, and a per-cell certificate can legitimately pick the
  other diagonal than a global run when the gathered subsets differ.
  Values at nodes inside such quads may then differ between this
  operator and another Delaunay implementation by the diagonal choice;
  the canonical insertion order above guarantees self-consistency
  whenever two kernels see the same point set.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..grid import ORIGIN_SHIFT
from .hull import distributed_convex_hull, point_in_convex_hull


# ---------------------------------------------------------------------------
# Bowyer-Watson Delaunay triangulation (public-domain algorithm; vectorized
# in-circumcircle tests, incremental circumcircle cache)
# ---------------------------------------------------------------------------


def _circumcircles(P: np.ndarray, tris: np.ndarray):
    """(centers (t,2), squared radii (t,)) for each triangle."""
    a, b, c = P[tris[:, 0]], P[tris[:, 1]], P[tris[:, 2]]
    d = 2.0 * (
        a[:, 0] * (b[:, 1] - c[:, 1])
        + b[:, 0] * (c[:, 1] - a[:, 1])
        + c[:, 0] * (a[:, 1] - b[:, 1])
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        a2 = (a**2).sum(1)
        b2 = (b**2).sum(1)
        c2 = (c**2).sum(1)
        ux = (
            a2 * (b[:, 1] - c[:, 1])
            + b2 * (c[:, 1] - a[:, 1])
            + c2 * (a[:, 1] - b[:, 1])
        ) / d
        uy = (
            a2 * (c[:, 0] - b[:, 0])
            + b2 * (a[:, 0] - c[:, 0])
            + c2 * (b[:, 0] - a[:, 0])
        ) / d
    cc = np.stack([ux, uy], axis=1)
    r2 = ((a - cc) ** 2).sum(1)
    # collinear triangles (d == 0): infinite circumcircle — they would
    # swallow every later insertion; mark r2 = -inf so they never test
    # "inside" and get cleaned up by containing-region rebuilds
    bad = ~np.isfinite(r2)
    r2[bad] = -np.inf
    cc[bad] = 0.0
    return cc, r2


def delaunay(pts: np.ndarray) -> np.ndarray:
    """Delaunay triangulation of unique 2-D points: (t, 3) vertex-index
    array. Bowyer-Watson with a super-triangle; generic (non-cocircular)
    position assumed — the standard assumption, and what the fixtures
    guarantee."""
    P0 = np.asarray(pts, dtype=np.float64)
    n = len(P0)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    mn = P0.min(axis=0)
    mx = P0.max(axis=0)
    c = (mn + mx) / 2.0
    span = float(max(mx[0] - mn[0], mx[1] - mn[1], 1e-9))
    m = 64.0 * span
    sup = np.array(
        [[c[0] - m, c[1] - 0.7 * m], [c[0] + m, c[1] - 0.7 * m], [c[0], c[1] + m]]
    )
    P = np.vstack([P0, sup])
    tris = np.array([[n, n + 1, n + 2]], dtype=np.int64)
    cc, r2 = _circumcircles(P, tris)
    for i in range(n):
        p = P[i]
        bad = ((p - cc) ** 2).sum(1) < r2
        if not bad.any():
            # numerically on the hull of everything seen so far — retry
            # with a tolerant test (generic sets never get here)
            bad = ((p - cc) ** 2).sum(1) <= r2 * (1.0 + 1e-12)
            if not bad.any():
                continue
        bad_t = tris[bad]
        e = bad_t[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2)
        es = np.sort(e, axis=1)
        uniq, counts = np.unique(es, axis=0, return_counts=True)
        boundary = uniq[counts == 1]
        new = np.column_stack(
            [boundary, np.full(len(boundary), i, dtype=np.int64)]
        )
        keep = ~bad
        tris = np.vstack([tris[keep], new])
        ncc, nr2 = _circumcircles(P, new)
        cc = np.vstack([cc[keep], ncc])
        r2 = np.concatenate([r2[keep], nr2])
    inner = (tris < n).all(axis=1)
    return tris[inner]


def _canonical(P: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Sort each triangle's vertices by (x, y) and the triangle list by
    its sorted coordinate tuples — a pure function of the GEOMETRY, so a
    per-cell and a global triangulation scan identical facets in the
    identical order with identical vertex order (bitwise-stable
    barycentric arithmetic)."""
    if len(tris) == 0:
        return tris
    vx = P[tris, 0]
    vy = P[tris, 1]
    order = np.lexsort((vy, vx), axis=1)  # within-row: by (x, y)
    t = np.take_along_axis(tris, order, axis=1)
    coords = P[t].reshape(len(t), 6)
    return t[np.lexsort(tuple(coords[:, j] for j in range(5, -1, -1)))]


def tin_interpolate(
    pts_xy: np.ndarray,
    pts_z: np.ndarray,
    q_xy: np.ndarray,
    radius: float = -1.0,
):
    """Local GDALGridLinear kernel: (values, tri_cc, tri_r2, nn_dist).

    values[j] = barycentric interpolation for nodes inside the hull,
    nearest-neighbour value (radius != 0, within |radius| when radius > 0)
    or NaN outside. tri_cc/tri_r2 describe the containing facet's
    circumcircle (NaN/inf rows for fallback nodes — the distributed
    caller derives its certainty test from them); nn_dist is the
    nearest-point distance for fallback nodes (NaN otherwise)."""
    P = np.asarray(pts_xy, dtype=np.float64)
    Z = np.asarray(pts_z, dtype=np.float64)
    Q = np.asarray(q_xy, dtype=np.float64)
    nq = len(Q)
    vals = np.full(nq, np.nan)
    out_cc = np.full((nq, 2), np.nan)
    out_r2 = np.full(nq, np.inf)
    nn_dist = np.full(nq, np.nan)
    if nq == 0:
        return vals, out_cc, out_r2, nn_dist
    if len(P) >= 3:
        # canonical (lexsorted) insertion order: any two callers seeing
        # the same point SET triangulate identically even when cocircular
        # ties make Bowyer-Watson order-dependent
        po = np.lexsort((P[:, 1], P[:, 0]))
        Ps, Zs = P[po], Z[po]
        tris = _canonical(Ps, delaunay(Ps))
    else:
        Ps, Zs = P, Z
        tris = np.empty((0, 3), np.int64)
    assigned = np.zeros(nq, dtype=bool)
    if len(tris):
        cc, r2 = _circumcircles(Ps, tris)
        a, b, c = Ps[tris[:, 0]], Ps[tris[:, 1]], Ps[tris[:, 2]]
        det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (
            c[:, 0] - b[:, 0]
        ) * (a[:, 1] - c[:, 1])
        # point-location prefilter: queries sorted by x; each facet only
        # tests the slice inside its x-range (facets assign in canonical
        # order over still-unassigned queries, so results are unchanged)
        qorder = np.argsort(Q[:, 0], kind="stable")
        qx_sorted = Q[qorder, 0]
        txmin = np.minimum.reduce([a[:, 0], b[:, 0], c[:, 0]])
        txmax = np.maximum.reduce([a[:, 0], b[:, 0], c[:, 0]])
        tymin = np.minimum.reduce([a[:, 1], b[:, 1], c[:, 1]])
        tymax = np.maximum.reduce([a[:, 1], b[:, 1], c[:, 1]])
        los = np.searchsorted(qx_sorted, txmin, side="left")
        his = np.searchsorted(qx_sorted, txmax, side="right")
        n_left = nq
        for t in range(len(tris)):
            if det[t] == 0.0:
                continue
            if n_left == 0:
                break
            cand = qorder[los[t]:his[t]]
            if len(cand) == 0:
                continue
            cand = cand[
                ~assigned[cand]
                & (Q[cand, 1] >= tymin[t])
                & (Q[cand, 1] <= tymax[t])
            ]
            if len(cand) == 0:
                continue
            qx = Q[cand, 0]
            qy = Q[cand, 1]
            l1 = (
                (b[t, 1] - c[t, 1]) * (qx - c[t, 0])
                + (c[t, 0] - b[t, 0]) * (qy - c[t, 1])
            ) / det[t]
            l2 = (
                (c[t, 1] - a[t, 1]) * (qx - c[t, 0])
                + (a[t, 0] - c[t, 0]) * (qy - c[t, 1])
            ) / det[t]
            l3 = 1.0 - l1 - l2
            inside = (l1 >= 0.0) & (l2 >= 0.0) & (l3 >= 0.0)
            if not inside.any():
                continue
            idx = cand[inside]
            zt = Zs[tris[t]]
            vals[idx] = l1[inside] * zt[0] + l2[inside] * zt[1] + l3[inside] * zt[2]
            out_cc[idx] = cc[t]
            out_r2[idx] = r2[t]
            assigned[idx] = True
            n_left -= len(idx)
    # outside the hull (or < 3 points): GDALGridLinear fallback —
    # canonical (lexsorted) point order keeps the equal-distance
    # tie-break caller-independent too
    left = np.flatnonzero(~assigned)
    if len(left) and len(Ps) and radius != 0.0:
        d2 = ((Q[left, None, :] - Ps[None, :, :]) ** 2).sum(-1)
        jmin = d2.argmin(axis=1)
        dmin = np.sqrt(d2[np.arange(len(left)), jmin])
        ok = dmin <= radius if radius > 0 else np.ones(len(left), bool)
        vals[left[ok]] = Zs[jmin[ok]]
        nn_dist[left] = dmin
    return vals, out_cc, out_r2, nn_dist


def grid_linear_local(pts_xy, pts_z, q_xy, radius: float = -1.0) -> np.ndarray:
    """Oracle-facing wrapper: just the interpolated values."""
    return tin_interpolate(pts_xy, pts_z, q_xy, radius)[0]


# ---------------------------------------------------------------------------
# distributed grid_linear
# ---------------------------------------------------------------------------


def _cell_cols(df, x, y, zoom, px, py):
    n_side = 1 << zoom
    cell = (2 * ORIGIN_SHIFT) / n_side
    return df.withColumn(
        px, F.floor((F.col(x) + ORIGIN_SHIFT) / F.lit(cell)).cast("long")
    ).withColumn(
        py, F.floor((F.col(y) + ORIGIN_SHIFT) / F.lit(cell)).cast("long")
    )


def grid_linear(
    queries: DataFrame,
    points: DataFrame,
    value_col: str = "z",
    radius: float = -1.0,
    query_key: str = "qid",
    zoom: int = 7,
    halo_cells: int = 1,
    _retry: bool = True,
    _hull: np.ndarray | None = None,
) -> DataFrame:
    """Distributed gdal_grid ``linear`` (GDALGridLinear): per-cell
    Bowyer-Watson over the cell's points + a ``halo_cells`` ring,
    barycentric interpolation at the cell's grid nodes, certainty-checked
    against the halo box with one 4x-coarser retry for the uncertain
    remainder (see module docstring). Returns (query_key, linear_z);
    nodes with no answer (outside hull with radius=0, or no point within
    a positive radius) are dropped — the reference writes nodata.

    Scale: one (cell) shuffle for nodes, one bounded ``(2*halo+1)^2``
    replication shuffle for points, parallelism O(cells); nothing global,
    no driver state."""
    n_side = 1 << zoom
    cell_m = (2 * ORIGIN_SHIFT) / n_side
    halo_m = halo_cells * cell_m
    spark = queries.sparkSession
    # global hull, computed ONCE (partial-hull reduction, bounded collect):
    # the only thing a bounded local view cannot decide is whether a
    # locally-outside-the-hull node is globally outside too
    g_hull = distributed_convex_hull(points, "x", "y") if _hull is None else _hull

    qs = _cell_cols(
        queries.select(F.col(query_key).alias("_qk"), "x", "y"),
        "x", "y", zoom, "cx", "cy",
    )
    pt = points.select(
        F.col("x").alias("px_"), F.col("y").alias("py_"),
        F.col(value_col).alias("pz_"),
    )
    offs = spark.range(-halo_cells, halo_cells + 1).toDF("d")
    # replicate each point into its own cell plus the halo ring of every
    # neighbour cell (bounded fan-out, no iteration)
    prep = (
        _cell_cols(pt, "px_", "py_", zoom, "pcx", "pcy")
        .crossJoin(offs.withColumnRenamed("d", "dx"))
        .crossJoin(offs.withColumnRenamed("d", "dy"))
        .select(
            (F.col("pcx") + F.col("dx")).alias("cx"),
            (F.col("pcy") + F.col("dy")).alias("cy"),
            "px_", "py_", "pz_",
        )
    )

    qtype = queries.schema[query_key].dataType.simpleString()
    out_schema = f"qid_ {qtype}, linear_z double, certain boolean"

    def kernel(key, q_pdf: pd.DataFrame, p_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["qid_", "linear_z", "certain"]
        if len(q_pdf) == 0:
            return pd.DataFrame(columns=cols)
        cx, cy = int(key[0]), int(key[1])
        # gathered halo box (certainty boundary)
        bx0 = cx * cell_m - ORIGIN_SHIFT - halo_m
        bx1 = (cx + 1) * cell_m - ORIGIN_SHIFT + halo_m
        by0 = cy * cell_m - ORIGIN_SHIFT - halo_m
        by1 = (cy + 1) * cell_m - ORIGIN_SHIFT + halo_m
        Q = q_pdf[["x", "y"]].to_numpy(dtype=np.float64)
        if len(p_pdf):
            pxyz = p_pdf[["px_", "py_", "pz_"]].to_numpy(dtype=np.float64)
            # shuffle order is nondeterministic: sort before dedup so a
            # duplicate (x, y) keeps the lowest z in every run
            pxyz = pxyz[np.lexsort((pxyz[:, 2], pxyz[:, 1], pxyz[:, 0]))]
            pxy, first = np.unique(pxyz[:, :2], axis=0, return_index=True)
            pz = pxyz[first, 2]
        else:
            pxy = np.empty((0, 2))
            pz = np.empty(0)
        vals, cc, r2, nnd = tin_interpolate(pxy, pz, Q, radius=radius)
        r = np.sqrt(r2)
        tin_ok = (
            np.isfinite(vals)
            & np.isfinite(r)
            & (cc[:, 0] - r >= bx0)
            & (cc[:, 0] + r <= bx1)
            & (cc[:, 1] - r >= by0)
            & (cc[:, 1] + r <= by1)
        )
        # fallback nodes: certain only when the node is outside the GLOBAL
        # hull (so the reference semantics really are NN here — a locally
        # hull-outside node can still own a global facet) AND the
        # neighbour (or the verdict "nothing within radius") cannot be
        # overturned by unseen points beyond the gathered box
        edge_d = np.minimum.reduce(
            [Q[:, 0] - bx0, bx1 - Q[:, 0], Q[:, 1] - by0, by1 - Q[:, 1]]
        )
        lim = np.where(np.isnan(nnd), np.inf, nnd)
        if radius > 0:
            lim = np.minimum(lim, radius)
        nn_ok = np.isinf(r) & (lim <= edge_d) & ~point_in_convex_hull(g_hull, Q)
        return pd.DataFrame(
            {
                "qid_": q_pdf["_qk"].to_numpy(),
                "linear_z": vals,
                "certain": tin_ok | nn_ok,
            },
            columns=cols,
        )

    res = (
        qs.groupBy("cx", "cy")
        .cogroup(prep.groupBy("cx", "cy"))
        .applyInPandas(kernel, schema=out_schema)
    )
    if _retry:
        res = res.localCheckpoint(eager=True)
        sure = res.where(F.col("certain"))
        redo_keys = res.where(~F.col("certain")).select(
            F.col("qid_").alias(query_key)
        )
        redo = queries.join(redo_keys, query_key, "left_semi")
        retried = grid_linear(
            redo, points, value_col=value_col, radius=radius,
            query_key=query_key, zoom=max(1, zoom - 2),
            halo_cells=halo_cells, _retry=False, _hull=g_hull,
        ).select(F.col(query_key).alias("qid_"), "linear_z")
        out = sure.select("qid_", "linear_z").unionByName(retried)
    else:
        # retry leg: accept the locally-Delaunay answer (reachable only
        # when a circumcircle spans > 4 coarse cells — data sparser than
        # the grid; documented deviation)
        out = res.select("qid_", "linear_z")
    # pandas NaN crosses Arrow as NULL for nullable doubles — drop both
    return out.where(
        F.col("linear_z").isNotNull() & ~F.isnan(F.col("linear_z"))
    ).select(F.col("qid_").alias(query_key), "linear_z")
