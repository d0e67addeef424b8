"""Convex hull — Andrew's monotone chain, plus a distributed reduction.

Reference: ``ogr/ogrgeometry.cpp:4194`` (OGRGeometry::ConvexHull, GEOS
``GEOSConvexHull_r``) and ``apps/gdal_footprint_lib.cpp:88-183``
(``gdal footprint -convex_hull``). Re-expressed from scratch: the local
kernel is the textbook monotone chain (O(n log n), numpy-sorted); the
distributed form exploits hull(A ∪ B) = hull(hull(A) ∪ hull(B)) — each
partition reduces its points to its own hull (expected O(log n) vertices
for non-adversarial data, O(n^(1/3)) for uniform-in-disk), the driver
hulls the concatenated partial hulls. The collect is bounded by the sum
of partial hull sizes, not the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def convex_hull_xy(pts: np.ndarray) -> np.ndarray:
    """(h, 2) hull vertices in counter-clockwise order starting from the
    lexicographically smallest point. Collinear boundary points are
    dropped (strict hull — GEOS/OGR semantics). Degenerate inputs return
    what exists: <3 distinct points, or all-collinear, come back as the
    (deduplicated, sorted) point/segment endpoints."""
    P = np.unique(np.asarray(pts, dtype=np.float64), axis=0)  # lexsorted
    n = len(P)
    if n <= 2:
        return P

    def half(rows):
        chain: list[np.ndarray] = []
        for p in rows:
            while len(chain) >= 2:
                a, b = chain[-2], chain[-1]
                if (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) <= 0.0:
                    chain.pop()
                else:
                    break
            chain.append(p)
        return chain

    lower = half(P)
    upper = half(P[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    if len(hull) < 3:  # all points collinear
        return np.array([P[0], P[-1]])
    return hull


def point_in_convex_hull(hull: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Boolean mask: is each q (m, 2) inside-or-on the CCW hull (h, 2)?
    Degenerate hulls (<3 vertices) contain nothing — callers treating
    'inside' as 'a TIN facet exists here' want exactly that."""
    q = np.asarray(q, dtype=np.float64)
    if len(hull) < 3:
        return np.zeros(len(q), dtype=bool)
    a = hull
    b = np.roll(hull, -1, axis=0)
    # cross((b-a), (q-a)) >= 0 for every edge of a CCW polygon
    cr = (b[:, 0] - a[:, 0])[None, :] * (q[:, 1:2] - a[None, :, 1]) - (
        b[:, 1] - a[:, 1]
    )[None, :] * (q[:, 0:1] - a[None, :, 0])
    return (cr >= 0.0).all(axis=1)


def convex_hull_geometry(g):
    """OGRGeometry::ConvexHull semantics (ogr/ogrgeometry.cpp:4194, GEOS
    GEOSConvexHull_r): hull of every coordinate of the input geometry.
    Dimension collapses like GEOS: >=3 non-collinear points -> POLYGON
    (closed CCW shell), 2 distinct / collinear -> LINESTRING, 1 ->
    POINT."""
    from .. import geom

    cs = list(geom._iter_coords(g))
    if not cs:
        return None
    h = convex_hull_xy(np.vstack(cs))
    if len(h) >= 3:
        return geom.Geometry(geom.WKB_POLYGON, [np.vstack([h, h[:1]])])
    if len(h) == 2:
        return geom.Geometry(geom.WKB_LINESTRING, [h])
    return geom.Geometry(geom.WKB_POINT, h)


def convex_hull_wkb(wkb: bytes | None) -> bytes | None:
    """WKB -> convex hull WKB (NULL-propagating)."""
    from .. import geom

    if wkb is None:
        return None
    out = convex_hull_geometry(geom.parse_wkb(bytes(wkb)))
    return None if out is None else geom.geometry_to_wkb(out)


def distributed_convex_hull(df: DataFrame, x: str = "x", y: str = "y") -> np.ndarray:
    """Global hull of a DataFrame's (x, y) columns as a driver-side
    (h, 2) CCW array. One mapInPandas pass emits per-batch partial hulls
    (bounded, expected O(log batch)); the driver hulls their union. The
    only collect is of partial-hull vertices."""
    import pyspark.sql.functions as F

    xy = df.select(F.col(x).alias("hx"), F.col(y).alias("hy")).where(
        F.col(x).isNotNull() & F.col(y).isNotNull()
    )

    def partial(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            h = convex_hull_xy(pdf[["hx", "hy"]].to_numpy(dtype=np.float64))
            yield pd.DataFrame({"hx": h[:, 0], "hy": h[:, 1]})

    parts = xy.mapInPandas(partial, schema="hx double, hy double").toPandas()
    if len(parts) == 0:
        return np.empty((0, 2), dtype=np.float64)
    return convex_hull_xy(parts.to_numpy(dtype=np.float64))
