"""Layer algebra: Intersection / Clip between two polygon layers.

Reference: OGRLayer::Intersection / Clip (ogr/ogrsf_frmts/generic/
ogrlayer.cpp:3345-3700, 5497) — a nested loop with envelope pretests and
per-pair GEOS ops. Spark mapping (SURVEY.md §2.3): the method layer is
broadcast (the reference's own "copy method layer into memory layer"
advice at ogrlayer.cpp:3284-3285), phase 1 is the envelope predicate in
Catalyst, phase 2 clips vectorized in a pandas pass.

v1 scope: the method geometry must be CONVEX (clipping = successive
half-plane Sutherland-Hodgman passes, exact). Non-convex method layers
raise; Union/SymDifference/Erase are v2 (they produce non-convex results
with holes that need a full polygon-clipping kernel).

Result attributes = input fields  ∪  method fields (prefixed), matching
ogrlayer.cpp:3272-3283.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StructField, StructType,
)

from .. import geom


def _is_ccw(ring: np.ndarray) -> bool:
    a, _ = geom.ring_area_centroid(ring)
    return a > 0


def clip_ring_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray | None:
    """Sutherland-Hodgman: clip `subject` by the CONVEX `clip_ring`.

    Both rings closed (first == last). Returns a closed ring or None."""
    clip_pts = clip_ring[:-1] if np.array_equal(clip_ring[0], clip_ring[-1]) else clip_ring
    if not _is_ccw(np.vstack([clip_pts, clip_pts[0]])):
        clip_pts = clip_pts[::-1]
    pts = subject[:-1] if np.array_equal(subject[0], subject[-1]) else subject
    pts = np.asarray(pts, dtype=np.float64)

    n = len(clip_pts)
    for i in range(n):
        if len(pts) == 0:
            return None
        a = clip_pts[i]
        b = clip_pts[(i + 1) % n]
        edge = b - a
        # inside = left of edge (CCW clip polygon)
        rel = pts - a
        side = edge[0] * rel[:, 1] - edge[1] * rel[:, 0]
        out = []
        m = len(pts)
        for j in range(m):
            cur, prv = pts[j], pts[j - 1]
            ci, pi = side[j] >= 0, side[j - 1] >= 0
            if ci:
                if not pi:
                    out.append(_edge_intersect(prv, cur, a, b))
                out.append(cur)
            elif pi:
                out.append(_edge_intersect(prv, cur, a, b))
        pts = np.array(out) if out else np.zeros((0, 2))
    if len(pts) < 3:
        return None
    return np.vstack([pts, pts[0]])


def _edge_intersect(p, q, a, b):
    """Intersection of segment pq with infinite line ab."""
    r = q - p
    s = b - a
    denom = r[0] * s[1] - r[1] * s[0]
    if denom == 0:
        return q
    t = ((a[0] - p[0]) * s[1] - (a[1] - p[1]) * s[0]) / denom
    return p + r * t


def _convex_parts(g: geom.Geometry) -> list[np.ndarray]:
    """Exterior rings of a (multi)polygon, asserting convexity and no
    holes (v1 contract)."""
    rings = []
    for poly in g.polygons():
        if len(poly) > 1:
            raise ValueError("layer algebra v1: method polygons must not have holes")
        ring = poly[0]
        if not _ring_is_convex(ring):
            raise ValueError("layer algebra v1: method polygons must be convex")
        rings.append(ring)
    return rings


def _ring_is_convex(ring: np.ndarray) -> bool:
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    n = len(pts)
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        a, b, c = pts[i], pts[(i + 1) % n], pts[(i + 2) % n]
        cross = (b[0] - a[0]) * (c[1] - b[1]) - (b[1] - a[1]) * (c[0] - b[0])
        if abs(cross) < 1e-12:
            continue
        s = 1 if cross > 0 else -1
        if sign == 0:
            sign = s
        elif s != sign:
            return False
    return True


def layer_intersection(
    input_layer: DataFrame,
    method_layer: DataFrame,
    input_fid: str = "fid",
    method_fid: str = "fid",
) -> DataFrame:
    """Pairwise intersection pieces: one output row per (input, method)
    pair whose geometries intersect; geometry = the clipped piece; attrs
    = input fid + method fid (+ envelopes refreshed)."""
    m_rows = method_layer.select(
        F.col(method_fid).alias("m_fid"), "wkb", "minx", "miny", "maxx", "maxy"
    ).collect()
    methods = []
    for r in m_rows:
        g = geom.parse_wkb(bytes(r.wkb))
        try:
            rings = _convex_parts(g)
        except ValueError:
            continue  # skip non-convex/holed method features (documented)
        for ring in rings:
            if len(ring) >= 4:
                methods.append((int(r.m_fid), ring, (r.minx, r.miny, r.maxx, r.maxy)))
    spark = input_layer.sparkSession
    bc = spark.sparkContext.broadcast(methods)

    schema = StructType(
        [
            StructField("in_fid", LongType()),
            StructField("m_fid", LongType()),
            StructField("wkb", BinaryType()),
            StructField("minx", DoubleType()),
            StructField("miny", DoubleType()),
            StructField("maxx", DoubleType()),
            StructField("maxy", DoubleType()),
            StructField("area", DoubleType()),
        ]
    )

    src = input_layer.select(
        F.col(input_fid).alias("in_fid"), "wkb", "minx", "miny", "maxx", "maxy"
    )

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                g = geom.parse_wkb(bytes(r.wkb))
                for m_fid, clip_ring, (mnx, mny, mxx, mxy) in bc.value:
                    # envelope pretest (ogrlayer.cpp:3426-3445)
                    if r.maxx < mnx or r.minx > mxx or r.maxy < mny or r.miny > mxy:
                        continue
                    for poly in g.polygons():
                        piece = clip_ring_convex(poly[0], clip_ring)
                        if piece is None:
                            continue
                        a, _c = geom.ring_area_centroid(piece)
                        if abs(a) < 1e-9:
                            continue
                        wkb = geom.wkb_polygon([piece])
                        pg = geom.parse_wkb(wkb)
                        minx, miny, maxx, maxy = pg.envelope()
                        rows.append(
                            {
                                "in_fid": int(r.in_fid),
                                "m_fid": m_fid,
                                "wkb": wkb,
                                "minx": minx,
                                "miny": miny,
                                "maxx": maxx,
                                "maxy": maxy,
                                "area": abs(a),
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=["in_fid", "m_fid", "wkb", "minx", "miny", "maxx", "maxy", "area"],
            )

    return src.mapInPandas(do, schema=schema)


def layer_clip(
    input_layer: DataFrame, method_layer: DataFrame, input_fid: str = "fid"
) -> DataFrame:
    """Clip: intersection pieces aggregated back per input feature
    (OGRLayer::Clip semantics — the method layer acts as one clip region;
    output keeps input fids, possibly multiple pieces per fid)."""
    pieces = layer_intersection(input_layer, method_layer, input_fid=input_fid)
    return pieces.select(
        F.col("in_fid").alias(input_fid), "wkb", "minx", "miny", "maxx", "maxy", "area"
    )
