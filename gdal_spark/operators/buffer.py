"""Buffer: polygon dilation/erosion by a distance.

Reference: OGRGeometry::Buffer (ogr/ogrgeometry.cpp:6368) -> GEOS buffer
with nQuadSegs arc segmentation. Two implementations:

- VECTOR (default, :func:`buffer_polys_exact`): Minkowski dilation /
  erosion by a disc discretized with 4*quad_segs chords (the same
  quadrant-segment convention GEOS uses — GEOS arcs are polygonal
  approximations too). Dilation = union(polygon, every boundary edge
  extruded to a rect, an inscribed 4*quad_segs-gon disc at every
  vertex); erosion = polygon minus that boundary swell — both through
  the slab boolean kernel, so joins/caps are exact set algebra, not a
  raster. Dilated areas equal the closed form
  ``A + d*P + (n/2) d^2 sin(2 pi/n)`` for convex input (A area, P
  perimeter, n = 4*quad_segs) and converge to the analytic offset as
  quad_segs grows; erosion of polygons is exact (corner discs are never
  binding inside). Runs per feature — narrow pass, no shuffle.

- GRID (:func:`buffer_polys`, the raster-mask fast path): rasterize the
  feature onto a local grid at ``resolution``, exact Euclidean distance
  transform, threshold, polygonize back. Boundary error ~1 grid cell;
  pick resolution = |dist| / 16 (default) for ~6% worst-case radial
  error. O(((w + 2d) / res)^2) memory per feature — the cheap choice
  when the result feeds a mask, not cartography.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import geom
from ..booleans import assemble_polygons, boolean_full
from .distance import edt
from .polygonize import boundary_segments, chain_rings, label_components
from .rasterize import fill_spans

MAX_GRID = 2048


def buffer_polys(polys, dist: float, resolution: float | None = None):
    """Grid-approximate buffer of one polygon list. Returns a polygon
    list (ring lists) or [] if the result is empty."""
    if not polys:
        return []
    allc = np.vstack([r for rings in polys for r in rings])
    minx, miny = allc[:, 0].min(), allc[:, 1].min()
    maxx, maxy = allc[:, 0].max(), allc[:, 1].max()
    pad = abs(dist) * 1.5 + 1e-9
    if resolution is None:
        resolution = max(abs(dist) / 16.0, (maxx - minx + maxy - miny + 2 * pad) / MAX_GRID)
    res = float(resolution)
    gx0, gy1 = minx - pad, maxy + pad
    w = min(MAX_GRID, int(np.ceil((maxx - minx + 2 * pad) / res)) + 1)
    h = min(MAX_GRID, int(np.ceil((maxy - miny + 2 * pad) / res)) + 1)
    gt = (gx0, res, 0.0, gy1, 0.0, -res)

    mask = np.zeros((h, w), dtype=bool)
    for rings in polys:
        rings_px = [
            np.stack(
                [(r[:, 0] - gt[0]) / gt[1], (r[:, 1] - gt[3]) / gt[5]], axis=1
            )
            for r in rings
        ]
        mask |= fill_spans(rings_px, h, w)
    if dist >= 0:
        if mask.any():
            d = edt(mask)
            keep = mask | (d * res <= dist)
        else:
            return []
    else:
        if not mask.any():
            return []
        d = edt(~mask)
        keep = mask & (d * res > -dist)
    if not keep.any():
        return []
    labels, n = label_components(keep.astype(np.uint8), exclude=(0,))
    segs = boundary_segments(labels)
    rings = []
    for lab in range(1, n + 1):
        rings.extend(chain_rings(segs[lab]))
    geo_rings = []
    for r in rings:
        x = gt[0] + r[:, 0] * gt[1]
        y = gt[3] + r[:, 1] * gt[5]
        gr = np.stack([x, y], axis=1)[::-1].copy()  # restore orientation (y flip)
        geo_rings.append(gr)
    return assemble_polygons(geo_rings)


def _disc_ring(cx: float, cy: float, d: float, quad_segs: int) -> np.ndarray:
    n = 4 * quad_segs
    th = np.arange(n) * (2.0 * np.pi / n)
    ring = np.stack([cx + d * np.cos(th), cy + d * np.sin(th)], axis=1)
    return np.vstack([ring, ring[:1]])


def _boundary_swell(polys, d: float, quad_segs: int):
    """boundary ⊕ disc as a piece list: one rect per edge (both sides),
    one inscribed disc polygon per vertex."""
    pieces = []
    for rings in polys:
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 2:
                continue
            closed = bool(np.array_equal(r[0], r[-1])) and len(r) > 2
            pts = r[:-1] if closed else r
            p = pts if closed else pts[:-1]
            q = np.roll(pts, -1, axis=0) if closed else pts[1:]
            e = q - p
            L = np.hypot(e[:, 0], e[:, 1])
            safe = np.where(L == 0.0, 1.0, L)
            nx = -e[:, 1] / safe * d
            ny = e[:, 0] / safe * d
            for i in np.flatnonzero(L > 0.0):
                rect = np.array([
                    [p[i, 0] + nx[i], p[i, 1] + ny[i]],
                    [q[i, 0] + nx[i], q[i, 1] + ny[i]],
                    [q[i, 0] - nx[i], q[i, 1] - ny[i]],
                    [p[i, 0] - nx[i], p[i, 1] - ny[i]],
                ])
                pieces.append([np.vstack([rect, rect[:1]])])
            for v in pts:
                pieces.append([_disc_ring(float(v[0]), float(v[1]), d, quad_segs)])
    return pieces


def buffer_polys_exact(polys, dist: float, quad_segs: int = 8):
    """Vector buffer of one polygon list (GEOS Buffer semantics, arcs as
    inscribed 4*quad_segs-gons). Returns a polygon list or []."""
    polys = list(polys)
    if not polys:
        return []
    if dist == 0.0:
        return polys
    pieces = _boundary_swell(polys, abs(float(dist)), quad_segs)
    if dist > 0:
        out, _area = boolean_full(polys + pieces, [], "or")
    else:
        out, _area = boolean_full(polys, pieces, "a_not_b")
    return out


def buffer_features(
    df: DataFrame,
    dist: float,
    resolution: float | None = None,
    method: str = "vector",
    quad_segs: int = 8,
) -> DataFrame:
    """ogr2ogr/`gdal vector buffer` analog: buffer every feature; fully
    eroded features drop. Schema preserved + refreshed envelopes.
    ``method='vector'`` (default) is the exact Minkowski path;
    ``method='grid'`` keeps the EDT raster-mask fast path. Passing a
    ``resolution`` selects the grid path (it is meaningless for the
    vector path — callers who set it predate the vector default)."""
    if method not in ("vector", "grid"):
        raise ValueError(f"unknown buffer method {method!r}")
    if resolution is not None:
        method = "grid"

    def do(batches):
        for pdf in batches:
            keep_idx = []
            wkbs = []
            envs = []
            for i, b in enumerate(pdf["wkb"]):
                g = geom.parse_wkb(bytes(b))
                if method == "vector":
                    out = buffer_polys_exact(g.polygons(), dist, quad_segs)
                else:
                    out = buffer_polys(g.polygons(), dist, resolution)
                if not out:
                    continue
                keep_idx.append(i)
                wkbs.append(geom.wkb_multipolygon(out))
                allc = np.vstack([r for rings in out for r in rings])
                envs.append(
                    (float(allc[:, 0].min()), float(allc[:, 1].min()),
                     float(allc[:, 0].max()), float(allc[:, 1].max()))
                )
            sub = pdf.iloc[keep_idx].copy()
            sub["wkb"] = wkbs
            if envs:
                e = np.array(envs)
                sub["minx"], sub["miny"], sub["maxx"], sub["maxy"] = (
                    e[:, 0], e[:, 1], e[:, 2], e[:, 3]
                )
            yield sub

    from pyspark.sql.types import StructType

    return df.mapInPandas(do, schema=StructType(df.schema.fields))
