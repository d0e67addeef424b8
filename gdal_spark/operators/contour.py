"""Contour: iso-value lines from a raster band (marching squares).

Reference: alg/contour.cpp + alg/marching_squares/ (GDALContourGenerate):
pixel centers are grid nodes; a contour segment crosses each cell edge
where the two corner values straddle the level, at the linearly
interpolated position; saddle cells disambiguate by the cell-center
average (marching_squares/square.h).

Spark shape: per tile, segments are computed in GLOBAL node coordinates
(cells straddling a tile border get the missing right/bottom corners
from a 1-node halo exchange — thin strips, cogrouped by neighbor tile
id). The per-level segment set then groupBy(level)-chains into
polylines: endpoints shared between adjacent cells are bitwise-identical
floats (same two corner values, same formula), so chaining needs no
tolerance.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import geom


def cell_segments(band: np.ndarray, level: float, origin=(0, 0)):
    """Marching-squares segments for one level over one array.

    Node (r, c) = pixel center; returns segments in (x=c, y=r) node
    coordinates offset by ``origin``. Vectorized case computation; the
    per-case emission loops over matching cells only."""
    b = np.asarray(band, dtype=np.float64)
    h, w = b.shape
    if h < 2 or w < 2:
        return []
    ox, oy = origin
    tl = b[:-1, :-1]
    tr = b[:-1, 1:]
    bl = b[1:, :-1]
    br = b[1:, 1:]
    case = (
        (tl >= level).astype(np.int8)
        | ((tr >= level).astype(np.int8) << 1)
        | ((br >= level).astype(np.int8) << 2)
        | ((bl >= level).astype(np.int8) << 3)
    )
    segs = []

    def interp(v0, v1):
        return (level - v0) / (v1 - v0)

    # cells touching a non-finite corner are SKIPPED, like
    # GDALContourGenerate skips nodata cells — this also makes the tile
    # halo exact: a missing neighbor strip stays NaN and exactly the
    # cells that need it drop out (no rectangle truncation)
    finite = (
        np.isfinite(tl) & np.isfinite(tr) & np.isfinite(bl) & np.isfinite(br)
    )
    ys, xs = np.nonzero((case != 0) & (case != 15) & finite)
    for r, c in zip(ys.tolist(), xs.tolist()):
        v_tl, v_tr = float(tl[r, c]), float(tr[r, c])
        v_bl, v_br = float(bl[r, c]), float(br[r, c])
        # edge crossing points (x, y) in node space
        top = (c + interp(v_tl, v_tr), float(r)) if (v_tl >= level) != (v_tr >= level) else None
        bottom = (c + interp(v_bl, v_br), float(r + 1)) if (v_bl >= level) != (v_br >= level) else None
        left = (float(c), r + interp(v_tl, v_bl)) if (v_tl >= level) != (v_bl >= level) else None
        right = (float(c + 1), r + interp(v_tr, v_br)) if (v_tr >= level) != (v_br >= level) else None
        k = int(case[r, c])
        pairs = []
        if k in (1, 14):
            pairs = [(top, left)]
        elif k in (2, 13):
            pairs = [(top, right)]
        elif k in (3, 12):
            pairs = [(left, right)]
        elif k in (4, 11):
            pairs = [(right, bottom)]
        elif k in (6, 9):
            pairs = [(top, bottom)]
        elif k in (7, 8):
            pairs = [(left, bottom)]
        elif k in (5, 10):
            # saddle: disambiguate with the center average
            center = (v_tl + v_tr + v_bl + v_br) / 4.0
            if (center >= level) == (k == 5):
                pairs = [(top, right), (bottom, left)]
            else:
                pairs = [(top, left), (bottom, right)]
        for a, bb in pairs:
            if a is None or bb is None or a == bb:
                # a == bb: a node lies exactly on the level — both edge
                # crossings collapse onto the corner (degenerate)
                continue
            segs.append((a[0] + ox, a[1] + oy, bb[0] + ox, bb[1] + oy))
    return segs


def chain_polylines(segments):
    """Chain undirected segments into polylines (closed rings stay
    closed; open lines end at data borders). Exact endpoint matching."""
    adj: dict[tuple, list] = defaultdict(list)
    for i, (x0, y0, x1, y1) in enumerate(segments):
        adj[(x0, y0)].append((i, (x1, y1)))
        adj[(x1, y1)].append((i, (x0, y0)))
    used = [False] * len(segments)
    lines = []
    # open chains first: start at degree-1 endpoints
    starts = [p for p, lst in adj.items() if len(lst) == 1]
    for start in sorted(starts):
        if all(used[i] for i, _ in adj[start]):
            continue
        line = [start]
        cur = start
        while True:
            nxt = None
            for i, other in adj[cur]:
                if not used[i]:
                    used[i] = True
                    nxt = other
                    break
            if nxt is None:
                break
            line.append(nxt)
            cur = nxt
        if len(line) >= 2:
            lines.append(np.array(line))
    # remaining are closed loops
    for i0 in range(len(segments)):
        if used[i0]:
            continue
        used[i0] = True
        x0, y0, x1, y1 = segments[i0]
        line = [(x0, y0), (x1, y1)]
        cur = (x1, y1)
        while cur != (x0, y0):
            nxt = None
            for i, other in adj[cur]:
                if not used[i]:
                    used[i] = True
                    nxt = other
                    break
            if nxt is None:
                break
            line.append(nxt)
            cur = nxt
        lines.append(np.array(line))
    return lines


def _nodes_to_geo(line: np.ndarray, gt) -> np.ndarray:
    # node (c, r) = pixel center -> pixel coords (c + 0.5, r + 0.5)
    px = line[:, 0] + 0.5
    py = line[:, 1] + 0.5
    x = gt[0] + px * gt[1] + py * gt[2]
    y = gt[3] + px * gt[4] + py * gt[5]
    return np.stack([x, y], axis=1)


def contour_array(band: np.ndarray, gt, levels):
    """Local contour: [(level, polyline geo-coords array), ...]."""
    out = []
    for lv in levels:
        segs = cell_segments(band, float(lv))
        for line in chain_polylines(segs):
            out.append((float(lv), _nodes_to_geo(line, gt)))
    return out


def contour_levels(base: float, interval: float, vmin: float, vmax: float):
    """GDALContourGenerate level list: base + k*interval within range."""
    k0 = int(np.ceil((vmin - base) / interval))
    k1 = int(np.floor((vmax - base) / interval))
    return [base + k * interval for k in range(k0, k1 + 1)]


OUT_SCHEMA = "level double, n_points int, closed boolean, wkb binary, length double"


def contour_tiles(
    tiles_df: DataFrame, gt, levels, tile_size: int = 256
) -> DataFrame:
    """Distributed contour over the tiled layout: 1-node halo exchange
    (right column + bottom row + corner), per-tile marching squares in
    global node coords, then groupBy(level) chains segments whose
    interior duplicates are bitwise-equal.

    Scale bound: chaining groups ALL of one level's segments into one
    task (parallelism = number of levels). Segment count is
    O(iso-line length), so a continent-scale raster with few levels
    serializes chaining onto few cores — the polygonize-style fix
    (distributed CC over per-tile chains, then per-line groups) is the
    upgrade path if that becomes the bottleneck; for polygon output use
    contour_polygons_tiles, which already inherits polygonize's
    distributed connected components."""
    src = tiles_df.select("tile_x", "tile_y", "w", "h", "data")
    lvls = [float(v) for v in levels]

    def halo_export(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=np.float64).reshape(r.h, r.w)
                # to the LEFT neighbor: our first column; to the TOP: first row;
                # to the TOP-LEFT: corner pixel
                rows.append(
                    {"tile_x": int(r.tile_x) - 1, "tile_y": int(r.tile_y),
                     "kind": "col", "vals": arr[:, 0].tobytes()}
                )
                rows.append(
                    {"tile_x": int(r.tile_x), "tile_y": int(r.tile_y) - 1,
                     "kind": "row", "vals": arr[0, :].tobytes()}
                )
                rows.append(
                    {"tile_x": int(r.tile_x) - 1, "tile_y": int(r.tile_y) - 1,
                     "kind": "corner", "vals": arr[0, 0:1].tobytes()}
                )
            yield pd.DataFrame(rows, columns=["tile_x", "tile_y", "kind", "vals"])

    halos = src.mapInPandas(
        halo_export, schema="tile_x int, tile_y int, kind string, vals binary"
    )

    seg_schema = "level double, x0 double, y0 double, x1 double, y1 double"

    def tile_segments(tile_pdf: pd.DataFrame, halo_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["level", "x0", "y0", "x1", "y1"]
        if len(tile_pdf) == 0:
            return pd.DataFrame(columns=cols)
        r = tile_pdf.iloc[0]
        h, w = int(r["h"]), int(r["w"])
        arr = np.frombuffer(bytes(r["data"]), dtype=np.float64).reshape(h, w)
        ext = np.full((h + 1, w + 1), np.nan)
        ext[:h, :w] = arr
        for n in halo_pdf.itertuples(index=False):
            v = np.frombuffer(bytes(n.vals), dtype=np.float64)
            if n.kind == "col" and len(v) >= h:
                ext[:h, w] = v[:h]
            elif n.kind == "row" and len(v) >= w:
                ext[h, :w] = v[:w]
            elif n.kind == "corner":
                ext[h, w] = v[0]
        # missing halo strips stay NaN; cell_segments' finite-corner
        # mask then skips EXACTLY the cells that depend on them (a
        # sparse layout missing only the diagonal neighbor loses only
        # the corner cell, and nodata NaN inside the tile is skipped
        # like the reference does) — no rectangle truncation
        sub = ext
        ox = int(r["tile_x"]) * tile_size
        oy = int(r["tile_y"]) * tile_size
        rows = []
        for lv in lvls:
            for x0, y0, x1, y1 in cell_segments(sub, lv, origin=(ox, oy)):
                rows.append({"level": lv, "x0": x0, "y0": y0, "x1": x1, "y1": y1})
        return pd.DataFrame(rows, columns=cols)

    segs = (
        src.groupBy("tile_x", "tile_y")
        .cogroup(halos.groupBy("tile_x", "tile_y"))
        .applyInPandas(tile_segments, schema=seg_schema)
    )

    def build_lines(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["level", "n_points", "closed", "wkb", "length"]
        if len(pdf) == 0:
            return pd.DataFrame(columns=cols)
        lv = float(pdf["level"].iloc[0])
        seg_list = list(
            zip(pdf["x0"], pdf["y0"], pdf["x1"], pdf["y1"])
        )
        rows = []
        for line in chain_polylines(seg_list):
            g = _nodes_to_geo(line, gt)
            closed = bool(np.array_equal(g[0], g[-1]))
            length = float(np.hypot(*(np.diff(g, axis=0).T)).sum())
            rows.append(
                {
                    "level": lv, "n_points": len(g), "closed": closed,
                    "wkb": geom.wkb_linestring(g), "length": length,
                }
            )
        return pd.DataFrame(rows, columns=cols)

    return segs.groupBy("level").applyInPandas(build_lines, schema=OUT_SCHEMA)


# ---------------------------------------------------------------------------
# Contour polygons (gdal_contour -p)
# ---------------------------------------------------------------------------
# Reference: apps/gdal_contour_lib.cpp polygon mode — polygons covering
# each [level_i, level_i+1) band, with the below-first and above-last
# bands included (attributes ELEV_FIELD_MIN/MAX). Re-expressed as a
# composition: classify pixels into band indices (np.digitize), then the
# engine's distributed polygonize produces the band polygons. (The
# reference traces iso-rings directly; classification+polygonize yields
# the same pixel-aligned region decomposition for raster input.)


def classify_levels(band: np.ndarray, levels) -> np.ndarray:
    """Pixel -> 1-based level-band index: 1 = below levels[0],
    len(levels)+1 = above the last level. Bands are [lo, hi). Non-finite
    (nodata) pixels map to band 0, which the polygonize stage excludes —
    np.digitize would otherwise put NaN past the last edge and inflate
    the top band (gdal_contour -p excludes nodata)."""
    b = np.asarray(band, dtype=np.float64)
    cls = np.digitize(b, np.asarray(levels, dtype=np.float64)) + 1.0
    cls[~np.isfinite(b)] = 0.0
    return cls


def band_bounds(levels):
    """[(band_index, lo, hi)] with -inf/+inf end caps."""
    edges = [float("-inf")] + [float(v) for v in levels] + [float("inf")]
    return [(k + 1, edges[k], edges[k + 1]) for k in range(len(edges) - 1)]


def contour_polygons_array(band: np.ndarray, gt, levels,
                           connect8: bool = False):
    """Local kernel/oracle: [(band_index, lo, hi, n_pixels, polygons)]
    per connected region of one level band."""
    from .polygonize import polygonize_array

    cls = classify_levels(band, levels)
    bounds = dict((k, (lo, hi)) for k, lo, hi in band_bounds(levels))
    out = []
    for value, n_px, polys in polygonize_array(cls, gt, connect8=connect8,
                                               exclude=(0.0,)):
        k = int(value)
        lo, hi = bounds[k]
        out.append((k, lo, hi, n_px, polys))
    return out


def contour_polygons_tiles(
    tiles_df: DataFrame,
    gt,
    levels,
    tile_size: int = 256,
    connect8: bool = False,
    driver_cc_max_edges: int = 100_000,
) -> DataFrame:
    """Distributed contour polygons: classify each tile in a narrow
    stage (float64 bytes in/out, no shuffle), then polygonize_tiles —
    output rows are connected level-band regions with (band, lo, hi,
    n_px, wkb, area). Inherits polygonize's distributed connected
    components, so cross-tile bands stitch without driver state."""
    from .polygonize import polygonize_tiles

    lv = [float(v) for v in levels]

    def classify(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=np.float64).reshape(
                    r.h, r.w
                )
                rows.append(
                    {
                        "tile_x": int(r.tile_x), "tile_y": int(r.tile_y),
                        "w": int(r.w), "h": int(r.h),
                        "data": classify_levels(arr, lv).tobytes(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["tile_x", "tile_y", "w", "h", "data"]
            )

    classified = tiles_df.select(
        "tile_x", "tile_y", "w", "h", "data"
    ).mapInPandas(
        classify, schema="tile_x int, tile_y int, w int, h int, data binary"
    )
    polys = polygonize_tiles(
        classified, gt, tile_size=tile_size, connect8=connect8,
        exclude=(0.0,), driver_cc_max_edges=driver_cc_max_edges,
    )
    edges = band_bounds(lv)
    lo_map = F.create_map(
        *[F.lit(v) for k, lo, hi in edges for v in (float(k), lo)]
    )
    hi_map = F.create_map(
        *[F.lit(v) for k, lo, hi in edges for v in (float(k), hi)]
    )
    return (
        polys.withColumn("band", F.col("value").cast("int"))
        .withColumn("lo", lo_map[F.col("value")])
        .withColumn("hi", hi_map[F.col("value")])
        .drop("value")
    )
