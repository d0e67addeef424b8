"""Rasterize: burn vector geometries into raster tiles.

Reference: alg/gdalrasterize.cpp (2,082 LoC) + alg/llrasterize.cpp (712).
Semantics reproduced:
- scanline fill with pixel-center-inside test: y-crossing parity per
  scanline, x intersections rounded with floor(x + 0.5)
  (llrasterize.cpp:105-207 dominant even-odd path)
- burn value from a constant or per-feature attribute
- MERGE_ALG=REPLACE (default) or ADD (gdalrasterize.cpp:563-575)

Spark shape (scale-safe): each feature row explodes into the output
tiles its envelope covers (pure Column math — the same covered-range
explode as tile assignment), then groupBy(tile).applyInPandas burns all
of a tile's features with a fully vectorized scanline kernel (crossings
for ALL scanlines at once via one straddle matrix; span fill via a
+1/-1 diff array + cumsum). No driver collect, no geometry broadcast to
Python — the tile-key shuffle carries each feature's WKB once per
covered tile. Empty tiles are emitted by an anti-join leg so the output
grid is complete, matching GDALRasterizeGeometries writing into a
pre-zeroed band.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from .. import geom
from ..checksum import gdal_checksum


def fill_spans(rings_px: list[np.ndarray], h: int, w: int) -> np.ndarray:
    """Boolean coverage mask of one polygon (rings in pixel coords) by
    even-odd scanline parity at pixel centers, vectorized over all
    scanlines. Matches llrasterize.cpp:105-207: center y = yi + 0.5,
    crossing x rounded floor(x + 0.5)."""
    ys = np.arange(h, dtype=np.float64) + 0.5
    diff = np.zeros((h, w + 1), dtype=np.int64)
    xs_all = []
    yi_all = []
    for ring in rings_px:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 4:
            continue
        y1, y2 = r[:-1, 1], r[1:, 1]
        x1, x2 = r[:-1, 0], r[1:, 0]
        straddle = ((y1[None, :] <= ys[:, None]) & (y2[None, :] > ys[:, None])) | (
            (y2[None, :] <= ys[:, None]) & (y1[None, :] > ys[:, None])
        )
        yi, ei = np.nonzero(straddle)
        if len(yi) == 0:
            continue
        t = (ys[yi] - y1[ei]) / (y2[ei] - y1[ei])
        xs_all.append(x1[ei] + t * (x2[ei] - x1[ei]))
        yi_all.append(yi)
    if not xs_all:
        return np.zeros((h, w), dtype=bool)
    xs = np.concatenate(xs_all)
    yi = np.concatenate(yi_all)
    # sort by (scanline, x); each scanline has an even crossing count, so
    # consecutive pairs within a scanline are the filled spans
    order = np.lexsort((xs, yi))
    xs, yi = xs[order], yi[order]
    _, starts = np.unique(yi, return_index=True)
    idx = np.arange(len(xs))
    # position within each scanline group
    pos = idx - np.repeat(starts, np.diff(np.append(starts, len(xs))))
    is_open = pos % 2 == 0
    x0 = np.clip(np.floor(xs[is_open] + 0.5).astype(np.int64), 0, w)
    x1_ = np.clip(np.floor(xs[~is_open] + 0.5).astype(np.int64), 0, w)
    row = yi[is_open]
    keep = x1_ > x0
    np.add.at(diff, (row[keep], x0[keep]), 1)
    np.add.at(diff, (row[keep], x1_[keep]), -1)
    return np.cumsum(diff[:, :-1], axis=1) > 0


def touched_cells(rings_px: list[np.ndarray], h: int, w: int) -> np.ndarray:
    """Boolean mask of every pixel TOUCHED by a ring edge (exact
    supercover traversal: split each segment at every integer grid line,
    mark the cell containing each sub-segment midpoint) — the
    GDALdllImageLineAllTouched path of llrasterize.cpp.

    Fully vectorized over ALL segments of a ring at once: grid-crossing
    parameters are built with repeat/arange bookkeeping, one lexsort
    orders them per segment, and midpoints burn via one fancy-index —
    no per-segment Python loop (10^6-segment ALL_TOUCHED stays numpy)."""
    mask = np.zeros((h, w), dtype=bool)
    for ring in rings_px:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 2:
            continue
        P, Q = r[:-1], r[1:]
        S = len(P)
        dx = Q[:, 0] - P[:, 0]
        dy = Q[:, 1] - P[:, 1]
        seg_ids = np.arange(S)
        cand_t = [np.zeros(S), np.ones(S)]
        cand_s = [seg_ids, seg_ids]
        for axis, d in ((0, dx), (1, dy)):
            lo = np.ceil(np.minimum(P[:, axis], Q[:, axis]))
            hi = np.floor(np.maximum(P[:, axis], Q[:, axis]))
            n = (hi - lo + 1).astype(np.int64)
            n = np.where((d != 0) & (n > 0), n, 0)
            tot = int(n.sum())
            if tot == 0:
                continue
            seg = np.repeat(seg_ids, n)
            starts = np.cumsum(n) - n
            offs = np.arange(tot) - np.repeat(starts, n)
            g = lo[seg] + offs
            t = (g - P[seg, axis]) / d[seg]
            cand_t.append(np.clip(t, 0.0, 1.0))
            cand_s.append(seg)
        t = np.concatenate(cand_t)
        s = np.concatenate(cand_s)
        order = np.lexsort((t, s))
        t, s = t[order], s[order]
        keep = (s[1:] == s[:-1]) & (t[1:] > t[:-1])  # per-seg, nonzero length
        tm = 0.5 * (t[1:][keep] + t[:-1][keep])
        sj = s[1:][keep]
        cx = np.floor(P[sj, 0] + tm * dx[sj]).astype(np.int64)
        cy = np.floor(P[sj, 1] + tm * dy[sj]).astype(np.int64)
        ok = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        mask[cy[ok], cx[ok]] = True
    return mask


def rasterize_polygon_to_array(
    rings_px: list[np.ndarray], h: int, w: int, value: float, out: np.ndarray,
    add: bool, all_touched: bool = False,
):
    """Burn one polygon into ``out`` (REPLACE or ADD merge); with
    ``all_touched`` every edge-crossed pixel burns too
    (gdalrasterize.cpp:779)."""
    mask = fill_spans(rings_px, h, w)
    if all_touched:
        mask = mask | touched_cells(rings_px, h, w)
    if add:
        out[mask] += value
    else:
        out[mask] = value


def rasterize(
    spark,
    features_df,
    gt,
    width: int,
    height: int,
    burn_col: str | None = None,
    burn_value: float = 1.0,
    merge: str = "replace",
    tile_size: int = 256,
    dtype: str = "float64",
    all_touched: bool = False,
):
    """Distributed rasterize over a tiled output grid. Returns a
    DataFrame of (tile_x, tile_y, w, h, data binary(float64 rows),
    checksum)."""
    add = merge == "add"
    nx = (width + tile_size - 1) // tile_size
    ny = (height + tile_size - 1) // tile_size

    feats = features_df.select(
        "wkb",
        (F.col(burn_col) if burn_col else F.lit(float(burn_value))).cast("double").alias("burnv"),
        "minx", "miny", "maxx", "maxy",
    )
    # covered tile range per feature (column math; gt may have negative
    # y scale, so order the pixel-space bounds explicitly)
    px0 = (F.col("minx") - gt[0]) / gt[1]
    px1 = (F.col("maxx") - gt[0]) / gt[1]
    py0 = (F.col("miny") - gt[3]) / gt[5]
    py1 = (F.col("maxy") - gt[3]) / gt[5]
    ts = float(tile_size)
    tx_lo = F.greatest(F.lit(0), F.floor(F.least(px0, px1) / ts).cast("int"))
    tx_hi = F.least(F.lit(nx - 1), F.floor(F.greatest(px0, px1) / ts).cast("int"))
    ty_lo = F.greatest(F.lit(0), F.floor(F.least(py0, py1) / ts).cast("int"))
    ty_hi = F.least(F.lit(ny - 1), F.floor(F.greatest(py0, py1) / ts).cast("int"))
    exploded = (
        feats.withColumn("_txlo", tx_lo).withColumn("_txhi", tx_hi)
        .withColumn("_tylo", ty_lo).withColumn("_tyhi", ty_hi)
        .where((F.col("_txhi") >= F.col("_txlo")) & (F.col("_tyhi") >= F.col("_tylo")))
        .withColumn("tile_x", F.explode(F.sequence("_txlo", "_txhi")))
        .withColumn("tile_y", F.explode(F.sequence("_tylo", "_tyhi")))
        .select("tile_x", "tile_y", "wkb", "burnv")
    )

    out_schema = "tile_x int, tile_y int, w int, h int, data binary, checksum int"

    def tile_dims(tx: int, ty: int):
        x0 = tx * tile_size
        y0 = ty * tile_size
        return x0, y0, min(tile_size, width - x0), min(tile_size, height - y0)

    def burn_group(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tile_x"].iloc[0])
        ty = int(pdf["tile_y"].iloc[0])
        x0, y0, tw, th = tile_dims(tx, ty)
        out = np.zeros((th, tw), dtype=np.float64)
        # deterministic burn order for REPLACE semantics
        pdf = pdf.sort_values("burnv", kind="stable")
        for r in pdf.itertuples(index=False):
            g = geom.parse_wkb(bytes(r.wkb))
            for rings in g.polygons():
                rings_px = [
                    np.stack(
                        [
                            (ring[:, 0] - gt[0]) / gt[1] - x0,
                            (ring[:, 1] - gt[3]) / gt[5] - y0,
                        ],
                        axis=1,
                    )
                    for ring in rings
                ]
                rasterize_polygon_to_array(rings_px, th, tw, float(r.burnv), out, add, all_touched)
        return pd.DataFrame(
            [
                {
                    "tile_x": tx, "tile_y": ty, "w": tw, "h": th,
                    "data": out.astype(dtype).tobytes(),
                    "checksum": gdal_checksum(out),
                }
            ]
        )

    burned = exploded.groupBy("tile_x", "tile_y").applyInPandas(
        burn_group, schema=out_schema
    )

    # empty tiles: the grid minus the burned keys, zero-filled
    all_tiles = spark.range(nx * ny).select(
        (F.col("id") % nx).cast("int").alias("tile_x"),
        (F.col("id") / nx).cast("int").alias("tile_y"),
    )
    empty = all_tiles.join(
        exploded.select("tile_x", "tile_y").distinct(), ["tile_x", "tile_y"], "left_anti"
    )

    def zero_tiles(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                _x0, _y0, tw, th = tile_dims(int(r.tile_x), int(r.tile_y))
                z = np.zeros((th, tw), dtype=np.float64)
                rows.append(
                    {
                        "tile_x": int(r.tile_x), "tile_y": int(r.tile_y),
                        "w": tw, "h": th,
                        "data": z.astype(dtype).tobytes(),
                        "checksum": gdal_checksum(z),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["tile_x", "tile_y", "w", "h", "data", "checksum"]
            )

    return burned.unionByName(empty.mapInPandas(zero_tiles, schema=out_schema))
