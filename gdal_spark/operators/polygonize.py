"""Polygonize: raster regions of equal value -> vector polygons.

Reference: alg/polygonize.cpp (GDALPolygonize, 587 LoC) — two-pass
connected-component labeling with an RPolygonizer ring builder, 4- or
8-connectedness (GDALPolygonize "8CONNECTED" option), nodata exclusion.

Spark mapping: the raster arrives as the engine's tiled layout
(tile_x, tile_y, w, h, data float64 rows — the rasterize output schema).

1. Per tile (one pandas pass): run-based union-find connected components
   (``label_components``), then per-region boundary edges in GLOBAL
   integer pixel-corner coordinates (only edges whose neighbor differs —
   O(perimeter), not O(area)) plus the tile-border runs needed for
   stitching.
2. Cross-tile stitch: border runs of adjacent tiles equi-join on the
   shared edge; matching (value-equal, overlapping) run pairs become
   label-equivalence EDGES. The equivalence graph is tiny (one node per
   local region that touches a tile border), so it is resolved with a
   driver-side union-find and broadcast back — the pixel data never
   leaves the executors.
3. Final groupBy(global label): directed boundary segments of one region
   meet in one task; opposite-direction duplicates along interior tile
   borders cancel exactly (integer coordinates), the survivors chain
   into rings (outer + holes), and the geo transform maps pixel corners
   to world coordinates.

The per-region ring build holds one region's boundary in memory — same
contract as the reference's RPolygonizer. Giant regions are the skew
case; their *boundary* is what shuffles, not their area.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import geom
from ..booleans import assemble_polygons


# ---------------------------------------------------------------------------
# local kernel: run-based union-find CC
# ---------------------------------------------------------------------------


class _UF:
    __slots__ = ("p",)

    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, a: int) -> int:
        p = self.p
        while p[a] != a:
            p[a] = p[p[a]]
            a = p[a]
        return a

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _row_runs(row: np.ndarray):
    """(starts, ends, values) of equal-value runs in one row."""
    n = len(row)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), row
    brk = np.nonzero(row[1:] != row[:-1])[0] + 1
    starts = np.concatenate([[0], brk])
    ends = np.concatenate([brk, [n]])
    return starts, ends, row[starts]


def label_components(
    arr: np.ndarray, connect8: bool = False, exclude=None
) -> tuple[np.ndarray, int]:
    """Connected-component labels (1..n; 0 = excluded) of equal-value
    regions, 4- or 8-connected — the GDALPolygonize labeling pass."""
    a = np.asarray(arr)
    h, w = a.shape
    labels = np.zeros((h, w), dtype=np.int64)
    run_rows = []
    nruns = 0
    excl = set(exclude) if exclude is not None else set()
    for r in range(h):
        s, e, v = _row_runs(a[r])
        ids = np.arange(nruns, nruns + len(s))
        nruns += len(s)
        run_rows.append((s, e, v, ids))
    uf = _UF(nruns)
    pad = 1 if connect8 else 0
    for r in range(1, h):
        s0, e0, v0, i0 = run_rows[r - 1]
        s1, e1, v1, i1 = run_rows[r]
        j = 0
        for k in range(len(s1)):
            while j < len(s0) and e0[j] + pad <= s1[k]:
                j += 1
            jj = j
            while jj < len(s0) and s0[jj] < e1[k] + pad:
                if v0[jj] == v1[k]:
                    uf.union(int(i0[jj]), int(i1[k]))
                jj += 1
    # run id -> dense component label (excluded values -> 0)
    root = np.array([uf.find(i) for i in range(nruns)], dtype=np.int64)
    dense = {}
    nxt = 1
    for r in range(h):
        s, e, v, ids = run_rows[r]
        for k in range(len(s)):
            if v[k] in excl or (isinstance(v[k], float) and np.isnan(v[k])):
                continue
            rt = int(root[ids[k]])
            lab = dense.get(rt)
            if lab is None:
                lab = nxt
                dense[rt] = lab
                nxt += 1
            labels[r, s[k]:e[k]] = lab
    return labels, nxt - 1


def boundary_segments(labels: np.ndarray, origin=(0, 0)):
    """Directed boundary edges per label, region-on-the-inside clockwise
    in (x right, y down) pixel-corner coordinates (which flips to CCW
    once a north-up geotransform inverts y). Only edges whose neighbor
    has a different label are emitted — O(perimeter).

    Returns {label: [(x0, y0, x1, y1), ...]} with GLOBAL integer coords
    offset by ``origin`` = (x_off, y_off)."""
    h, w = labels.shape
    ox, oy = origin
    segs: dict[int, list] = defaultdict(list)

    padded = np.zeros((h + 2, w + 2), dtype=labels.dtype)
    padded[1:-1, 1:-1] = labels
    lab = padded[1:-1, 1:-1]

    def emit(mask, mk):
        ys, xs = np.nonzero(mask)
        for r, c in zip(ys.tolist(), xs.tolist()):
            L = int(lab[r, c])
            if L == 0:
                continue
            x, y = c + ox, r + oy
            segs[L].append(mk(x, y))

    # top edge: neighbor above differs
    emit(lab != padded[:-2, 1:-1], lambda x, y: (x, y, x + 1, y))
    # right edge
    emit(lab != padded[1:-1, 2:], lambda x, y: (x + 1, y, x + 1, y + 1))
    # bottom edge
    emit(lab != padded[2:, 1:-1], lambda x, y: (x + 1, y + 1, x, y + 1))
    # left edge
    emit(lab != padded[1:-1, :-2], lambda x, y: (x, y + 1, x, y))
    return segs


def chain_rings(segments) -> list[np.ndarray]:
    """Cancel opposite duplicates, then chain directed integer segments
    into closed rings. At pinch vertices the leftmost-continuation is
    arbitrary but deterministic (sorted adjacency)."""
    net: dict[tuple, int] = defaultdict(int)
    for x0, y0, x1, y1 in segments:
        a, b = (x0, y0), (x1, y1)
        if (b, a) in net and net[(b, a)] > 0:
            net[(b, a)] -= 1
            if net[(b, a)] == 0:
                del net[(b, a)]
        else:
            net[(a, b)] += 1
    adj: dict[tuple, list] = defaultdict(list)
    n = 0
    for (a, b), cnt in net.items():
        for _ in range(cnt):
            adj[a].append(b)
            n += 1
    for v in adj.values():
        v.sort()
    rings = []
    while n > 0:
        start = min(k for k, v in adj.items() if v)
        chain = [start]
        cur = adj[start].pop()
        n -= 1
        while cur != start:
            chain.append(cur)
            nxts = adj[cur]
            if not nxts:
                break  # broken chain: drop
            cur = nxts.pop()
            n -= 1
        else:
            if len(chain) >= 3:
                coords = np.array(chain + [chain[0]], dtype=np.float64)
                rings.append(_drop_collinear(coords))
    return rings


def _drop_collinear(ring: np.ndarray) -> np.ndarray:
    """Remove interior collinear vertices (unit-edge chains -> runs)."""
    if len(ring) < 4:
        return ring
    pts = ring[:-1]
    prv = np.roll(pts, 1, axis=0)
    nxt = np.roll(pts, -1, axis=0)
    cross = (pts[:, 0] - prv[:, 0]) * (nxt[:, 1] - pts[:, 1]) - (
        pts[:, 1] - prv[:, 1]
    ) * (nxt[:, 0] - pts[:, 0])
    keep = cross != 0
    if keep.sum() < 3:
        return ring
    out = pts[keep]
    return np.vstack([out, out[0]])


def polygonize_array(arr, gt, connect8: bool = False, exclude=None):
    """Single-array polygonize (the local oracle): returns a list of
    (value, n_pixels, polygons) with polygons in geo coordinates."""
    labels, n = label_components(arr, connect8, exclude)
    segs = boundary_segments(labels)
    out = []
    for lab in range(1, n + 1):
        rings = chain_rings(segs[lab])
        geo_rings = [_px_ring_to_geo(r, gt) for r in rings]
        polys = assemble_polygons(geo_rings)
        mask = labels == lab
        vals = np.asarray(arr)[mask]
        out.append((float(vals[0]), int(mask.sum()), polys))
    return out


def _px_ring_to_geo(ring: np.ndarray, gt) -> np.ndarray:
    x = gt[0] + ring[:, 0] * gt[1] + ring[:, 1] * gt[2]
    y = gt[3] + ring[:, 0] * gt[4] + ring[:, 1] * gt[5]
    out = np.stack([x, y], axis=1)
    # a mirroring transform (north-up: gt5 < 0) flips orientation; restore
    # it so exteriors stay CCW and assemble_polygons classifies correctly
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det < 0:
        out = out[::-1].copy()
    return out


# ---------------------------------------------------------------------------
# distributed operator
# ---------------------------------------------------------------------------

_SEG_SCHEMA = (
    "key long, value double, npix long, x0 long, y0 long, x1 long, y1 long"
)
_BORDER_SCHEMA = (
    "side string, coord long, pos0 long, pos1 long, value double, key long"
)

OUT_SCHEMA = (
    "fid long, value double, n_pixels long, wkb binary, "
    "minx double, miny double, maxx double, maxy double, area double"
)


def _local_pass(pdf_iter, tile_size, connect8, exclude, what: str):
    """what='segs': per-region boundary segments + npix carried on the
    first segment; what='border': tile-border runs for stitching."""
    for pdf in pdf_iter:
        seg_rows = []
        border_rows = []
        for r in pdf.itertuples(index=False):
            arr = np.frombuffer(bytes(r.data), dtype=np.float64).reshape(r.h, r.w)
            labels, n = label_components(arr, connect8, exclude)
            if n == 0:
                continue
            tkey = (int(r.tile_x) << 20 | int(r.tile_y)) << 22
            ox, oy = int(r.tile_x) * tile_size, int(r.tile_y) * tile_size
            if what == "segs":
                segs = boundary_segments(labels, origin=(ox, oy))
                counts = np.bincount(labels.ravel(), minlength=n + 1)
                firstval = {}
                for lab in range(1, n + 1):
                    m = labels == lab
                    ys, xs = np.nonzero(m)
                    firstval[lab] = float(arr[ys[0], xs[0]])
                for lab, ss in segs.items():
                    key = tkey | lab
                    npix = int(counts[lab])
                    for i, (x0, y0, x1, y1) in enumerate(ss):
                        seg_rows.append(
                            {
                                "key": key, "value": firstval[lab],
                                "npix": npix if i == 0 else 0,
                                "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                            }
                        )
            else:
                h, w = labels.shape
                for side, line_lab, line_val, coord, off in (
                    ("v", labels[:, -1], arr[:, -1], ox + w, oy),     # right border
                    ("v", labels[:, 0], arr[:, 0], ox, oy),           # left border
                    ("h", labels[-1, :], arr[-1, :], oy + h, ox),     # bottom border
                    ("h", labels[0, :], arr[0, :], oy, ox),           # top border
                ):
                    s, e, v = _row_runs(line_lab)
                    for k in range(len(s)):
                        lab = int(v[k])
                        if lab == 0:
                            continue
                        border_rows.append(
                            {
                                "side": side, "coord": int(coord),
                                "pos0": int(s[k]) + off, "pos1": int(e[k]) + off,
                                "value": float(line_val[s[k]]),
                                "key": tkey | lab,
                            }
                        )
        if what == "segs":
            yield pd.DataFrame(
                seg_rows,
                columns=["key", "value", "npix", "x0", "y0", "x1", "y1"],
            )
        else:
            yield pd.DataFrame(
                border_rows,
                columns=["side", "coord", "pos0", "pos1", "value", "key"],
            )


def polygonize_tiles(
    tiles_df: DataFrame,
    gt,
    tile_size: int = 256,
    connect8: bool = False,
    exclude=(0.0,),
) -> DataFrame:
    """Distributed polygonize over the tiled raster layout. Returns one
    row per connected region: fid (stable global label), value, pixel
    count, multipolygon WKB in geo coords (+ envelope, area)."""
    spark = tiles_df.sparkSession
    src = tiles_df.select("tile_x", "tile_y", "w", "h", "data")

    # pass 1a: border runs -> equivalence edges (tiny; driver union-find)
    borders = src.mapInPandas(
        lambda it: _local_pass(it, tile_size, connect8, exclude, "border"),
        schema=_BORDER_SCHEMA,
    )
    a = borders
    b = borders.select(
        F.col("side").alias("side"), F.col("coord").alias("coord_b"),
        F.col("pos0").alias("pos0_b"), F.col("pos1").alias("pos1_b"),
        F.col("value").alias("value_b"), F.col("key").alias("key_b"),
    )
    pad = 1 if connect8 else 0  # 8-connect: runs may link diagonally
    pairs = (
        a.join(b, (a["side"] == b["side"]) & (a["coord"] == F.col("coord_b")), "inner")
        .where(
            (F.col("key") < F.col("key_b"))
            & (F.col("value") == F.col("value_b"))
            & (F.col("pos0") < F.col("pos1_b") + F.lit(pad))
            & (F.col("pos1") + F.lit(pad) > F.col("pos0_b"))
        )
        .select("key", "key_b")
        .distinct()
    )
    # keys on opposite sides of the same grid line share `coord`; a tile's
    # own two sides never collide because left/right emit distinct coords
    edges = [(int(r.key), int(r.key_b)) for r in pairs.collect()]
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    mapping = [(k, find(k)) for k in parent]

    # pass 1b: boundary segments, remapped to global labels via a
    # broadcast join (JVM-side; no Python UDF in the hot path)
    segs = src.mapInPandas(
        lambda it: _local_pass(it, tile_size, connect8, exclude, "segs"),
        schema=_SEG_SCHEMA,
    )
    if mapping:
        mdf = spark.createDataFrame(mapping, "key long, gkey0 long")
        remapped = segs.join(F.broadcast(mdf), "key", "left").withColumn(
            "gkey", F.coalesce(F.col("gkey0"), F.col("key"))
        ).drop("gkey0")
    else:
        remapped = segs.withColumn("gkey", F.col("key"))

    # pass 2: one region per group -> chain rings, emit polygon
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [
            "fid", "value", "n_pixels", "wkb",
            "minx", "miny", "maxx", "maxy", "area",
        ]
        if len(pdf) == 0:
            return pd.DataFrame(columns=cols)
        ss = list(
            zip(
                pdf["x0"].astype(int), pdf["y0"].astype(int),
                pdf["x1"].astype(int), pdf["y1"].astype(int),
            )
        )
        rings = chain_rings(ss)
        geo_rings = [_px_ring_to_geo(r, gt) for r in rings]
        polys = assemble_polygons(geo_rings)
        if not polys:
            return pd.DataFrame(columns=cols)
        area, _c = geom.polygon_area_centroid(polys)
        allc = np.vstack([r for rings_ in polys for r in rings_])
        return pd.DataFrame(
            [
                {
                    "fid": int(pdf["gkey"].iloc[0]),
                    "value": float(pdf["value"].iloc[0]),
                    "n_pixels": int(pdf["npix"].sum()),
                    "wkb": geom.wkb_multipolygon(polys),
                    "minx": float(allc[:, 0].min()),
                    "miny": float(allc[:, 1].min()),
                    "maxx": float(allc[:, 0].max()),
                    "maxy": float(allc[:, 1].max()),
                    "area": float(area),
                }
            ],
            columns=cols,
        )

    return remapped.groupBy("gkey").applyInPandas(build, schema=OUT_SCHEMA)
