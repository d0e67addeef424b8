"""Vector dataflow operators — the ogr2ogr / `gdal vector` pipeline steps.

Reference: apps/ogr2ogr_lib.cpp (8,801 LoC) composes -where/-select/-spat/
-t_srs/-clipsrc/-explodecollections/...; the new CLI splits them into
steps (apps/gdalalg_vector_*.cpp). Here each step is a DataFrame
transform; geometry-touching steps run one vectorized pandas pass and
refresh the denormalized envelope columns.

Geometry columns follow the engine's vector schema (FIXTURES.md §2):
``fid long, wkb binary, minx..maxy double, attrs...``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, DoubleType, StructField, StructType

from .. import geom
from .warp import geo_transform_points


# -- attribute steps (pure Catalyst) ----------------------------------------


def vector_filter(df: DataFrame, where: str) -> DataFrame:
    """-where (gdalalg_vector_filter.cpp): Catalyst expression filter."""
    return df.filter(where)


def vector_select(df: DataFrame, cols: list[str]) -> DataFrame:
    """-select field list; geometry + envelope always kept."""
    keep = ["fid", "wkb", "minx", "miny", "maxx", "maxy"]
    return df.select(*(keep + [c for c in cols if c not in keep]))


def concat_layers(*dfs: DataFrame) -> DataFrame:
    """`gdal vector concat` = unionByName(allowMissingColumns)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def spatial_filter(df: DataFrame, minx: float, miny: float, maxx: float, maxy: float) -> DataFrame:
    """-spat: envelope intersects the given box (phase-1 only; callers
    wanting exact semantics chain a refine UDF)."""
    return df.where(
        (F.col("maxx") >= minx)
        & (F.col("minx") <= maxx)
        & (F.col("maxy") >= miny)
        & (F.col("miny") <= maxy)
    )


# -- geometry steps (one vectorized pandas pass each) -----------------------


def _geom_map(df: DataFrame, fn, extra_cols: dict | None = None) -> DataFrame:
    """Apply fn(Geometry)->Geometry|None per row; rebuild WKB + envelope.
    Rows where fn returns None (fully clipped away) are dropped."""
    schema = StructType(df.schema.fields)

    def do(batches):
        for pdf in batches:
            keep = []
            new_wkb = []
            envs = []
            for i, b in enumerate(pdf["wkb"]):
                g = geom.parse_wkb(bytes(b))
                out = fn(g)
                if out is None:
                    continue
                wkb = _build_wkb(out)
                keep.append(i)
                new_wkb.append(wkb)
                envs.append(out.envelope())
            sub = pdf.iloc[keep].copy()
            sub["wkb"] = new_wkb
            if envs:
                e = np.array(envs)
                sub["minx"], sub["miny"], sub["maxx"], sub["maxy"] = (
                    e[:, 0], e[:, 1], e[:, 2], e[:, 3]
                )
            yield sub

    return df.mapInPandas(do, schema=schema)


def _build_wkb(g: geom.Geometry) -> bytes:
    # geom.geometry_to_wkb serializes ALL six kinds (the local subset
    # this used to re-implement failed on multipoint/multilinestring)
    return geom.geometry_to_wkb(g)


def reproject_features(df: DataFrame, src_srid: int, dst_srid: int) -> DataFrame:
    """-t_srs: transform every vertex (closed-form 4326<->3857), refresh
    envelopes (the OGRCoordinateTransformation step of ogr2ogr)."""

    def tx(g: geom.Geometry) -> geom.Geometry:
        def tx_ring(r):
            x, y = geo_transform_points(r[:, 0], r[:, 1], src_srid, dst_srid)
            return np.stack([x, y], axis=1)

        if g.kind == geom.WKB_POINT:
            return geom.Geometry(g.kind, tx_ring(g.parts))
        if g.kind in (geom.WKB_LINESTRING, geom.WKB_POLYGON):
            return geom.Geometry(g.kind, [tx_ring(r) for r in g.parts])
        if g.kind == geom.WKB_MULTIPOLYGON:
            return geom.Geometry(g.kind, [[tx_ring(r) for r in rings] for rings in g.parts])
        raise ValueError(f"unsupported kind {g.kind}")

    return _geom_map(df, tx)


def swap_xy(df: DataFrame) -> DataFrame:
    """gdalalg_vector_swap_xy: exchange coordinate axes."""

    def sw(g: geom.Geometry) -> geom.Geometry:
        def s(r):
            return r[:, ::-1].copy()

        if g.kind == geom.WKB_POINT:
            return geom.Geometry(g.kind, s(g.parts))
        if g.kind in (geom.WKB_LINESTRING, geom.WKB_POLYGON):
            return geom.Geometry(g.kind, [s(r) for r in g.parts])
        if g.kind == geom.WKB_MULTIPOLYGON:
            return geom.Geometry(g.kind, [[s(r) for r in rings] for rings in g.parts])
        raise ValueError(f"unsupported kind {g.kind}")

    return _geom_map(df, sw)


def segmentize(df: DataFrame, max_length: float) -> DataFrame:
    """-segmentize: insert vertices so no segment exceeds max_length
    (OGRGeometry::segmentize semantics: uniform subdivision per segment)."""

    def seg_ring(r):
        out = [r[0]]
        for a, b in zip(r[:-1], r[1:]):
            d = float(np.hypot(*(b - a)))
            n = int(np.ceil(d / max_length))
            for k in range(1, n + 1):
                out.append(a + (b - a) * (k / n))
        return np.array(out)

    def seg(g: geom.Geometry) -> geom.Geometry:
        if g.kind == geom.WKB_POINT:
            return g
        if g.kind in (geom.WKB_LINESTRING, geom.WKB_POLYGON):
            return geom.Geometry(g.kind, [seg_ring(r) for r in g.parts])
        if g.kind == geom.WKB_MULTIPOLYGON:
            return geom.Geometry(g.kind, [[seg_ring(r) for r in rings] for rings in g.parts])
        raise ValueError(f"unsupported kind {g.kind}")

    return _geom_map(df, seg)


def explode_collections(df: DataFrame) -> DataFrame:
    """-explodecollections: one row per member polygon of a multipolygon;
    fid stays, a `part` ordinal is appended."""
    schema = StructType(df.schema.fields + [StructField("part", DoubleType())])

    def do(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                g = geom.parse_wkb(bytes(row["wkb"]))
                polys = g.polygons() or [None]
                if g.kind != geom.WKB_MULTIPOLYGON:
                    d = dict(row)
                    d["part"] = 0.0
                    rows.append(d)
                    continue
                for pi, rings in enumerate(g.parts):
                    sub = geom.Geometry(geom.WKB_POLYGON, rings)
                    d = dict(row)
                    d["wkb"] = geom.wkb_polygon(rings)
                    d["minx"], d["miny"], d["maxx"], d["maxy"] = sub.envelope()
                    d["part"] = float(pi)
                    rows.append(d)
            yield pd.DataFrame(rows, columns=list(pdf.columns) + ["part"])

    return df.mapInPandas(do, schema=schema)


# -- rectangle clip (Sutherland-Hodgman) ------------------------------------


def clip_ring_rect(ring: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray | None:
    """Sutherland-Hodgman clip of one ring against an axis-aligned box —
    the -clipsrc/-clipdst rectangle fast path of ogr2ogr_lib.cpp:310."""
    poly = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring

    def clip_edge(pts, inside, intersect):
        if len(pts) == 0:
            return pts
        out = []
        for i in range(len(pts)):
            cur, prv = pts[i], pts[i - 1]
            ci, pi = inside(cur), inside(prv)
            if ci:
                if not pi:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pi:
                out.append(intersect(prv, cur))
        return np.array(out) if out else np.zeros((0, 2))

    def ix(p, q, axis, v):
        t = (v - p[axis]) / (q[axis] - p[axis])
        return p + (q - p) * t

    pts = np.asarray(poly, dtype=np.float64)
    pts = clip_edge(pts, lambda p: p[0] >= minx, lambda p, q: ix(p, q, 0, minx))
    pts = clip_edge(pts, lambda p: p[0] <= maxx, lambda p, q: ix(p, q, 0, maxx))
    pts = clip_edge(pts, lambda p: p[1] >= miny, lambda p, q: ix(p, q, 1, miny))
    pts = clip_edge(pts, lambda p: p[1] <= maxy, lambda p, q: ix(p, q, 1, maxy))
    if len(pts) < 3:
        return None
    return np.vstack([pts, pts[0]])


def clip_features(df: DataFrame, minx: float, miny: float, maxx: float, maxy: float) -> DataFrame:
    """-clipsrc rect: envelope pre-filter (Catalyst) then exact polygon
    clip; fully-outside rows drop, fully-inside rows pass untouched."""
    pre = spatial_filter(df, minx, miny, maxx, maxy)

    def cl(g: geom.Geometry):
        if g.kind == geom.WKB_POLYGON:
            rings = [clip_ring_rect(r, minx, miny, maxx, maxy) for r in g.parts]
            rings = [r for r in rings if r is not None]
            if not rings:
                return None
            return geom.Geometry(geom.WKB_POLYGON, rings)
        if g.kind == geom.WKB_MULTIPOLYGON:
            polys = []
            for rings in g.parts:
                rs = [clip_ring_rect(r, minx, miny, maxx, maxy) for r in rings]
                rs = [r for r in rs if r is not None]
                if rs:
                    polys.append(rs)
            if not polys:
                return None
            return geom.Geometry(geom.WKB_MULTIPOLYGON, polys)
        return g

    return _geom_map(pre, cl)


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker simplification of one closed ring.

    The anchor/farthest-point recursion of the classic algorithm; the
    ring is split at its two mutually-farthest vertices so closure is
    preserved. Rings that would collapse below 3 distinct vertices
    return their minimal triangle-ish form (caller drops degenerates).
    """
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    n = len(pts)
    if n <= 3:
        return np.vstack([pts, pts[0]])
    # split at vertex farthest from vertex 0 to get two open chains
    d0 = ((pts - pts[0]) ** 2).sum(axis=1)
    k = int(d0.argmax())

    def dp(chain: np.ndarray) -> np.ndarray:
        if len(chain) <= 2:
            return chain
        a, b = chain[0], chain[-1]
        ab = b - a
        L2 = float(ab @ ab)
        rel = chain[1:-1] - a
        if L2 == 0:
            d = np.sqrt((rel**2).sum(axis=1))
        else:
            d = np.abs(ab[0] * rel[:, 1] - ab[1] * rel[:, 0]) / np.sqrt(L2)
        i = int(d.argmax())
        if d[i] <= tolerance:
            return np.vstack([a, b])
        left = dp(chain[: i + 2])
        right = dp(chain[i + 1 :])
        return np.vstack([left[:-1], right])

    c1 = dp(pts[: k + 1])
    c2 = dp(np.vstack([pts[k:], pts[0]]))
    out = np.vstack([c1[:-1], c2[:-1]])
    if len(out) < 3:
        return np.vstack([out, out[0]]) if len(out) else out
    return np.vstack([out, out[0]])


def simplify_line(line: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker on an OPEN polyline: endpoints are anchors and
    are always kept — no synthetic closing edge (simplify_ring would
    fabricate one and turn the polyline into a loop)."""
    pts = np.asarray(line, dtype=np.float64)
    if len(pts) <= 2:
        return pts

    def dp(chain: np.ndarray) -> np.ndarray:
        if len(chain) <= 2:
            return chain
        a, b = chain[0], chain[-1]
        ab = b - a
        L2 = float(ab @ ab)
        rel = chain[1:-1] - a
        if L2 == 0:
            d = np.sqrt((rel ** 2).sum(axis=1))
        else:
            d = np.abs(ab[0] * rel[:, 1] - ab[1] * rel[:, 0]) / np.sqrt(L2)
        i = int(d.argmax())
        if d[i] <= tolerance:
            return np.vstack([a, b])
        left = dp(chain[: i + 2])
        right = dp(chain[i + 1 :])
        return np.vstack([left[:-1], right])

    return dp(pts)


def simplify_features(df: DataFrame, tolerance: float) -> DataFrame:
    """-simplify (ogr2ogr_lib.cpp:265): Douglas-Peucker each ring with
    the given tolerance; rings collapsing below 4 points (or to zero
    area) are dropped, fully-collapsed features are removed. (The
    reference uses GEOS SimplifyPreserveTopology; per-ring DP is the
    same distance criterion without the cross-ring guards — documented
    difference.)"""

    def simp(g: geom.Geometry):
        if g.kind not in (geom.WKB_POLYGON, geom.WKB_MULTIPOLYGON):
            if g.kind == geom.WKB_LINESTRING:
                # OPEN-chain DP — a ring simplifier would append a
                # synthetic closing vertex and loop the polyline
                return geom.Geometry(g.kind, [simplify_line(g.parts[0], tolerance)])
            if g.kind == geom.WKB_MULTILINESTRING:
                return geom.Geometry(
                    g.kind, [simplify_line(p, tolerance) for p in g.parts]
                )
            return g
        polys_out = []
        for rings in g.polygons():
            rs = []
            for ring in rings:
                s = simplify_ring(np.asarray(ring, dtype=np.float64), tolerance)
                if len(s) >= 4:
                    a, _ = geom.ring_area_centroid(s)
                    if a != 0:
                        rs.append(s)
            if rs:
                polys_out.append(rs)
        if not polys_out:
            return None
        if g.kind == geom.WKB_POLYGON and len(polys_out) == 1:
            return geom.Geometry(geom.WKB_POLYGON, polys_out[0])
        return geom.Geometry(geom.WKB_MULTIPOLYGON, polys_out)

    return _geom_map(df, simp)


def make_valid_features(df: DataFrame) -> DataFrame:
    """-makevalid (ogr2ogr_lib.cpp:736 / OGRGeometry::MakeValid):
    re-extract a valid polygon set from possibly-invalid input — open
    rings are closed, duplicate consecutive vertices collapse, and
    self-intersections / overlapping rings are resolved by the nonzero
    winding rule through the slab boolean kernel (the same "structure"
    strategy GEOS MakeValid applies). Zero-area features drop."""
    from ..booleans import boolean_full

    def mv(g: geom.Geometry):
        if g.kind not in (geom.WKB_POLYGON, geom.WKB_MULTIPOLYGON):
            return g
        cleaned = []
        for rings in g.polygons():
            rs = []
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)
                if len(r) == 0:
                    continue
                if not np.array_equal(r[0], r[-1]):
                    r = np.vstack([r, r[0]])  # close the ring
                # collapse duplicate consecutive vertices
                keep = np.ones(len(r), dtype=bool)
                keep[1:] = (np.diff(r, axis=0) != 0).any(axis=1)
                r = r[keep]
                if not np.array_equal(r[0], r[-1]):
                    r = np.vstack([r, r[0]])
                if len(r) >= 4:
                    rs.append(r)
            if rs:
                cleaned.append(rs)
        if not cleaned:
            return None
        polys, area = boolean_full(cleaned, [], "or")
        if not polys or area <= 0:
            return None
        return geom.Geometry(geom.WKB_MULTIPOLYGON, polys)

    return _geom_map(df, mv)


def with_centroids(df: DataFrame) -> DataFrame:
    """ST_Centroid analog: area-weighted centroid columns from WKB
    (ogr/ogrgeometry.cpp Centroid / shoelace formula)."""
    out_schema = StructType(
        df.schema.fields
        + [StructField("cx", DoubleType()), StructField("cy", DoubleType())]
    )

    def do(batches):
        for pdf in batches:
            cxs, cys = [], []
            for b in pdf["wkb"]:
                g = geom.parse_wkb(bytes(b))
                _a, (cx, cy) = geom.polygon_area_centroid(g.polygons())
                cxs.append(cx)
                cys.append(cy)
            pdf = pdf.copy()
            pdf["cx"] = cxs
            pdf["cy"] = cys
            yield pdf

    return df.mapInPandas(do, schema=out_schema)


def merge_layers(layers: dict, src_field: str = "src_layer"):
    """ogrmerge -single analog (osgeo_utils/ogrmerge.py): concatenate
    feature layers into one, tagging each row with its source layer name
    (-src_layer_field_name/-src_layer_field_content semantics, the
    "%(DS_BASENAME)s" default). Columns are aligned by name
    (unionByName with allowMissingColumns — absent fields become NULL,
    matching OGR's unioned field schema). Pure Catalyst: a UNION of
    scans, no shuffle until the caller aggregates."""
    from functools import reduce

    tagged = [
        df.withColumn(src_field, F.lit(name)) for name, df in sorted(layers.items())
    ]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), tagged
    )


def vector_info(df: DataFrame, geom_col: str = "wkb") -> DataFrame:
    """ogrinfo -al -so analog (apps/ogrinfo_lib.cpp summary mode): ONE
    aggregation row — feature count, layer extent, and per-geometry-type
    counts as a map. The extent uses the envelope columns when present
    (the engine's footprint contract) and otherwise parses geometries;
    geometry typing is the st_geometrytype kernel."""
    from ..sql import _st_geometrytype

    cols = set(df.columns)
    typed = df.withColumn("_gt", _st_geometrytype(F.col(geom_col)))
    if {"minx", "miny", "maxx", "maxy"} <= cols:
        ext = typed
    else:
        from ..sql import _st_astext  # noqa: F401  (parse path below)
        from .. import geom as _geom
        import pandas as pd

        @F.pandas_udf("minx double, miny double, maxx double, maxy double")
        def _env(wkbs: pd.Series) -> pd.DataFrame:
            rows = []
            for b in wkbs:
                if b is None:
                    rows.append((None, None, None, None))
                    continue
                e = _geom.parse_wkb(bytes(b)).envelope()
                rows.append((float(e[0]), float(e[1]), float(e[2]), float(e[3])))
            return pd.DataFrame(rows, columns=["minx", "miny", "maxx", "maxy"])

        env = _env(F.col(geom_col))
        ext = typed.withColumn("_e", env).select(
            "*", "_e.minx", "_e.miny", "_e.maxx", "_e.maxy"
        )
    per_type = ext.groupBy("_gt").agg(F.count("*").alias("n"))
    summary = ext.agg(
        F.count("*").alias("n_features"),
        F.min("minx").alias("minx"),
        F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"),
        F.max("maxy").alias("maxy"),
    )
    types = per_type.agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct(F.coalesce("_gt", F.lit("NULL")).alias("t"), "n"))
            )
        ).alias("geom_type_counts")
    )
    return summary.crossJoin(types)


def raster_tile_index(
    df: DataFrame,
    t_srs: int | None = None,
    id_col: str = "image_id",
    round_to: int = 3,
) -> DataFrame:
    """gdaltindex analog (apps/gdaltindex_lib.cpp): one footprint
    polygon per raster from its geotransform columns (gt0..gt5, w, h,
    srid) — the tile-index layer raster catalogs are built from.

    Ring order matches gdaltindex: (0,0) -> (w,0) -> (w,h) -> (0,h) ->
    close (gdaltindex_lib.cpp:1112-1124). Coordinates round to
    ``round_to`` decimals and format through DECIMAL so Spark and any
    SQL replay print identically (no scientific notation).

    - ``t_srs=None``: corners stay in each raster's native CRS — pure
      Column math, zero shuffle, fully Catalyst-optimizable.
    - ``t_srs=<epsg>``: corners reproject through the registry (ONE
      Arrow pass, metadata-only — bytes never enter the plan), the
      gdaltindex -t_srs behavior. Corner-only reprojection slightly
      under-covers curved edges, the same caveat gdaltindex has.

    Output: (location, srid, wkt).
    """
    meta = df.select(
        F.col(id_col).alias("location"), "gt0", "gt1", "gt2", "gt3",
        "gt4", "gt5", "w", "h", "srid",
    )
    corners = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]  # in (w,h) units

    if t_srs is None:
        def fmt(c):
            return F.round(c, round_to).cast(f"decimal(24,{round_to})").cast("string")

        parts = [F.lit("POLYGON((")]
        for i, (cx, cy) in enumerate(corners):
            px = F.col("w") * cx
            py = F.col("h") * cy
            x = F.col("gt0") + px * F.col("gt1") + py * F.col("gt2")
            y = F.col("gt3") + px * F.col("gt4") + py * F.col("gt5")
            if i:
                parts.append(F.lit(","))
            parts.extend([fmt(x), F.lit(" "), fmt(y)])
        parts.append(F.lit("))"))
        return meta.select("location", "srid", F.concat(*parts).alias("wkt"))

    def run(batches):
        for pdf in batches:
            w = pdf["w"].to_numpy(dtype=np.float64)
            h = pdf["h"].to_numpy(dtype=np.float64)
            gt = [pdf[f"gt{i}"].to_numpy(dtype=np.float64) for i in range(6)]
            xs, ys = [], []
            for cx, cy in corners:
                px, py = w * cx, h * cy
                xs.append(gt[0] + px * gt[1] + py * gt[2])
                ys.append(gt[3] + px * gt[4] + py * gt[5])
            out_wkt = np.empty(len(pdf), dtype=object)
            srids = pdf["srid"].to_numpy(dtype=np.int64)
            for s in np.unique(srids):
                m = srids == s
                ring = []
                for x, y in zip(xs, ys):
                    tx, ty = (
                        (x[m], y[m]) if int(s) == int(t_srs)
                        else geo_transform_points(x[m], y[m], int(s), int(t_srs))
                    )
                    ring.append((np.round(tx, round_to), np.round(ty, round_to)))
                sub = [
                    "POLYGON(("
                    + ",".join(
                        f"{ring[c][0][j]:.{round_to}f} {ring[c][1][j]:.{round_to}f}"
                        for c in range(5)
                    )
                    + "))"
                    for j in range(int(m.sum()))
                ]
                out_wkt[m] = sub
            yield pd.DataFrame(
                {
                    "location": pdf["location"],
                    "srid": np.full(len(pdf), int(t_srs), dtype=np.int64),
                    "wkt": out_wkt,
                }
            )

    return meta.mapInPandas(run, schema="location string, srid long, wkt string")


def vector_tile_index(spark, paths: list[str]) -> DataFrame:
    """ogrtindex analog (apps/ogrtindex.cpp): one row per vector FILE with
    its layer extent as a POLYGON WKT footprint plus feature count —
    the catalog a spatial query planner prunes against.

    Metadata-only by construction: each format's extent comes from
    header/catalog bytes alone — the shapefile main-file header's bbox
    (spec bytes 36..68), the FlatGeobuf header envelope, the GeoPackage
    gpkg_contents registry row, GeoParquet's 'geo' footer bbox — so
    indexing a thousand files reads a few KB per file, never the
    features. GeoJSONSeq (no header) falls back to a bounded feature
    scan, reported in the ``exact`` column."""
    import json as _json
    import os
    import sqlite3
    import struct as _st

    rows = []
    for p in paths:
        name = os.path.basename(p)
        ext = os.path.splitext(p)[1].lower()
        minx = miny = maxx = maxy = None
        count = None
        exact = True
        if ext == ".shp":
            with open(p, "rb") as f:
                hdr = f.read(100)
            minx, miny, maxx, maxy = _st.unpack_from("<4d", hdr, 36)
        elif ext == ".fgb":
            from ..formats import read_fgb_header

            h = read_fgb_header(p)
            if h["envelope"]:
                minx, miny, maxx, maxy = h["envelope"]
            count = h["features_count"] or None
        elif ext == ".gpkg":
            con = sqlite3.connect(p)
            try:
                r = con.execute(
                    "SELECT min_x, min_y, max_x, max_y, table_name "
                    "FROM gpkg_contents WHERE data_type='features' LIMIT 1"
                ).fetchone()
                if r and r[0] is not None:
                    minx, miny, maxx, maxy = r[:4]
                if r:
                    count = con.execute(
                        f'SELECT COUNT(*) FROM "{r[4]}"'
                    ).fetchone()[0]
            finally:
                con.close()
        elif ext == ".parquet" or os.path.isdir(p):
            from ..formats import geoparquet_metadata

            meta = geoparquet_metadata(p)
            bb = meta["columns"][meta["primary_column"]].get("bbox")
            if bb:
                minx, miny, maxx, maxy = bb
                # per-FILE bbox: for a directory this is only the first
                # part's extent
                exact = not os.path.isdir(p)
        else:
            # headerless ndjson: bounded scan of the first features
            from .. import geom as _geom

            exact = False
            n = 0
            env = [None] * 4
            with open(p, "r", encoding="utf-8") as f:
                for line in f:
                    line = line.lstrip("\x1e").strip().rstrip(",")
                    if not line:
                        continue
                    n += 1
                    if n > 1000:
                        break
                    gj = _json.loads(line).get("geometry")
                    if not gj:
                        continue
                    g = _geom.parse_geojson(gj)
                    e = _geom.Geometry(g.kind, g.parts).envelope()
                    env = [
                        e[0] if env[0] is None else min(env[0], e[0]),
                        e[1] if env[1] is None else min(env[1], e[1]),
                        e[2] if env[2] is None else max(env[2], e[2]),
                        e[3] if env[3] is None else max(env[3], e[3]),
                    ]
            minx, miny, maxx, maxy = env
            count = n if n <= 1000 else None
        wkt = None
        if minx is not None:
            wkt = (
                f"POLYGON (({minx!r} {miny!r}, {maxx!r} {miny!r}, "
                f"{maxx!r} {maxy!r}, {minx!r} {maxy!r}, {minx!r} {miny!r}))"
            )
        rows.append((name, p, wkt, minx, miny, maxx, maxy, count, exact))
    return spark.createDataFrame(
        rows,
        "name string, location string, footprint string, minx double, "
        "miny double, maxx double, maxy double, feature_count long, "
        "exact boolean",
    )
