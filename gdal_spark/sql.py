"""ExecuteSQL facade — the engine's GDALDataset::ExecuteSQL analog.

Reference lifecycle (SURVEY.md §3.1): parse -> analyze -> volcano
iterator. Here the string goes straight to ``spark.sql`` (Catalyst is
the parser/analyzer/optimizer), after registering the layers as temp
views and the geometry/text helpers as SQL functions — the
`swq_custom_func_registrar` extension point (ogr/ogr_swq.h:415-433)
mapped to ``spark.udf.register``. Spark SQL is a strict superset of OGR
SQL (GROUP BY / windows / set ops come free; SURVEY.md §2.4-2.5).

Registered functions:
- st_contains(wkb, x, y)      exact ray-cast PIP (ogrlinearring.cpp:453)
- st_envelope_intersects(...) envelope predicate (phase-1 filter)
- st_centroid_x/y(wkb)        shoelace centroid
- st_distance(wkb, x, y)      0 inside, else boundary distance
- gs_token_count(text) etc. are plain column exprs — use functions.text
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BinaryType, BooleanType, DoubleType, StringType

from . import geom


def _per_poly(wkbs: pd.Series, xs: pd.Series, ys: pd.Series, fn):
    # SQL semantics: NULL geometry in -> NaN/False out, never a crash
    out = np.full(len(wkbs), np.nan, dtype=np.float64)
    px = xs.to_numpy(dtype=float)
    py = ys.to_numpy(dtype=float)
    groups: dict[bytes, list[int]] = {}
    for i, b in enumerate(wkbs):
        if b is None:
            continue
        groups.setdefault(bytes(b), []).append(i)
    for wkb, idxs in groups.items():
        g = geom.parse_wkb(wkb)
        ii = np.asarray(idxs)
        out[ii] = fn(g, px[ii], py[ii])
    return out


@F.pandas_udf(BooleanType())
def _st_contains(wkbs: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
    vals = _per_poly(wkbs, xs, ys, lambda g, px, py: geom.points_in_geometry(px, py, g))
    # SQL three-valued logic: a NULL geometry OR a NULL coordinate
    # propagates as NULL, so NOT st_contains(...) does not resurrect
    # NULL rows of either shape
    out = pd.array(vals == 1.0, dtype="boolean")
    out[np.isnan(vals) | xs.isna().to_numpy() | ys.isna().to_numpy()] = pd.NA
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def _st_distance(wkbs: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
    def dist(g, px, py):
        best = np.full(px.shape, np.inf)
        for rings in g.polygons():
            best = np.minimum(best, geom.points_to_polygon_dist(px, py, rings))
        return best

    return pd.Series(_per_poly(wkbs, xs, ys, dist))


@F.pandas_udf(DoubleType())
def _st_centroid_x(wkbs: pd.Series) -> pd.Series:
    return pd.Series([None if b is None else _centroid(bytes(b))[0] for b in wkbs])


@F.pandas_udf(DoubleType())
def _st_centroid_y(wkbs: pd.Series) -> pd.Series:
    return pd.Series([None if b is None else _centroid(bytes(b))[1] for b in wkbs])


def _centroid(wkb: bytes):
    g = geom.parse_wkb(wkb)
    ta, (cx, cy) = geom.polygon_area_centroid(g.polygons())
    if ta == 0:
        if g.kind == geom.WKB_POINT:
            return float(g.parts[0, 0]), float(g.parts[0, 1])
        return float("nan"), float("nan")
    return cx, cy


@F.pandas_udf(StringType())
def _st_astext(wkbs: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else geom.geometry_to_wkt(geom.parse_wkb(bytes(b)))
         for b in wkbs]
    )


@F.pandas_udf(BinaryType())
def _st_geomfromtext(wkts: pd.Series) -> pd.Series:
    return pd.Series(
        [geom.geometry_to_wkb(geom.parse_wkt(str(s))) for s in wkts]
    )


@F.pandas_udf(StringType())
def _st_asgeojson(wkbs: pd.Series) -> pd.Series:
    import json

    return pd.Series(
        [None if b is None
         else json.dumps(geom.geometry_to_geojson(geom.parse_wkb(bytes(b))))
         for b in wkbs]
    )


@F.pandas_udf(BinaryType())
def _st_geomfromgeojson(js: pd.Series) -> pd.Series:
    return pd.Series(
        [geom.geometry_to_wkb(geom.parse_geojson(str(s))) for s in js]
    )


@F.pandas_udf(DoubleType())
def _st_area(wkbs: pd.Series) -> pd.Series:
    out = []
    for b in wkbs:
        if b is None:
            out.append(None)
            continue
        a, _c = geom.polygon_area_centroid(geom.parse_wkb(bytes(b)).polygons())
        out.append(a)
    return pd.Series(out)


def _boundaries_touch(ga, gb) -> bool:
    """OGC Intersects includes pure boundary contact (shared edge or
    vertex) even when the overlap AREA is zero: test every edge pair
    with inclusive parameters, plus vertex-on-boundary containment."""
    ra = [np.asarray(r, dtype=np.float64) for poly in ga.polygons() for r in poly]
    rb = [np.asarray(r, dtype=np.float64) for poly in gb.polygons() for r in poly]
    if not ra or not rb:
        return False
    A = np.vstack([r[:-1] for r in ra]); B = np.vstack([r[1:] for r in ra])
    C = np.vstack([r[:-1] for r in rb]); D = np.vstack([r[1:] for r in rb])
    r = B - A; s = D - C
    den = r[:, None, 0] * s[None, :, 1] - r[:, None, 1] * s[None, :, 0]
    dpx = C[None, :, 0] - A[:, None, 0]
    dpy = C[None, :, 1] - A[:, None, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (dpx * s[None, :, 1] - dpy * s[None, :, 0]) / den
        u = (dpx * r[:, None, 1] - dpy * r[:, None, 0]) / den
    hit = (den != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    if bool(hit.any()):
        return True
    # collinear overlap / vertex containment: any vertex of one inside
    # (or on) the other
    for g1, g2 in ((ga, gb), (gb, ga)):
        for poly in g1.polygons():
            for ring in poly:
                px, py = ring[:, 0], ring[:, 1]
                if bool(np.any(geom.points_in_geometry(px, py, g2))):
                    return True
    return False


@F.pandas_udf(BooleanType())
def _st_intersects(wa: pd.Series, wb: pd.Series) -> pd.Series:
    from .booleans import boolean_area

    out = []
    for ba, bb in zip(wa, wb):
        if ba is None or bb is None:
            # SQL three-valued logic: NULL operand yields NULL (matches OGR
            # SQL; a False here would flip under NOT and keep NULL rows)
            out.append(None)
            continue
        ga = geom.parse_wkb(bytes(ba))
        gb = geom.parse_wkb(bytes(bb))
        ea, eb = ga.envelope(), gb.envelope()
        if ea[0] > eb[2] or ea[2] < eb[0] or ea[1] > eb[3] or ea[3] < eb[1]:
            out.append(False)
            continue
        if boolean_area(ga.polygons(), gb.polygons(), "and") > 0:
            out.append(True)
            continue
        # OGC semantics: touching boundaries intersect too
        out.append(_boundaries_touch(ga, gb))
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def _st_intersection_area(wa: pd.Series, wb: pd.Series) -> pd.Series:
    from .booleans import boolean_area

    return pd.Series(
        [
            None
            if ba is None or bb is None
            else boolean_area(
                geom.parse_wkb(bytes(ba)).polygons(),
                geom.parse_wkb(bytes(bb)).polygons(),
                "and",
            )
            for ba, bb in zip(wa, wb)
        ]
    )


@F.pandas_udf(BinaryType())
def _st_buffer(wkbs: pd.Series, dists: pd.Series) -> pd.Series:
    from .operators.buffer import buffer_polys_exact

    out = []
    for b, d in zip(wkbs, dists):
        if b is None:
            out.append(None)
            continue
        polys = buffer_polys_exact(geom.parse_wkb(bytes(b)).polygons(), float(d))
        out.append(geom.wkb_multipolygon(polys) if polys else None)
    return pd.Series(out)


@F.pandas_udf(BinaryType())
def _st_simplify(wkbs: pd.Series, tols: pd.Series) -> pd.Series:
    from .operators.vector import simplify_line, simplify_ring

    out = []
    for b, tol in zip(wkbs, tols):
        if b is None:
            out.append(None)
            continue
        g = geom.parse_wkb(bytes(b))
        # OGR Simplify: points pass through; linestrings use open-chain
        # DP; only polygonal kinds go through the ring simplifier
        if g.kind == geom.WKB_POINT:
            out.append(bytes(b))
            continue
        if g.kind in (geom.WKB_LINESTRING, geom.WKB_MULTILINESTRING):
            parts = g.parts if g.kind == geom.WKB_MULTILINESTRING else [g.parts[0]]
            simped = [simplify_line(np.asarray(pp, dtype=np.float64), float(tol))
                      for pp in parts]
            out.append(
                geom.geometry_to_wkb(geom.Geometry(g.kind, simped if g.kind == geom.WKB_MULTILINESTRING else simped))
                if g.kind == geom.WKB_MULTILINESTRING
                else geom.wkb_linestring(simped[0])
            )
            continue
        polys = []
        for rings in g.polygons():
            rs = [simplify_ring(np.asarray(r, dtype=np.float64), float(tol)) for r in rings]
            rs = [r for r in rs if len(r) >= 4]
            if rs:
                polys.append(rs)
        out.append(geom.wkb_multipolygon(polys) if polys else None)
    return pd.Series(out)


@F.pandas_udf(BinaryType())
def _st_convexhull(wkbs: pd.Series) -> pd.Series:
    from .operators.hull import convex_hull_wkb

    return pd.Series([convex_hull_wkb(b) for b in wkbs])


@F.pandas_udf(BinaryType())
def _st_makevalid(wkbs: pd.Series) -> pd.Series:
    from .booleans import boolean_full

    out = []
    for b in wkbs:
        if b is None:
            out.append(None)
            continue
        g = geom.parse_wkb(bytes(b))
        polys, area = boolean_full(g.polygons(), [], "or")
        out.append(geom.wkb_multipolygon(polys) if polys and area > 0 else None)
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def _st_geodesic_distance(
    lon1: pd.Series, lat1: pd.Series, lon2: pd.Series, lat2: pd.Series
) -> pd.Series:
    """WGS84 geodesic distance in meters (Vincenty; the
    GeographicLib-backed surface of GDAL >= 3.9). NULL in -> NULL out."""
    from .geodesic import vincenty_inverse

    d = vincenty_inverse(
        lon1.to_numpy(dtype=float),
        lat1.to_numpy(dtype=float),
        lon2.to_numpy(dtype=float),
        lat2.to_numpy(dtype=float),
    )
    out = pd.Series(d)
    out[lon1.isna() | lat1.isna() | lon2.isna() | lat2.isna()] = None
    return out


@F.pandas_udf(DoubleType())
def _st_geodesic_area(wkbs: pd.Series) -> pd.Series:
    """Ellipsoidal area in m^2 of a lon/lat polygonal geometry
    (OGR_G_GeodesicArea analog; authalic-sphere method, see
    geodesic.geodesic_ring_area)."""
    from .geodesic import geometry_geodesic_area

    return pd.Series(
        [
            None
            if b is None
            else geometry_geodesic_area(geom.parse_wkb(bytes(b)))
            for b in wkbs
        ]
    )


@F.pandas_udf(DoubleType())
def _st_geodesic_length(wkbs: pd.Series) -> pd.Series:
    """Geodesic linework length in meters of a lon/lat geometry
    (OGR_G_GeodesicLength analog, ogr/ogrgeometry.cpp)."""
    from .geodesic import geometry_geodesic_length

    return pd.Series(
        [
            None
            if b is None
            else geometry_geodesic_length(geom.parse_wkb(bytes(b)))
            for b in wkbs
        ]
    )


_KIND_NAMES = {
    geom.WKB_POINT: "POINT",
    geom.WKB_LINESTRING: "LINESTRING",
    geom.WKB_POLYGON: "POLYGON",
    geom.WKB_MULTIPOINT: "MULTIPOINT",
    geom.WKB_MULTILINESTRING: "MULTILINESTRING",
    geom.WKB_MULTIPOLYGON: "MULTIPOLYGON",
    geom.WKB_GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}


@F.pandas_udf(StringType())
def _st_geometrytype(wkbs: pd.Series) -> pd.Series:
    """Geometry type NAME ('POLYGON', ...) — the value of the OGR SQL
    special field OGR_GEOMETRY (ogr/ogr_gensql.cpp special-field
    evaluation; documented in the OGR SQL dialect)."""
    return pd.Series(
        [
            None if b is None else _KIND_NAMES.get(geom.parse_wkb(bytes(b)).kind)
            for b in wkbs
        ]
    )


def register_functions(spark: SparkSession) -> None:
    """Idempotent registration of the st_* SQL surface."""
    spark.udf.register("st_contains", _st_contains)
    spark.udf.register("st_distance", _st_distance)
    spark.udf.register("st_centroid_x", _st_centroid_x)
    spark.udf.register("st_centroid_y", _st_centroid_y)
    spark.udf.register("st_astext", _st_astext)
    spark.udf.register("st_geomfromtext", _st_geomfromtext)
    spark.udf.register("st_asgeojson", _st_asgeojson)
    spark.udf.register("st_geomfromgeojson", _st_geomfromgeojson)
    spark.udf.register("st_area", _st_area)
    spark.udf.register("st_intersects", _st_intersects)
    spark.udf.register("st_intersection_area", _st_intersection_area)
    spark.udf.register("st_buffer", _st_buffer)
    spark.udf.register("st_simplify", _st_simplify)
    spark.udf.register("st_makevalid", _st_makevalid)
    spark.udf.register("st_convexhull", _st_convexhull)
    spark.udf.register("st_geometrytype", _st_geometrytype)
    spark.udf.register("st_geodesic_distance", _st_geodesic_distance)
    spark.udf.register("st_geodesic_length", _st_geodesic_length)
    spark.udf.register("st_geodesic_area", _st_geodesic_area)


def execute_sql(
    spark: SparkSession,
    sql: str,
    layers: dict[str, DataFrame | tuple] | None = None,
) -> DataFrame:
    """Run an SQL statement over named layers (ExecuteSQL semantics:
    layers become tables; st_* functions are available).

    A layer value may be a DataFrame, or a tuple ``(df, geom_col)`` /
    ``(df, geom_col, fid_col)``. With a geometry column named, the OGR
    SQL SPECIAL FIELDS (ogr/ogr_gensql.cpp special-field handling; the
    documented OGR SQL dialect surface) are added to the view:

    - OGR_GEOMETRY   geometry type name ('POLYGON', ...)
    - OGR_GEOM_WKT   WKT of the geometry
    - OGR_GEOM_AREA  polygonal area (0 for non-areal kinds)
    - OGR_STYLE      NULL (the engine carries no style strings)
    - FID            = fid_col, only when one is named — OGR numbers
      features by read order, which a distributed table does not have;
      fabricating one (monotonically_increasing_id) would not be stable
      across runs, so the caller must designate the id column instead.

    The fields are lazy projections — Catalyst prunes any the statement
    does not reference, so unused special fields cost nothing."""
    register_functions(spark)
    for name, spec in (layers or {}).items():
        fid_col = None
        geom_col = None
        if isinstance(spec, tuple):
            df, geom_col, *rest = spec
            fid_col = rest[0] if rest else None
        else:
            df = spec
        if geom_col is not None:
            g = F.col(geom_col)
            df = (
                df.withColumn("OGR_GEOMETRY", _st_geometrytype(g))
                .withColumn("OGR_GEOM_WKT", _st_astext(g))
                .withColumn("OGR_GEOM_AREA", _st_area(g))
                .withColumn("OGR_STYLE", F.lit(None).cast("string"))
            )
            if fid_col is not None:
                df = df.withColumn("FID", F.col(fid_col).cast("long"))
        df.createOrReplaceTempView(name)
    return spark.sql(sql)
