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
    out = np.zeros(len(wkbs), dtype=np.float64)
    px = xs.to_numpy(dtype=float)
    py = ys.to_numpy(dtype=float)
    groups: dict[bytes, list[int]] = {}
    for i, b in enumerate(wkbs):
        groups.setdefault(bytes(b), []).append(i)
    for wkb, idxs in groups.items():
        g = geom.parse_wkb(wkb)
        ii = np.asarray(idxs)
        out[ii] = fn(g, px[ii], py[ii])
    return out


@F.pandas_udf(BooleanType())
def _st_contains(wkbs: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
    vals = _per_poly(wkbs, xs, ys, lambda g, px, py: geom.points_in_geometry(px, py, g))
    return pd.Series(vals.astype(bool))


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
    return pd.Series([_centroid(bytes(b))[0] for b in wkbs])


@F.pandas_udf(DoubleType())
def _st_centroid_y(wkbs: pd.Series) -> pd.Series:
    return pd.Series([_centroid(bytes(b))[1] for b in wkbs])


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
        [geom.geometry_to_wkt(geom.parse_wkb(bytes(b))) for b in wkbs]
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
        [json.dumps(geom.geometry_to_geojson(geom.parse_wkb(bytes(b)))) for b in wkbs]
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
        a, _c = geom.polygon_area_centroid(geom.parse_wkb(bytes(b)).polygons())
        out.append(a)
    return pd.Series(out)


@F.pandas_udf(BooleanType())
def _st_intersects(wa: pd.Series, wb: pd.Series) -> pd.Series:
    from .booleans import boolean_area

    out = []
    for ba, bb in zip(wa, wb):
        ga = geom.parse_wkb(bytes(ba))
        gb = geom.parse_wkb(bytes(bb))
        ea, eb = ga.envelope(), gb.envelope()
        if ea[0] > eb[2] or ea[2] < eb[0] or ea[1] > eb[3] or ea[3] < eb[1]:
            out.append(False)
            continue
        out.append(boolean_area(ga.polygons(), gb.polygons(), "and") > 0)
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def _st_intersection_area(wa: pd.Series, wb: pd.Series) -> pd.Series:
    from .booleans import boolean_area

    return pd.Series(
        [
            boolean_area(
                geom.parse_wkb(bytes(ba)).polygons(),
                geom.parse_wkb(bytes(bb)).polygons(),
                "and",
            )
            for ba, bb in zip(wa, wb)
        ]
    )


@F.pandas_udf(BinaryType())
def _st_buffer(wkbs: pd.Series, dists: pd.Series) -> pd.Series:
    from .operators.buffer import buffer_polys

    out = []
    for b, d in zip(wkbs, dists):
        polys = buffer_polys(geom.parse_wkb(bytes(b)).polygons(), float(d))
        out.append(geom.wkb_multipolygon(polys) if polys else None)
    return pd.Series(out)


@F.pandas_udf(BinaryType())
def _st_simplify(wkbs: pd.Series, tols: pd.Series) -> pd.Series:
    from .operators.vector import simplify_ring

    out = []
    for b, tol in zip(wkbs, tols):
        g = geom.parse_wkb(bytes(b))
        polys = []
        for rings in g.polygons():
            rs = [simplify_ring(np.asarray(r, dtype=np.float64), float(tol)) for r in rings]
            rs = [r for r in rs if len(r) >= 4]
            if rs:
                polys.append(rs)
        out.append(geom.wkb_multipolygon(polys) if polys else None)
    return pd.Series(out)


@F.pandas_udf(BinaryType())
def _st_makevalid(wkbs: pd.Series) -> pd.Series:
    from .booleans import boolean_full

    out = []
    for b in wkbs:
        g = geom.parse_wkb(bytes(b))
        polys, area = boolean_full(g.polygons(), [], "or")
        out.append(geom.wkb_multipolygon(polys) if polys and area > 0 else None)
    return pd.Series(out)


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


def execute_sql(
    spark: SparkSession, sql: str, layers: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Run an SQL statement over named layers (ExecuteSQL semantics:
    layers become tables; st_* functions are available)."""
    register_functions(spark)
    for name, df in (layers or {}).items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)
