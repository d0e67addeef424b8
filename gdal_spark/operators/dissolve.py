"""Dissolve: union every geometry sharing an attribute key — the OGR
SQL ``ST_Union`` aggregate / ``ogr2ogr -dialect sqlite -sql "SELECT k,
ST_Union(geometry) ... GROUP BY k"`` workflow.

Reference: OGRGeometry::UnaryUnion (ogr/ogrgeometry.cpp:5235; the
deprecated UnionCascaded at :5137) — GDAL collects the features into one
GeometryCollection and hands it to GEOS. At 10^12 rows nothing can be
collected into one geometry object; here the union distributes:

1. Keys with <= ``chunk_size`` features take the direct path: one
   collect_list + ONE slab-kernel call (after orientation normalization
   the combined ring set classifies as the union of its features under
   the nonzero winding rule — gdal_spark.booleans module docstring).
2. Heavier keys tree-reduce: features hash into ~``chunk_size``-feature
   chunks, each chunk unions independently behind one (key, chunk)
   shuffle, then a per-key merge unions the chunk RESULTS. Union of
   unions equals the union, so both paths are exact. The merge task
   holds dissolved partials — bounded by the dissolved boundary
   complexity of the key, not by its feature count (the same documented
   bound as polygonize's per-region assembly; a key whose DISSOLVED
   perimeter itself exceeds task memory would need the polygonize-style
   fragment/wall-cancellation pass, which no OGR workload we model
   reaches because UnaryUnion callers dissolve by attribute, not by
   continent-sized label).

Output: one row per key — canonical multipolygon WKB, envelope, exact
area (straight from the slab trapezoids), and ``n_parts`` = number of
disjoint polygons in the dissolved result (holes do not count as
parts).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .. import geom
from ..booleans import boolean_full
from .layer_algebra import _polys_envelope

_OUT_COLS = ["k", "wkb", "minx", "miny", "maxx", "maxy", "area", "n_parts"]


def _union_full_rows(batches):
    """(k, wkbs) rows -> dissolved multipolygon + envelope/area/parts."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            polys_in = []
            for w in r.wkbs:
                if w is not None:
                    polys_in.extend(geom.parse_wkb(bytes(w)).polygons())
            if not polys_in:
                continue
            polys, area = boolean_full(polys_in, [], "or")
            if not polys or area <= 0:
                continue
            minx, miny, maxx, maxy = _polys_envelope(polys)
            rows.append(
                {
                    "k": r.k,
                    "wkb": geom.wkb_multipolygon(polys),
                    "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
                    "area": float(area), "n_parts": len(polys),
                }
            )
        yield pd.DataFrame(rows, columns=_OUT_COLS)


def _union_partial_rows(batches):
    """(k, chunk, wkbs) rows -> one partial-union WKB per chunk."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            polys_in = []
            for w in r.wkbs:
                if w is not None:
                    polys_in.extend(geom.parse_wkb(bytes(w)).polygons())
            if not polys_in:
                continue
            polys, _area = boolean_full(polys_in, [], "or")
            if not polys:
                continue
            rows.append({"k": r.k, "wkb": geom.wkb_multipolygon(polys)})
        yield pd.DataFrame(rows, columns=["k", "wkb"])


def dissolve(
    layer: DataFrame,
    by: str = "key",
    geom_col: str = "wkb",
    chunk_size: int = 64,
) -> DataFrame:
    """Union all geometries per distinct value of ``by``.

    Returns one row per key: ``by`` (original name and type), ``wkb``
    (canonical multipolygon), ``minx/miny/maxx/maxy``, ``area``,
    ``n_parts``. Keys whose features dissolve to zero area vanish
    (matching the engine's other layer ops, which drop empty results).
    """
    ktype = layer.schema[by].dataType.simpleString()
    full_schema = (
        f"k {ktype}, wkb binary, minx double, miny double, "
        "maxx double, maxy double, area double, n_parts int"
    )

    src = layer.select(F.col(by).alias("k"), F.col(geom_col).alias("g"))
    cnt = F.count("*").over(Window.partitionBy("k"))
    c = src.withColumn("cnt", cnt)

    # Direct path: the groupBy reuses the window's hash partitioning on k
    # (no second exchange).
    small = (
        c.where(F.col("cnt") <= chunk_size)
        .groupBy("k")
        .agg(F.collect_list("g").alias("wkbs"))
    )
    out_small = small.mapInPandas(_union_full_rows, schema=full_schema)

    # Tree path: chunk unions bound task memory for hot keys.
    large = c.where(F.col("cnt") > chunk_size)
    nchunks = F.ceil(F.col("cnt") / chunk_size)
    chunks = (
        large.withColumn(
            "chunk", F.pmod(F.xxhash64("g"), nchunks).cast("int")
        )
        .groupBy("k", "chunk")
        .agg(F.collect_list("g").alias("wkbs"))
    )
    partials = chunks.mapInPandas(
        _union_partial_rows, schema=f"k {ktype}, wkb binary"
    )
    merged = partials.groupBy("k").agg(F.collect_list("wkb").alias("wkbs"))
    out_large = merged.mapInPandas(_union_full_rows, schema=full_schema)

    return out_small.unionByName(out_large).withColumnRenamed("k", by)
