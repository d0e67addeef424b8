"""GeoParquet driver: the cloud-native geospatial interchange format.

Reference driver: ogr/ogrsf_frmts/parquet/ (ogrparquetwriterlayer.cpp
GetGeoMetadata builds the ``geo`` footer JSON). Implemented from the
public GeoParquet 1.1 specification: plain Parquet whose footer
key-value metadata carries ``geo`` = ``{"version": "1.1.0",
"primary_column": ..., "columns": {<name>: {"encoding": "WKB",
"geometry_types": [...], "bbox": [minx, miny, maxx, maxy],
"covering": {"bbox": {...}}}}}``, geometry as a WKB binary column.

This is the engine's most Spark-native vector format — Parquet IS
Spark's format, so BOTH directions are fully distributed with zero
custom scan code:

- **Write** (:func:`write_geoparquet`): every task writes its own part
  file through pyarrow with a per-file ``geo`` footer (per-file bbox and
  geometry_types computed from that partition's rows, exactly the
  per-file semantics the spec gives metadata), plus the optional
  GeoParquet 1.1 ``covering`` bbox struct column — which Spark's own
  parquet scan then uses for predicate pushdown / row-group pruning.
- **Read** (:func:`scan_geoparquet`): literally ``spark.read.parquet``
  — Catalyst pushdown, column pruning, splitting all come free;
  :func:`geoparquet_metadata` parses the footer driver-side for
  interop validation.

CRS handling follows the reference's default: EPSG:4326 / lon-lat is
omitted from the metadata (OGR_PARQUET_CRS_OMIT_IF_WGS84=YES behavior);
other SRIDs write a minimal PROJJSON-shaped object carrying the EPSG id
(full PROJJSON axis/datum detail is out of scope and documented so).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ._util import local_path as _local
from .. import geom

# Common geographic (lat/long) EPSG codes, for labeling the PROJJSON
# "type" field honestly (ADVICE r4: 4269/NAD83 etc. must not be called
# ProjectedCRS). Same family list the GML axis-order rule uses.
_GEOGRAPHIC_EPSG = frozenset({
    4326, 4269, 4267, 4258, 4283, 4171, 4619, 4275, 4301, 4312, 4313,
    4149, 4150, 4151, 4152, 4167, 4230, 4231, 4237, 4240, 4265, 4272,
    4277, 4284, 4289, 4299, 4322, 4324, 4490, 4555, 4612, 4617, 4659,
    4668, 4674, 4755, 4759, 4761, 4765, 4979,
})

_KIND_NAMES = {
    geom.WKB_POINT: "Point",
    geom.WKB_LINESTRING: "LineString",
    geom.WKB_POLYGON: "Polygon",
    geom.WKB_MULTIPOINT: "MultiPoint",
    geom.WKB_MULTILINESTRING: "MultiLineString",
    geom.WKB_MULTIPOLYGON: "MultiPolygon",
    geom.WKB_GEOMETRYCOLLECTION: "GeometryCollection",
}


def _geo_meta(primary: str, types: list[str], bbox, srid: int | None,
              covering: bool) -> str:
    col: dict = {
        "encoding": "WKB",
        "geometry_types": sorted(types),
    }
    if bbox is not None:
        col["bbox"] = [float(v) for v in bbox]
    if covering:
        # only advertised when the bbox struct column actually exists
        col["covering"] = {
            "bbox": {
                "xmin": ["bbox", "xmin"],
                "ymin": ["bbox", "ymin"],
                "xmax": ["bbox", "xmax"],
                "ymax": ["bbox", "ymax"],
            }
        }
    if srid and srid != 4326:
        # minimal PROJJSON-shaped CRS (EPSG id only; see module docstring).
        # "type" is only emitted when the family is actually known: the
        # engine's projection registry identifies projected CRS, a small
        # allowlist identifies common geographic CRS (e.g. 4269 NAD83),
        # and anything else carries just the authority/code id so a strict
        # reader is never fed a mislabeled CRS object.
        from .. import proj as _proj

        col["crs"] = {
            "name": f"EPSG:{srid}",
            "id": {"authority": "EPSG", "code": int(srid)},
        }
        if int(srid) in _GEOGRAPHIC_EPSG:
            col["crs"]["type"] = "GeographicCRS"
        elif _proj.get_transformer(int(srid)) is not None:
            col["crs"]["type"] = "ProjectedCRS"
    return json.dumps(
        {
            "version": "1.1.0",
            "primary_column": primary,
            "columns": {primary: col},
        }
    )


def write_geoparquet(df, path: str, geometry: str = "geometry",
                     srid: int | None = None, covering: bool = True,
                     mode: str = "error"):
    """DISTRIBUTED sink: one GeoParquet part file per partition, written
    by the task that holds the partition (deterministic part-<id> names
    from the task's partition id). Each file's ``geo`` footer carries its
    OWN bbox/geometry_types; ``covering=True`` additionally materializes
    the spec's bbox struct column, which Spark's reader prunes on.

    ``mode`` follows Spark writer semantics for pre-existing part files:
    ``error`` (default) refuses, ``overwrite`` clears them first — a
    smaller later write must never leave stale parts behind to be read
    back alongside the new ones."""
    import glob as _glob

    out_dir = _local(path)
    os.makedirs(out_dir, exist_ok=True)
    stale = _glob.glob(os.path.join(out_dir, "*.parquet"))
    if stale:
        if mode == "overwrite":
            for f_ in stale:
                os.unlink(f_)
        elif mode == "error":
            raise ValueError(
                f"{path} already contains {len(stale)} parquet part files "
                "(use mode='overwrite')"
            )
        else:
            raise ValueError(f"unknown mode {mode!r}")
    attr = [f.name for f in df.schema.fields if f.name != geometry]

    def dump(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            yield pd.DataFrame({"path": [], "rows": []})
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        types: set[str] = set()
        env = [np.inf, np.inf, -np.inf, -np.inf]
        boxes = {"xmin": [], "ymin": [], "xmax": [], "ymax": []}
        for wkb in pdf[geometry]:
            if wkb is None:
                for k in boxes:
                    boxes[k].append(None)
                continue
            g = geom.parse_wkb(bytes(wkb))
            types.add(_KIND_NAMES.get(g.kind, f"Unknown{g.kind}"))
            e = g.envelope()
            boxes["xmin"].append(e[0])
            boxes["ymin"].append(e[1])
            boxes["xmax"].append(e[2])
            boxes["ymax"].append(e[3])
            env = [min(env[0], e[0]), min(env[1], e[1]),
                   max(env[2], e[2]), max(env[3], e[3])]
        cols = {geometry: pdf[geometry]}
        for a in attr:
            cols[a] = pdf[a]
        table = pa.table(cols)
        if covering:
            bbox = pa.StructArray.from_arrays(
                [pa.array(boxes[k], type=pa.float64())
                 for k in ("xmin", "ymin", "xmax", "ymax")],
                names=["xmin", "ymin", "xmax", "ymax"],
            )
            table = table.append_column("bbox", bbox)
        meta = _geo_meta(
            geometry, list(types),
            env if np.isfinite(env[0]) else None, srid, covering,
        )
        existing = table.schema.metadata or {}
        table = table.replace_schema_metadata(
            {**existing, b"geo": meta.encode()}
        )
        fpath = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        pq.write_table(table, fpath, compression="zstd")
        yield pd.DataFrame({"path": [fpath], "rows": [len(pdf)]})

    res = df.mapInPandas(dump, schema="path string, rows long").collect()
    return int(sum(r.rows for r in res))


def geoparquet_metadata(path: str) -> dict:
    """Driver-side footer parse of one part file (interop validation)."""
    import glob as _glob

    import pyarrow.parquet as pq

    target = _local(path)
    if os.path.isdir(target):
        files = sorted(_glob.glob(os.path.join(target, "*.parquet")))
        if not files:
            raise ValueError(f"no parquet files under {path}")
        target = files[0]
    md = pq.ParquetFile(target).schema_arrow.metadata or {}
    if b"geo" not in md:
        raise ValueError(f"{target} carries no GeoParquet 'geo' metadata")
    return json.loads(md[b"geo"].decode())


def scan_geoparquet(spark, path: str, validate: bool = True):
    """Read = Spark's native parquet scan (pushdown/pruning/splitting all
    built in); ``validate`` asserts the ``geo`` footer names a WKB
    primary column that exists in the schema."""
    df = spark.read.parquet(_local(path))
    if validate:
        meta = geoparquet_metadata(path)
        primary = meta["primary_column"]
        enc = meta["columns"][primary]["encoding"]
        if enc != "WKB":
            raise ValueError(f"unsupported GeoParquet encoding {enc!r}")
        if primary not in df.columns:
            raise ValueError(f"primary_column {primary!r} not in schema")
    return df


