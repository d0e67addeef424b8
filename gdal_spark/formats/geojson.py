"""GeoJSON / GeoJSONSeq driver: distributed read AND distributed write.

Formats per RFC 7946 (GeoJSON) and RFC 8142 / newline-delimited GeoJSON
(the reference's GeoJSONSeq driver, ogr/ogrsf_frmts/geojson/) — implemented
on the engine's own geometry codec (geom.parse_geojson / geometry_to_
geojson), no reference code.

Spark-first split story — the reason BOTH layouts exist here:

- **GeoJSONSeq** (one feature per line, optional RFC 8142 RS prefix) is
  line-splittable, so ``spark.read.text`` gives free byte-range splits
  WITHIN one huge file and the parse is an Arrow-batched map — this is the
  100-TB path, and the ONLY vector format in the engine whose sink is also
  fully distributed (each task writes its own part file; no driver
  funnel, unlike the single-file .shp/.gpkg export sinks).
- **GeoJSON FeatureCollection** (one JSON document) is NOT splittable; the
  unit of parallelism is the file, exactly as in the reference — a glob of
  N files fans out N tasks via the binaryFile source.

Property schema is inferred GDAL-style by a bounded driver-side scan of
the first features (the reference's OGRGeoJSONReader feature scan), then
applied uniformly; fields seen with conflicting numeric types widen
(long -> double -> string).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ._util import local_path as _local
from .. import geom




def _clean_line(s: str) -> str:
    return s.lstrip("\x1e").strip().rstrip(",")


def _infer_props(features) -> list[tuple[str, str]]:
    """Bounded scan -> [(name, spark_type)] in first-seen order, numeric
    widening on conflict."""
    order: list[str] = []
    types: dict[str, str] = {}  # name -> type; None = only nulls seen so far
    rank = {"boolean": 0, "bigint": 1, "double": 2, "string": 3}
    for f in features:
        for k, v in (f.get("properties") or {}).items():
            if k not in types:
                order.append(k)
                types[k] = None
            if v is None:
                continue
            t = (
                "boolean"
                if isinstance(v, bool)
                else "bigint"
                if isinstance(v, int)
                else "double"
                if isinstance(v, float)
                else "string"
            )
            prev = types[k]
            types[k] = t if prev is None else max(prev, t, key=lambda x: rank[x])
    # all-null fields read back as string (GDAL's untyped-field default)
    return [(k, types[k] or "string") for k in order]


def _coerce(v, t: str):
    if v is None:
        return None
    if t == "boolean":
        return bool(v)
    if t == "bigint":
        return int(v)
    if t == "double":
        return float(v)
    return v if isinstance(v, str) else json.dumps(v)


def _feature_row(f: dict, props: list[tuple[str, str]]):
    g = f.get("geometry")
    wkb = geom.geometry_to_wkb(geom.parse_geojson(g)) if g else None
    p = f.get("properties") or {}
    return (wkb,) + tuple(_coerce(p.get(k), t) for k, t in props)


def _schema_of(props) -> str:
    return "geometry binary" + "".join(f", `{k}` {t}" for k, t in props)


def scan_geojson_seq(spark, path: str, sample: int = 1000):
    """Newline-delimited GeoJSON -> (geometry binary<WKB>, <props...>).
    ``spark.read.text`` supplies byte-range splits inside single large
    files; parsing is one Arrow pass. Schema from a driver-side scan of
    the first ``sample`` lines of ONE file (GDAL's feature-scan analog)."""
    import glob as _glob

    first = sorted(_glob.glob(_local(path))) or [_local(path)]
    feats = []
    with open(first[0], "r", encoding="utf-8") as fh:
        for line in fh:
            line = _clean_line(line)
            if line:
                feats.append(json.loads(line))
            if len(feats) >= sample:
                break
    props = _infer_props(feats)
    cols = ["geometry"] + [k for k, _t in props]

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for s in pdf["value"]:
                s = _clean_line(s)
                if not s:
                    continue
                rows.append(_feature_row(json.loads(s), props))
            yield pd.DataFrame(rows, columns=cols)

    return spark.read.text(_local(path)).mapInPandas(parse, schema=_schema_of(props))


def stream_geojson_seq(spark, directory: str, schema_from: str,
                       sample: int = 1000):
    """STREAMING variant: GeoJSONSeq is line-delimited, so Spark's file
    text stream ingests arriving feature files incrementally — the
    engine's vector formats plug straight into Structured Streaming
    (watermarks, availableNow incremental runs, snapshot sinks all
    compose downstream). Schema comes from ``schema_from`` (an existing
    sample file — a stream cannot be probed before it exists); the parse
    is the identical Arrow pass the batch scan uses."""
    feats = []
    with open(_local(schema_from), "r", encoding="utf-8") as fh:
        for line in fh:
            line = _clean_line(line)
            if line:
                feats.append(json.loads(line))
            if len(feats) >= sample:
                break
    props = _infer_props(feats)
    cols = ["geometry"] + [k for k, _t in props]

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for s in pdf["value"]:
                s = _clean_line(s)
                if not s:
                    continue
                rows.append(_feature_row(json.loads(s), props))
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.readStream.format("text")
        .load(_local(directory))
        .mapInPandas(parse, schema=_schema_of(props))
    )


def scan_geojson(spark, path: str, sample: int = 1000):
    """Whole-document FeatureCollection files (non-splittable by design):
    one file = one task via the binaryFile source; a glob of N files fans
    out N tasks. Schema from the first file's first ``sample`` features."""
    import glob as _glob

    first = sorted(_glob.glob(_local(path))) or [_local(path)]
    with open(first[0], "r", encoding="utf-8") as fh:
        doc = json.load(fh)
    props = _infer_props(doc.get("features", [])[:sample])
    cols = ["geometry"] + [k for k, _t in props]

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                d = json.loads(bytes(content).decode("utf-8"))
                feats = d["features"] if d.get("type") == "FeatureCollection" else [d]
                rows.extend(_feature_row(f, props) for f in feats)
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .load(_local(path))
        .select("content")
        .mapInPandas(parse, schema=_schema_of(props))
    )


def write_geojson_seq(df, path: str, geometry: str = "geometry", mode: str = "error"):
    """DISTRIBUTED sink: every task serializes its partition to feature
    lines and Spark's text writer emits one part file per partition — no
    driver funnel. Output is valid ndjson/GeoJSONSeq (no RS markers),
    readable back by ``scan_geojson_seq`` and by the reference driver."""
    attr = [f.name for f in df.schema.fields if f.name != geometry]

    def to_line(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                wkb = getattr(r, geometry)
                gj = (
                    geom.geometry_to_geojson(geom.parse_wkb(bytes(wkb)))
                    if wkb is not None
                    else None
                )
                p = {}
                for a in attr:
                    v = getattr(r, a)
                    if v is not None and hasattr(v, "item"):
                        v = v.item()  # numpy scalar -> python
                    p[a] = v
                out.append(
                    json.dumps(
                        {"type": "Feature", "geometry": gj, "properties": p},
                        separators=(",", ":"),
                        allow_nan=False,
                    )
                )
            yield pd.DataFrame({"value": out})

    df.mapInPandas(to_line, schema="value string").write.mode(mode).text(_local(path))
