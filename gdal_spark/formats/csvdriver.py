"""CSV vector driver: geometry-aware CSV read and write.

The reference's OGR CSV driver (ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp)
recognises geometry inside plain CSV three ways — a WKT column
(GEOM_POSSIBLE_NAMES; default header names like ``WKT``/``geometry``),
X/Y coordinate field pairs (X_POSSIBLE_NAMES / Y_POSSIBLE_NAMES, with
``lon``/``lat`` style aliases), or no geometry at all (attribute-only
layer). This module re-creates that contract Spark-first:

- **Read** (:func:`scan_csv_vector`): the file scan is Spark's native JVM
  CSV source — line-splittable, so one huge CSV fans out across the
  cluster in byte-range splits with zero Python in the scan, and schema
  inference / header handling is Catalyst's. Geometry materialises from
  the detected columns in ONE Arrow-batched pass (WKT -> WKB through the
  engine's own codec, or X/Y -> point WKB); attribute-only files skip
  Python entirely.
- **Write** (:func:`write_csv_vector`): geometry serialises to a WKT (or
  lon/lat) column in one Arrow pass and Spark's distributed CSV sink
  emits one part file per partition — no driver funnel, same scale story
  as the GeoJSONSeq sink.

Column detection mirrors the reference's precedence: an explicit
``wkt=``/``x=``/``y=`` argument wins; otherwise headers are matched
case-insensitively against the same default name sets the CSV driver
ships (WKT/geometry for text geometry; x/y, lon/lat, longitude/latitude
pairs for points).
"""

from __future__ import annotations

from struct import error as struct_error

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

_WKT_NAMES = ("wkt", "geometry", "geom", "the_geom")
_XY_PAIRS = (
    ("x", "y"),
    ("lon", "lat"),
    ("lng", "lat"),
    ("longitude", "latitude"),
    ("easting", "northing"),
)


def _detect(columns: list[str], wkt, x, y):
    """Return ('wkt', col) | ('xy', xcol, ycol) | ('none',) using the
    reference driver's precedence: explicit args, then WKT names, then
    coordinate pairs."""
    low = {c.lower(): c for c in columns}
    if wkt is not None:
        if wkt not in columns:
            raise ValueError(f"wkt column {wkt!r} not in header {columns}")
        return ("wkt", wkt)
    if x is not None or y is not None:
        if x not in columns or y not in columns:
            raise ValueError(f"x/y columns {x!r}/{y!r} not in header {columns}")
        return ("xy", x, y)
    for n in _WKT_NAMES:
        if n in low:
            return ("wkt", low[n])
    for xn, yn in _XY_PAIRS:
        if xn in low and yn in low:
            return ("xy", low[xn], low[yn])
    return ("none",)


@F.pandas_udf(BinaryType())
def _wkt_to_wkb(wkts: pd.Series) -> pd.Series:
    from .. import geom

    # unparseable cells degrade to NULL geometry (the OGR CSV driver's
    # behavior — it warns and emits null mid-file rather than aborting;
    # also protects the auto-detection path when a column merely NAMED
    # "geometry" holds free text)
    def conv(s):
        if s is None:
            return None
        try:
            return geom.geometry_to_wkb(geom.parse_wkt(str(s)))
        except (ValueError, IndexError, struct_error):
            return None

    return pd.Series([conv(s) for s in wkts])


@F.pandas_udf(BinaryType())
def _xy_to_wkb(xs: pd.Series, ys: pd.Series) -> pd.Series:
    from .. import geom

    return pd.Series(
        [
            None if (x is None or y is None or pd.isna(x) or pd.isna(y))
            else geom.wkb_point(float(x), float(y))
            for x, y in zip(xs, ys)
        ]
    )


def scan_csv_vector(
    spark,
    path: str,
    wkt: str | None = None,
    x: str | None = None,
    y: str | None = None,
    keep_geometry_fields: bool = False,
    schema: str | None = None,
    **csv_options,
):
    """Read CSV into (geometry binary<WKB>, <attrs...>).

    The scan itself is ``spark.read.csv`` (header on, schema inferred
    unless ``schema`` is given) — JVM-side and byte-range-splittable.
    Geometry detection follows the OGR CSV driver contract (explicit
    ``wkt``/``x``+``y`` arguments, else default header names); detected
    source columns drop from the output like OGR consumes them, unless
    ``keep_geometry_fields``. Files with no geometry come back as plain
    attribute layers (no Python stage at all).
    """
    opts = {"header": "true"}
    if schema is None:
        opts["inferSchema"] = "true"
    opts.update({k: str(v) for k, v in csv_options.items()})
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    det = _detect(df.columns, wkt, x, y)
    if det[0] == "none":
        return df
    if det[0] == "wkt":
        src = [det[1]]
        g = _wkt_to_wkb(F.col(det[1]))
    else:
        src = [det[1], det[2]]
        g = _xy_to_wkb(
            F.col(det[1]).cast("double"), F.col(det[2]).cast("double")
        )
    keep = [c for c in df.columns if keep_geometry_fields or c not in src]
    return df.select(g.alias("geometry"), *[F.col(c) for c in keep])


def write_csv_vector(
    df,
    path: str,
    geometry: str = "geometry",
    geometry_format: str = "wkt",
    mode: str = "error",
    **csv_options,
):
    """DISTRIBUTED sink: the geometry column serialises in one Arrow pass
    (``wkt`` -> a ``WKT`` text column, the -lco GEOMETRY=AS_WKT analog;
    ``xy`` -> point ``x``/``y`` columns, AS_XY) and Spark's CSV writer
    emits one part per partition. Attribute layers (no geometry column)
    write as-is."""
    from ..sql import _st_astext, _st_centroid_x, _st_centroid_y

    attrs = [c for c in df.columns if c != geometry]
    if geometry not in df.columns:
        out = df
    elif geometry_format == "wkt":
        out = df.select(
            _st_astext(F.col(geometry)).alias("WKT"),
            *[F.col(c) for c in attrs],
        )
    elif geometry_format == "xy":
        out = df.select(
            _st_centroid_x(F.col(geometry)).alias("x"),
            _st_centroid_y(F.col(geometry)).alias("y"),
            *[F.col(c) for c in attrs],
        )
    else:
        raise ValueError(f"geometry_format {geometry_format!r} not in (wkt, xy)")
    out.write.mode(mode).option("header", "true").csv(path)
