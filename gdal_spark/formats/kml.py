"""KML driver: Placemark-level read and write (OGC KML 2.2).

Reference drivers: ogr/ogrsf_frmts/kml/ (write-oriented) and libkml/.
Implemented from the OGC KML 2.2 schema with the stdlib XML parser —
the subset the reference's plain KML driver handles: Placemarks with
Point / LineString / Polygon (outer + inner boundaries) geometry,
``name`` / ``description``, and ExtendedData ``Data``/``value`` pairs
as string attributes. Coordinates are the spec's
``lon,lat[,alt]`` whitespace-separated tuples (altitude ignored, as in
the 2-D engine).

Spark shape: a KML file is one XML document (not splittable), so the
unit of parallelism is the FILE — a glob fans out one task per file via
the binaryFile source, like GeoJSON FeatureCollections and AAIGrid. The
sink streams ``toLocalIterator`` into one spec-valid document with
O(batch) driver memory (single-document format — same contract as the
.shp/.gpkg/.fgb sinks).
"""

from __future__ import annotations


import struct as _struct
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pandas as pd

from ._util import local_path as _local
from .. import geom

_NS22 = "{http://www.opengis.net/kml/2.2}"
_BASE_KEYS = ("geometry", "name", "description")


def _strip(tag: str) -> str:
    return tag.split("}", 1)[-1]


def _doc_ns(root) -> str:
    """Namespace of THIS document — KML in the wild carries 2.2, the
    earth.google.com 2.0/2.1 namespaces, or none at all (the reference
    driver accepts them all); derive it from the root tag."""
    if root.tag.startswith("{"):
        return root.tag.split("}", 1)[0] + "}"
    return ""


def _coords(text: str) -> np.ndarray:
    pts = []
    for tok in (text or "").split():
        parts = tok.split(",")
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64)


def _wkb_multi(kind: int, members: list[bytes]) -> bytes:
    return (
        _struct.pack("<BII", 1, kind, len(members)) + b"".join(members)
    )


def _parse_geometry(el, ns: str) -> bytes | None:
    tag = _strip(el.tag)
    if tag == "Point":
        c = _coords(el.findtext(f"{ns}coordinates", ""))
        if len(c) == 0:
            return None  # reference driver: skip, don't abort the file
        return geom.wkb_point(float(c[0, 0]), float(c[0, 1]))
    if tag == "LineString":
        c = _coords(el.findtext(f"{ns}coordinates", ""))
        if len(c) == 0:
            return None
        return geom.wkb_linestring(c)
    if tag == "Polygon":
        rings = []
        outer = el.find(f"{ns}outerBoundaryIs/{ns}LinearRing")
        if outer is not None:
            rings.append(_coords(outer.findtext(f"{ns}coordinates", "")))
        for inner in el.findall(f"{ns}innerBoundaryIs/{ns}LinearRing"):
            rings.append(_coords(inner.findtext(f"{ns}coordinates", "")))
        if not rings or len(rings[0]) == 0:
            return None
        return geom.wkb_polygon(rings)
    if tag == "MultiGeometry":
        by_kind: dict[str, list[bytes]] = {}
        for sub in el:
            w = _parse_geometry(sub, ns)
            if w is not None:
                by_kind.setdefault(_strip(sub.tag), []).append(w)
        if len(by_kind) != 1:
            return None  # empty or mixed-type collections unsupported
        kind, members = next(iter(by_kind.items()))
        if kind == "Polygon":
            return geom.wkb_multipolygon(
                [geom.parse_wkb(w).parts for w in members]
            )
        if kind == "Point":
            return _wkb_multi(geom.WKB_MULTIPOINT, members)
        if kind == "LineString":
            return _wkb_multi(geom.WKB_MULTILINESTRING, members)
    return None


def parse_kml(doc: bytes) -> list[dict]:
    """One dict per Placemark: geometry WKB + name/description +
    ExtendedData pairs (all strings, the KML attribute model).
    Data entries with no name or a name colliding with the base keys
    are dropped (the base record always wins)."""
    root = ET.fromstring(doc)
    ns = _doc_ns(root)
    out = []
    for pm in root.iter(f"{ns}Placemark"):
        rec: dict = {"geometry": None, "name": None, "description": None}
        for child in pm:
            tag = _strip(child.tag)
            if tag in ("Point", "LineString", "Polygon", "MultiGeometry"):
                rec["geometry"] = _parse_geometry(child, ns)
            elif tag in ("name", "description"):
                rec[tag] = child.text
            elif tag == "ExtendedData":
                for d in child.findall(f"{ns}Data"):
                    key = d.get("name")
                    if key and key not in _BASE_KEYS:
                        rec[key] = d.findtext(f"{ns}value")
        out.append(rec)
    return out


def scan_kml(spark, path_glob: str, sample: int = 100):
    """Glob of .kml files -> (geometry binary<WKB>, name, description,
    <ExtendedData attrs...>). Schema of the attribute set comes from a
    bounded driver-side scan of the first file's first ``sample``
    Placemarks (same GDAL-style feature-scan contract as the GeoJSON
    driver); every ExtendedData value is a string, per the KML model."""
    import glob as _glob

    first = sorted(_glob.glob(_local(path_glob))) or [_local(path_glob)]
    with open(first[0], "rb") as fh:
        probe = parse_kml(fh.read())[:sample]
    base = ["geometry", "name", "description"]
    extras: list[str] = []
    for rec in probe:
        for k in rec:
            if k not in base and k not in extras:
                extras.append(k)
    cols = base + extras
    schema = "geometry binary, name string, description string" + "".join(
        f", `{c}` string" for c in extras
    )

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_kml(bytes(content)):
                    rows.append([rec.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile").load(_local(path_glob))
        .select("content")
        .mapInPandas(parse, schema=schema)
    )


def _fmt_coords(arr) -> str:
    # float() unwrap: repr(np.float64(v)) is 'np.float64(v)' under numpy>=2
    return " ".join(
        f"{float(x)!r},{float(y)!r}" for x, y in np.asarray(arr, float)
    )


def _geometry_kml(wkb: bytes) -> str:
    g = geom.parse_wkb(bytes(wkb))
    if g.kind == geom.WKB_POINT:
        x, y = (float(v) for v in g.parts[0])
        return f"<Point><coordinates>{x!r},{y!r}</coordinates></Point>"
    if g.kind == geom.WKB_LINESTRING:
        coords = g.parts[0] if isinstance(g.parts, list) else g.parts
        return (
            "<LineString><coordinates>"
            + _fmt_coords(coords)
            + "</coordinates></LineString>"
        )
    if g.kind == geom.WKB_POLYGON:
        parts = ["<Polygon><outerBoundaryIs><LinearRing><coordinates>",
                 _fmt_coords(g.parts[0]),
                 "</coordinates></LinearRing></outerBoundaryIs>"]
        for hole in g.parts[1:]:
            parts += ["<innerBoundaryIs><LinearRing><coordinates>",
                      _fmt_coords(hole),
                      "</coordinates></LinearRing></innerBoundaryIs>"]
        parts.append("</Polygon>")
        return "".join(parts)
    if g.kind == geom.WKB_MULTIPOLYGON:
        inner = "".join(
            _geometry_kml(geom.wkb_polygon(rings)) for rings in g.parts
        )
        return f"<MultiGeometry>{inner}</MultiGeometry>"
    raise ValueError(f"kml write: unsupported WKB kind {g.kind}")


def write_kml(df, path: str, name: str = "layer",
              geometry: str = "geometry"):
    """Single-document sink: Placemark per row, non-core columns as
    ExtendedData strings; streams toLocalIterator (O(batch) driver
    memory)."""
    attrs = [
        c for c in df.columns
        if c not in (geometry, "name", "description")
    ]
    has_name = "name" in df.columns
    has_desc = "description" in df.columns
    count = 0
    with open(_local(path), "w", encoding="utf-8") as f:
        f.write(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<kml xmlns="http://www.opengis.net/kml/2.2">'
            f"<Document><name>{escape(name)}</name>"
        )
        for row in df.toLocalIterator():
            d = row.asDict()
            f.write("<Placemark>")
            if has_name and d.get("name") is not None:
                f.write(f"<name>{escape(str(d['name']))}</name>")
            if has_desc and d.get("description") is not None:
                f.write(
                    f"<description>{escape(str(d['description']))}"
                    "</description>"
                )
            ext = [
                (a, d.get(a)) for a in attrs if d.get(a) is not None
            ]
            if ext:
                f.write("<ExtendedData>")
                for a, v in ext:
                    # quoteattr: plain escape() leaves double quotes
                    # unescaped, which breaks the name="..." attribute
                    f.write(
                        f"<Data name={quoteattr(a)}>"
                        f"<value>{escape(str(v))}</value></Data>"
                    )
                f.write("</ExtendedData>")
            wkb = d.get(geometry)
            if wkb is not None:
                f.write(_geometry_kml(bytes(wkb)))
            f.write("</Placemark>")
            count += 1
        f.write("</Document></kml>\n")
    return count





