"""GML driver: Simple-Features-profile read and OGR-style write.

Reference driver: ogr/ogrsf_frmts/gml/. Implemented from the public GML
3.2 Simple Features profile (and the GML2 legacy forms GDAL still
reads) with the stdlib XML parser:

- **Read** (:func:`scan_gml`): any FeatureCollection-shaped document —
  features found under ``featureMember`` / ``featureMembers`` /
  ``member`` wrappers regardless of namespace. Geometry properties
  recognize ``gml:Point`` / ``LineString`` / ``Polygon`` /
  ``MultiSurface|MultiPolygon`` with GML3 ``pos``/``posList``, GML2
  ``coordinates`` ("x,y x,y"), ``exterior|outerBoundaryIs`` +
  ``interior|innerBoundaryIs`` rings, and ``surfaceMember``/
  ``polygonMember`` members. Non-geometry child elements become string
  columns. Axis order follows the reference's rule: the
  ``urn:ogc:def:crs:EPSG::`` srsName form implies lat,lon order and is
  swapped to x,y; plain ``EPSG:nnnn`` srsNames are read as written.
- **Write** (:func:`write_gml`): the OGR layout ogr2ogr emits — an
  ``ogr:FeatureCollection`` of ``gml:featureMember`` elements with GML3
  ``posList`` geometry and string-serialized attributes.

Spark shape: one XML document per file — per-file fan-out via
binaryFile, single-document streaming sink, like KML/GPX.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

# XML NCName (ASCII subset): element tags are interpolated from column
# names on write, so anything else would emit an unparseable document.
_NCNAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\-]*$")

import numpy as np
import pandas as pd

from ._util import local_path as _local
from .. import geom

_GEOM_TAGS = (
    "Point", "LineString", "Polygon", "MultiSurface", "MultiPolygon",
    "MultiPoint", "MultiLineString", "Curve", "Surface",
)


def _strip(tag: str) -> str:
    return tag.split("}", 1)[-1]


def _find_child(el, name):
    for c in el:
        if _strip(c.tag) == name:
            return c
    return None


def _iter_named(el, names):
    for c in el.iter():
        if _strip(c.tag) in names:
            yield c


# EPSG codes whose official axis order is lat,long (geographic 2D) or
# northing,easting — the only CRS the reference's GML_IsSRSLatLongOrder
# (gmlutils.cpp) inverts when named in authority-compliant urn form.
# Projected easting/northing CRS (e.g. UTM 326xx) must NOT be swapped.
_LATLONG_EPSG = frozenset({
    4326, 4269, 4267, 4258, 4283, 4171, 4619, 4275, 4301, 4312, 4313,
    4149, 4150, 4151, 4152, 4167, 4230, 4231, 4237, 4240, 4265, 4272,
    4277, 4284, 4289, 4299, 4322, 4324, 4490, 4555, 4612, 4617, 4659,
    4668, 4674, 4755, 4759, 4761, 4765, 4979,
})


def _swap_axes(el) -> bool:
    """GDAL's lat/long inversion rule (gmlutils.cpp GML_IsSRSLatLongOrder):
    only the authority-compliant ``urn:ogc:def:crs:EPSG::code`` form implies
    official axis order, and only CRS that are actually lat/long (geographic)
    get inverted — a urn-form projected CRS (easting/northing, e.g. UTM
    32632) is read as written."""
    srs = el.get("srsName") or ""
    if not srs.startswith("urn:ogc:def:crs:EPSG"):
        return False
    code = srs.rsplit(":", 1)[-1]
    try:
        return int(code) in _LATLONG_EPSG
    except ValueError:
        return False


def _coords_from(el, swap: bool) -> np.ndarray:
    """pos / posList / coordinates text under `el` -> (n, 2) array.
    Repeated <gml:pos> siblings (legal GML3 for LineString/LinearRing;
    the reference concatenates them in gml2ogrgeometry) accumulate."""
    pos_rows: list[np.ndarray] = []
    for c in el.iter():
        t = _strip(c.tag)
        if t in ("posList", "pos"):
            vals = np.asarray((c.text or "").split(), dtype=np.float64)
            dim = int(c.get("srsDimension") or 2)
            pts = vals.reshape(-1, dim)[:, :2]
            if t == "pos":
                pos_rows.append(pts)
                continue
            if pos_rows:
                pts = np.vstack(pos_rows + [pts])
            return pts[:, ::-1] if swap else pts
        if t == "coordinates":
            # GML2: "x,y x,y" with optional cs/ts overrides
            cs = c.get("cs", ",")
            ts = c.get("ts", " ")
            pts = [
                tuple(float(v) for v in tok.split(cs)[:2])
                for tok in (c.text or "").replace("\n", ts).split(ts)
                if tok.strip()
            ]
            a = np.asarray(pts, dtype=np.float64)
            return a[:, ::-1] if swap else a
    if pos_rows:
        pts = np.vstack(pos_rows)
        return pts[:, ::-1] if swap else pts
    return np.zeros((0, 2), dtype=np.float64)


def _rings_of_polygon(poly, swap) -> list[np.ndarray]:
    rings = []
    for c in poly:
        t = _strip(c.tag)
        if t in ("exterior", "outerBoundaryIs"):
            rings.insert(0, _coords_from(c, swap))
        elif t in ("interior", "innerBoundaryIs"):
            rings.append(_coords_from(c, swap))
    return [r for r in rings if len(r)]


def _parse_gml_geometry(el, swap=None) -> bytes | None:
    tag = _strip(el.tag)
    if swap is None:
        swap = _swap_axes(el)
    if tag == "Point":
        c = _coords_from(el, swap)
        if len(c) == 0:
            return None
        return geom.wkb_point(float(c[0, 0]), float(c[0, 1]))
    if tag in ("LineString", "Curve"):
        c = _coords_from(el, swap)
        return geom.wkb_linestring(c) if len(c) else None
    if tag in ("Polygon", "Surface"):
        rings = _rings_of_polygon(el, swap)
        return geom.wkb_polygon(rings) if rings else None
    if tag in ("MultiSurface", "MultiPolygon"):
        polys = []
        for m in _iter_named(el, ("Polygon", "Surface")):
            rings = _rings_of_polygon(m, swap)
            if rings:
                polys.append(rings)
        return geom.wkb_multipolygon(polys) if polys else None
    return None


def parse_gml(doc: bytes) -> list[dict]:
    """One dict per feature: geometry WKB + child-element text values."""
    root = ET.fromstring(doc)
    out = []
    members = list(_iter_named(root, ("featureMember", "member")))
    feats = [f for m in members for f in m]
    for fm in _iter_named(root, ("featureMembers",)):
        feats.extend(list(fm))
    for feat in feats:
        rec: dict = {"geometry": None}
        for prop in feat:
            gml_child = None
            for c in prop:
                if _strip(c.tag) in _GEOM_TAGS:
                    gml_child = c
                    break
            if _strip(prop.tag) in _GEOM_TAGS:
                rec["geometry"] = _parse_gml_geometry(prop)
            elif gml_child is not None:
                rec["geometry"] = _parse_gml_geometry(gml_child)
            else:
                name = _strip(prop.tag)
                if name != "geometry":
                    rec[name] = prop.text
        out.append(rec)
    return out


def scan_gml(spark, path_glob: str, sample: int = 100):
    """Glob of .gml files -> (geometry binary<WKB>, <props as string...>);
    one task per file, schema from a bounded scan of the first file."""
    import glob as _glob

    first = sorted(_glob.glob(_local(path_glob))) or [_local(path_glob)]
    with open(first[0], "rb") as fh:
        probe = parse_gml(fh.read())[:sample]
    extras: list[str] = []
    for rec in probe:
        for k in rec:
            if k != "geometry" and k not in extras:
                extras.append(k)
    cols = ["geometry"] + extras
    schema = "geometry binary" + "".join(f", `{c}` string" for c in extras)

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_gml(bytes(content)):
                    rows.append([rec.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile").load(_local(path_glob))
        .select("content")
        .mapInPandas(parse, schema=schema)
    )


def _pos_list(arr) -> str:
    # float() unwrap: repr(np.float64(v)) is 'np.float64(v)' under numpy>=2
    return " ".join(
        f"{float(x)!r} {float(y)!r}" for x, y in np.asarray(arr, float)
    )


def _gml_geometry(wkb: bytes) -> str:
    g = geom.parse_wkb(bytes(wkb))
    if g.kind == geom.WKB_POINT:
        x, y = (float(v) for v in g.parts[0])
        return f"<gml:Point><gml:pos>{x!r} {y!r}</gml:pos></gml:Point>"
    if g.kind == geom.WKB_LINESTRING:
        coords = g.parts[0] if isinstance(g.parts, list) else g.parts
        return (
            f"<gml:LineString><gml:posList>{_pos_list(coords)}"
            "</gml:posList></gml:LineString>"
        )
    if g.kind == geom.WKB_POLYGON:
        parts = ["<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>",
                 _pos_list(g.parts[0]),
                 "</gml:posList></gml:LinearRing></gml:exterior>"]
        for hole in g.parts[1:]:
            parts += ["<gml:interior><gml:LinearRing><gml:posList>",
                      _pos_list(hole),
                      "</gml:posList></gml:LinearRing></gml:interior>"]
        parts.append("</gml:Polygon>")
        return "".join(parts)
    if g.kind == geom.WKB_MULTIPOLYGON:
        inner = "".join(
            "<gml:surfaceMember>"
            + _gml_geometry(geom.wkb_polygon(rings))
            + "</gml:surfaceMember>"
            for rings in g.parts
        )
        return f"<gml:MultiSurface>{inner}</gml:MultiSurface>"
    raise ValueError(f"gml write: unsupported WKB kind {g.kind}")


def write_gml(df, path: str, layer: str = "layer",
              geometry: str = "geometry"):
    """OGR-layout single-document sink; attributes serialize as element
    text (the OGR string representation). Streams toLocalIterator."""
    attrs = [c for c in df.columns if c != geometry]
    for name in [layer] + attrs:
        if not _NCNAME_RE.match(name):
            raise ValueError(
                f"gml write: {name!r} is not a valid XML NCName; rename the "
                "column/layer before writing (spaces, colons and XML-special "
                "characters would produce an unparseable document)"
            )
    count = 0
    with open(_local(path), "w", encoding="utf-8") as f:
        f.write(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/" '
            'xmlns:gml="http://www.opengis.net/gml">'
        )
        for row in df.toLocalIterator():
            d = row.asDict()
            f.write(f"<gml:featureMember><ogr:{layer}>")
            wkb = d.get(geometry)
            if wkb is not None:
                f.write(
                    "<ogr:geometryProperty>"
                    + _gml_geometry(bytes(wkb))
                    + "</ogr:geometryProperty>"
                )
            for a in attrs:
                v = d.get(a)
                if v is not None:
                    f.write(f"<ogr:{a}>{escape(str(v))}</ogr:{a}>")
            f.write(f"</ogr:{layer}></gml:featureMember>")
            count += 1
        f.write("</ogr:FeatureCollection>\n")
    return count
