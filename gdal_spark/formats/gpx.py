"""GPX driver: waypoints and tracks (Topografix GPX 1.0/1.1).

Reference driver: ogr/ogrsf_frmts/gpx/. Implemented from the public GPX
schema with the stdlib XML parser — the layers the reference exposes:

- ``waypoints``: one point per ``<wpt lat lon>``, with ``name``,
  ``ele`` (elevation, double) and ``time`` (string) attributes;
- ``tracks``: one MULTILINESTRING per ``<trk>`` (one linestring per
  ``<trkseg>``), with ``name`` and point count;
- ``routes``: one LINESTRING per ``<rte>`` (``<rtept>`` members).

GPX stores latitude/longitude as ATTRIBUTES (not coordinate text) and is
always WGS84 per spec; geometries come back as (lon, lat) WKB like every
other driver here.

Spark shape: same as KML/AAIGrid — one XML document per file, so a glob
fans out one task per file via binaryFile; the sink streams one document
with O(batch) driver memory.
"""

from __future__ import annotations

import struct as _struct
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pandas as pd

from ._util import local_path as _local
from .. import geom

LAYERS = ("waypoints", "tracks", "routes")


def _ns_of(root) -> str:
    return root.tag.split("}", 1)[0] + "}" if root.tag.startswith("{") else ""


def _pt(el) -> tuple[float, float]:
    return float(el.get("lon")), float(el.get("lat"))


def parse_gpx(doc: bytes, layer: str) -> list[dict]:
    root = ET.fromstring(doc)
    ns = _ns_of(root)
    out = []
    if layer == "waypoints":
        for w in root.findall(f"{ns}wpt"):
            x, y = _pt(w)
            ele = w.findtext(f"{ns}ele")
            out.append({
                "geometry": geom.wkb_point(x, y),
                "name": w.findtext(f"{ns}name"),
                "ele": float(ele) if ele is not None else None,
                "time": w.findtext(f"{ns}time"),
            })
    elif layer == "tracks":
        for trk in root.findall(f"{ns}trk"):
            segs = []
            n_pts = 0
            for seg in trk.findall(f"{ns}trkseg"):
                pts = [_pt(p) for p in seg.findall(f"{ns}trkpt")]
                if pts:
                    segs.append(np.asarray(pts, dtype=np.float64))
                    n_pts += len(pts)
            if not segs:
                continue
            wkb = _struct.pack(
                "<BII", 1, geom.WKB_MULTILINESTRING, len(segs)
            ) + b"".join(geom.wkb_linestring(s) for s in segs)
            out.append({
                "geometry": wkb,
                "name": trk.findtext(f"{ns}name"),
                "n_points": n_pts,
            })
    elif layer == "routes":
        for rte in root.findall(f"{ns}rte"):
            pts = [_pt(p) for p in rte.findall(f"{ns}rtept")]
            if not pts:
                continue
            out.append({
                "geometry": geom.wkb_linestring(
                    np.asarray(pts, dtype=np.float64)
                ),
                "name": rte.findtext(f"{ns}name"),
                "n_points": len(pts),
            })
    else:
        raise ValueError(f"gpx layer {layer!r} not in {LAYERS}")
    return out


_SCHEMAS = {
    "waypoints": "geometry binary, name string, ele double, time string",
    "tracks": "geometry binary, name string, n_points int",
    "routes": "geometry binary, name string, n_points int",
}


def scan_gpx(spark, path_glob: str, layer: str = "waypoints"):
    """Glob of .gpx files -> one of the reference driver's layers (one
    task per file)."""
    if layer not in LAYERS:
        raise ValueError(f"gpx layer {layer!r} not in {LAYERS}")
    cols = [f.split()[0] for f in _SCHEMAS[layer].split(", ")]

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_gpx(bytes(content), layer):
                    rows.append([rec.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile").load(_local(path_glob))
        .select("content")
        .mapInPandas(parse, schema=_SCHEMAS[layer])
    )


def write_gpx(df, path: str, layer: str = "waypoints",
              geometry: str = "geometry"):
    """Single-document sink (wpt or trk elements per row; tracks expect
    MULTILINESTRING/LINESTRING WKB). Streams toLocalIterator."""
    if layer not in ("waypoints", "tracks"):
        raise ValueError("write_gpx writes 'waypoints' or 'tracks'")
    cols = set(df.columns)
    count = 0
    with open(_local(path), "w", encoding="utf-8") as f:
        f.write(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<gpx version="1.1" creator="gdal_spark" '
            'xmlns="http://www.topografix.com/GPX/1/1">'
        )
        for row in df.toLocalIterator():
            d = row.asDict()
            g = geom.parse_wkb(bytes(d[geometry]))
            name = d.get("name") if "name" in cols else None
            nm = f"<name>{escape(str(name))}</name>" if name is not None else ""
            if layer == "waypoints":
                x, y = g.parts[0]
                ele = d.get("ele") if "ele" in cols else None
                tm = d.get("time") if "time" in cols else None
                f.write(f'<wpt lat={quoteattr(repr(float(y)))} '
                        f'lon={quoteattr(repr(float(x)))}>')
                f.write(nm)
                if ele is not None:
                    f.write(f"<ele>{float(ele)!r}</ele>")
                if tm is not None:
                    f.write(f"<time>{escape(str(tm))}</time>")
                f.write("</wpt>")
            else:
                if g.kind == geom.WKB_LINESTRING:
                    segs = [g.parts[0] if isinstance(g.parts, list) else g.parts]
                elif g.kind == geom.WKB_MULTILINESTRING:
                    segs = list(g.parts)
                else:
                    raise ValueError(
                        f"gpx tracks need (multi)linestring, got kind {g.kind}"
                    )
                f.write(f"<trk>{nm}")
                for s in segs:
                    f.write("<trkseg>")
                    for x, y in np.asarray(s, dtype=np.float64):
                        f.write(f'<trkpt lat={quoteattr(repr(float(y)))} '
                                f'lon={quoteattr(repr(float(x)))}/>')
                    f.write("</trkseg>")
                f.write("</trk>")
            count += 1
        f.write("</gpx>\n")
    return count
