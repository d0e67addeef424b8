"""WKB geometry: parse/build + vectorized predicates, pure numpy.

- WKB byte layout follows ogr/ogr_wkb.cpp / ogr/ogr_core.h:409-520
  (wkbPoint=1, wkbLineString=2, wkbPolygon=3, wkbMultiPoint=4,
  wkbMultiLineString=5, wkbMultiPolygon=6, wkbGeometryCollection=7).
- Ray-casting point-in-ring re-derives ogr/ogrlinearring.cpp:453-531:
  crossing-count parity on the +x ray, rejecting rings with < 4 points,
  optional inclusive envelope pretest.
- Polygon-with-holes containment re-derives ogr/ogrpolygon.cpp:780-812
  (IsPointOnSurface): inside the exterior ring AND in no interior ring.

The predicate functions are vectorized over *points* (the hot dimension in
a spatial join: millions of image centroids against a broadcast vector
layer of few thousand polygons).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

_LE = 1


# ---------------------------------------------------------------------------
# builders (always little-endian, 2-D)
# ---------------------------------------------------------------------------


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", _LE, WKB_POINT, x, y)


def _ring_bytes(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype="<f8")
    return struct.pack("<I", len(ring)) + ring.tobytes()


def wkb_linestring(coords) -> bytes:
    return struct.pack("<BI", _LE, WKB_LINESTRING) + _ring_bytes(np.asarray(coords))


def wkb_polygon(rings) -> bytes:
    """rings: list of (n,2) arrays; ring 0 exterior, rest holes. Rings are
    closed automatically if first != last."""
    out = [struct.pack("<BI", _LE, WKB_POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if len(ring) and not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[0]])
        out.append(_ring_bytes(ring))
    return b"".join(out)


def wkb_multipolygon(polys) -> bytes:
    """polys: list of ring-lists."""
    out = [struct.pack("<BI", _LE, WKB_MULTIPOLYGON), struct.pack("<I", len(polys))]
    for rings in polys:
        out.append(wkb_polygon(rings))
    return b"".join(out)


def wkb_rect(minx, miny, maxx, maxy) -> bytes:
    return wkb_polygon(
        [np.array([[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]])]
    )


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


class Geometry:
    """Parsed WKB: kind + parts.

    - point: parts = (1,2) array
    - linestring: parts = [coords]
    - polygon: parts = [ring0, ring1, ...]
    - multipolygon: parts = [[rings of poly0], [rings of poly1], ...]
    """

    __slots__ = ("kind", "parts")

    def __init__(self, kind: int, parts):
        self.kind = kind
        self.parts = parts

    def envelope(self):
        cs = list(_iter_coords(self))
        if not cs:
            return (np.nan, np.nan, np.nan, np.nan)
        allc = np.vstack(cs)
        return (
            float(allc[:, 0].min()),
            float(allc[:, 1].min()),
            float(allc[:, 0].max()),
            float(allc[:, 1].max()),
        )

    def polygons(self):
        """Normalize to list of ring-lists (polygons only)."""
        if self.kind == WKB_POLYGON:
            return [self.parts]
        if self.kind == WKB_MULTIPOLYGON:
            return self.parts
        return []


def _iter_coords(g: Geometry):
    if g.kind == WKB_POINT:
        yield g.parts
    elif g.kind in (WKB_LINESTRING, WKB_POLYGON, WKB_MULTIPOINT):
        for p in g.parts if isinstance(g.parts, list) else [g.parts]:
            yield p
    elif g.kind in (WKB_MULTILINESTRING,):
        for p in g.parts:
            yield p
    elif g.kind == WKB_MULTIPOLYGON:
        for rings in g.parts:
            for r in rings:
                yield r
    elif g.kind == WKB_GEOMETRYCOLLECTION:
        for sub in g.parts:
            yield from _iter_coords(sub)


def parse_wkb(buf: bytes) -> Geometry:
    g, _ = _parse_at(memoryview(buf), 0)
    return g


def _parse_at(mv, off):
    byte_order = mv[off]
    bo = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", mv, off + 1)
    has_z = bool(gtype & 0x80000000) or (1000 <= (gtype & 0xFFFF) < 2000)
    has_m = bool(gtype & 0x40000000) or (2000 <= (gtype & 0xFFFF) < 4000)
    # ISO Z/M type codes are 1001..3007 — mask 16 bits BEFORE the
    # %1000 normalization (an 8-bit mask made it a dead no-op and
    # rejected every ISO PointZ/LineStringZM etc.)
    base = (gtype & 0xFFFF) % 1000
    ndim = 2 + int(has_z) + int(has_m)
    off += 5

    def read_coords(n, off):
        arr = np.frombuffer(mv, dtype=bo + "f8", count=n * ndim, offset=off)
        off += n * ndim * 8
        return arr.reshape(n, ndim)[:, :2].astype(np.float64), off

    if base == WKB_POINT:
        coords, off = read_coords(1, off)
        return Geometry(WKB_POINT, coords), off
    if base == WKB_LINESTRING:
        (n,) = struct.unpack_from(bo + "I", mv, off)
        coords, off = read_coords(n, off + 4)
        return Geometry(WKB_LINESTRING, [coords]), off
    if base == WKB_POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(bo + "I", mv, off)
            coords, off = read_coords(n, off + 4)
            rings.append(coords)
        return Geometry(WKB_POLYGON, rings), off
    if base in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION):
        (ngeoms,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        subs = []
        for _ in range(ngeoms):
            sub, off = _parse_at(mv, off)
            subs.append(sub)
        if base == WKB_MULTIPOINT:
            pts = np.vstack([s.parts for s in subs]) if subs else np.zeros((0, 2))
            return Geometry(WKB_MULTIPOINT, pts), off
        if base == WKB_MULTILINESTRING:
            return Geometry(WKB_MULTILINESTRING, [s.parts[0] for s in subs]), off
        if base == WKB_MULTIPOLYGON:
            return Geometry(WKB_MULTIPOLYGON, [s.parts for s in subs]), off
        return Geometry(WKB_GEOMETRYCOLLECTION, subs), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


# ---------------------------------------------------------------------------
# predicates — vectorized over point arrays
# ---------------------------------------------------------------------------


def points_in_ring(px, py, ring, test_envelope: bool = True):
    """Crossing-count parity test of many points against one ring.

    Semantics of ogr/ogrlinearring.cpp:453-531: rings with < 4 points are
    never matched; envelope pretest is inclusive; a crossing counts when the
    +x ray from the point strictly intersects a segment whose endpoints
    straddle y (y1>0, y2<=0 or vice versa) at intersection x > 0.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] < 4:
        return np.zeros(px.shape, dtype=bool)

    inside_env = np.ones(px.shape, dtype=bool)
    if test_envelope:
        inside_env = (
            (px >= ring[:, 0].min())
            & (px <= ring[:, 0].max())
            & (py >= ring[:, 1].min())
            & (py <= ring[:, 1].max())
        )
        if not inside_env.any():
            return inside_env

    dx = ring[None, :, 0] - px[:, None]
    dy = ring[None, :, 1] - py[:, None]
    x1, y1 = dx[:, 1:], dy[:, 1:]
    x2, y2 = dx[:, :-1], dy[:, :-1]
    straddle = ((y1 > 0) & (y2 <= 0)) | ((y2 > 0) & (y1 <= 0))
    with np.errstate(divide="ignore", invalid="ignore"):
        intersection = (x1 * y2 - x2 * y1) / (y2 - y1)
    crossings = (straddle & (intersection > 0.0)).sum(axis=1)
    return inside_env & (crossings % 2 == 1)


def points_on_surface(px, py, rings):
    """OGRPolygon::IsPointOnSurface parity: inside exterior ring, and not
    inside any interior ring (ogr/ogrpolygon.cpp:780-812)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if not rings:
        return np.zeros(px.shape, dtype=bool)
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        if not inside.any():
            break
        inside &= ~points_in_ring(px, py, hole)
    return inside


def points_in_geometry(px, py, geom: Geometry):
    """Point-in-(multi)polygon over all constituent polygons."""
    out = np.zeros(np.asarray(px).shape, dtype=bool)
    for rings in geom.polygons():
        out |= points_on_surface(px, py, rings)
    return out


def points_to_segments_dist(px, py, ring):
    """Min distance from each point to a polyline's segments (vectorized)."""
    p = np.stack([np.asarray(px, dtype=np.float64), np.asarray(py, dtype=np.float64)], axis=-1)
    a = np.asarray(ring, dtype=np.float64)[:-1]
    b = np.asarray(ring, dtype=np.float64)[1:]
    ab = b - a
    ab2 = (ab**2).sum(axis=1)
    ab2 = np.where(ab2 == 0, 1.0, ab2)
    ap = p[:, None, :] - a[None, :, :]
    t = np.clip((ap * ab[None, :, :]).sum(axis=2) / ab2[None, :], 0.0, 1.0)
    closest = a[None, :, :] + t[:, :, None] * ab[None, :, :]
    d = np.sqrt(((p[:, None, :] - closest) ** 2).sum(axis=2))
    return d.min(axis=1)


def points_to_polygon_dist(px, py, rings):
    """0 inside; else min distance to the boundary (exterior + holes)."""
    inside = points_on_surface(px, py, rings)
    d = np.full(np.asarray(px).shape, np.inf)
    for ring in rings:
        if len(ring) >= 2:
            d = np.minimum(d, points_to_segments_dist(px, py, ring))
    return np.where(inside, 0.0, d)


# ---------------------------------------------------------------------------
# WKT / GeoJSON IO (ogr/ogrgeometryfactory.cpp createFromWkt /
# ogr/ogrgeojsonreader.cpp semantics, 2-D)
# ---------------------------------------------------------------------------


def _fmt_coord(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _wkt_ring(ring) -> str:
    r = np.asarray(ring, dtype=np.float64)
    return "(" + ", ".join(f"{_fmt_coord(x)} {_fmt_coord(y)}" for x, y in r) + ")"


def geometry_to_wkt(g: Geometry) -> str:
    """Serialize to WKT (OGRGeometry::exportToWkt analog)."""
    if g.kind == WKB_POINT:
        x, y = g.parts[0]
        return f"POINT ({_fmt_coord(x)} {_fmt_coord(y)})"
    if g.kind == WKB_LINESTRING:
        return "LINESTRING " + _wkt_ring(g.parts[0])
    if g.kind == WKB_POLYGON:
        return "POLYGON (" + ", ".join(_wkt_ring(r) for r in g.parts) + ")"
    if g.kind == WKB_MULTIPOLYGON:
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(_wkt_ring(r) for r in rings) + ")" for rings in g.parts
        ) + ")"
    if g.kind == WKB_MULTIPOINT:
        return "MULTIPOINT (" + ", ".join(
            f"({_fmt_coord(x)} {_fmt_coord(y)})" for x, y in g.parts
        ) + ")"
    if g.kind == WKB_MULTILINESTRING:
        return "MULTILINESTRING (" + ", ".join(_wkt_ring(r) for r in g.parts) + ")"
    if g.kind == WKB_GEOMETRYCOLLECTION:
        return "GEOMETRYCOLLECTION (" + ", ".join(
            geometry_to_wkt(sub) for sub in g.parts) + ")"
    raise ValueError(f"cannot serialize WKT kind {g.kind}")


def _parse_coord_list(s: str) -> np.ndarray:
    pts = []
    for tok in s.split(","):
        parts = tok.split()
        pts.append([float(parts[0]), float(parts[1])])
    return np.array(pts, dtype=np.float64)


def _split_parens(s: str):
    """Split 'a, b, c' at top-level commas where a/b/c are (...) groups."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [p.strip() for p in out]


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"malformed WKT fragment: {s[:40]!r}")
    return s[1:-1].strip()


def parse_wkt(wkt: str) -> Geometry:
    """Parse 2-D WKT (OGRGeometryFactory::createFromWkt analog)."""
    s = wkt.strip()
    up = s.upper()
    if up.startswith("POINT"):
        body = _strip_parens(s[5:])
        return Geometry(WKB_POINT, _parse_coord_list(body))
    if up.startswith("LINESTRING"):
        return Geometry(WKB_LINESTRING, [_parse_coord_list(_strip_parens(s[10:]))])
    if up.startswith("POLYGON"):
        body = _strip_parens(s[7:])
        rings = [_parse_coord_list(_strip_parens(p)) for p in _split_parens(body)]
        return Geometry(WKB_POLYGON, rings)
    if up.startswith("MULTIPOLYGON"):
        body = _strip_parens(s[12:])
        polys = []
        for poly in _split_parens(body):
            pb = _strip_parens(poly)
            polys.append([_parse_coord_list(_strip_parens(p)) for p in _split_parens(pb)])
        return Geometry(WKB_MULTIPOLYGON, polys)
    if up.startswith("MULTIPOINT"):
        body = _strip_parens(s[10:])
        pts = []
        for p in _split_parens(body):
            p = p.strip()
            pts.append(_parse_coord_list(_strip_parens(p) if p.startswith("(") else p)[0])
        return Geometry(WKB_MULTIPOINT, np.array(pts))
    if up.startswith("MULTILINESTRING"):
        body = _strip_parens(s[15:])
        return Geometry(
            WKB_MULTILINESTRING,
            [_parse_coord_list(_strip_parens(p)) for p in _split_parens(body)],
        )
    raise ValueError(f"unsupported WKT: {s[:40]!r}")


def geometry_to_geojson(g: Geometry) -> dict:
    """GeoJSON geometry dict (RFC 7946, 2-D)."""
    if g.kind == WKB_POINT:
        return {"type": "Point", "coordinates": [float(g.parts[0, 0]), float(g.parts[0, 1])]}
    if g.kind == WKB_LINESTRING:
        return {"type": "LineString", "coordinates": np.asarray(g.parts[0]).tolist()}
    if g.kind == WKB_POLYGON:
        return {"type": "Polygon", "coordinates": [np.asarray(r).tolist() for r in g.parts]}
    if g.kind == WKB_MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [
                [np.asarray(r).tolist() for r in rings] for rings in g.parts
            ],
        }
    if g.kind == WKB_MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": np.asarray(g.parts).tolist()}
    if g.kind == WKB_MULTILINESTRING:
        return {
            "type": "MultiLineString",
            "coordinates": [np.asarray(r).tolist() for r in g.parts],
        }
    raise ValueError(f"cannot serialize GeoJSON kind {g.kind}")


def parse_geojson(obj) -> Geometry:
    """Parse a GeoJSON geometry (dict or JSON string)."""
    import json

    if isinstance(obj, (str, bytes)):
        obj = json.loads(obj)
    t = obj["type"]
    c = obj["coordinates"]
    if t == "Point":
        return Geometry(WKB_POINT, np.array([c], dtype=np.float64))
    if t == "LineString":
        return Geometry(WKB_LINESTRING, [np.array(c, dtype=np.float64)])
    if t == "Polygon":
        return Geometry(WKB_POLYGON, [np.array(r, dtype=np.float64) for r in c])
    if t == "MultiPolygon":
        return Geometry(
            WKB_MULTIPOLYGON,
            [[np.array(r, dtype=np.float64) for r in rings] for rings in c],
        )
    if t == "MultiPoint":
        return Geometry(WKB_MULTIPOINT, np.array(c, dtype=np.float64))
    if t == "MultiLineString":
        return Geometry(
            WKB_MULTILINESTRING, [np.array(r, dtype=np.float64) for r in c]
        )
    raise ValueError(f"unsupported GeoJSON type {t!r}")


def geometry_to_wkb(g: Geometry) -> bytes:
    """Serialize any parsed Geometry back to WKB."""
    if g.kind == WKB_POINT:
        return wkb_point(float(g.parts[0, 0]), float(g.parts[0, 1]))
    if g.kind == WKB_LINESTRING:
        return wkb_linestring(g.parts[0])
    if g.kind == WKB_POLYGON:
        return wkb_polygon(g.parts)
    if g.kind == WKB_MULTIPOLYGON:
        return wkb_multipolygon(g.parts)
    if g.kind == WKB_MULTIPOINT:
        body = b"".join(wkb_point(float(x), float(y)) for x, y in g.parts)
        return struct.pack("<BII", _LE, WKB_MULTIPOINT, len(g.parts)) + body
    if g.kind == WKB_MULTILINESTRING:
        body = b"".join(wkb_linestring(r) for r in g.parts)
        return struct.pack("<BII", _LE, WKB_MULTILINESTRING, len(g.parts)) + body
    raise ValueError(f"cannot serialize WKB kind {g.kind}")


def polygon_area_centroid(polys):
    """Net area + centroid of a list of polygons (each a ring-list, ring 0
    exterior, rest holes), holes subtracted with their own first moments
    (OGRGeometry::Centroid / GEOS getCentroid semantics: interior rings
    are holes regardless of stored orientation).

    Returns (net_area, (cx, cy)); (nan, nan) centroid when net area is 0.
    """
    net, sx, sy = 0.0, 0.0, 0.0
    for rings in polys:
        if not rings:
            continue
        a0, (cx0, cy0) = ring_area_centroid(rings[0])
        a0 = abs(a0)
        net += a0
        sx += a0 * cx0
        sy += a0 * cy0
        for hole in rings[1:]:
            ha, (hx, hy) = ring_area_centroid(hole)
            ha = abs(ha)
            net -= ha
            sx -= ha * hx
            sy -= ha * hy
    if net == 0:
        return 0.0, (float("nan"), float("nan"))
    return net, (sx / net, sy / net)


def ring_area_centroid(ring):
    """Signed shoelace area and centroid of one ring."""
    r = np.asarray(ring, dtype=np.float64)
    x, y = r[:-1, 0], r[:-1, 1]
    x1, y1 = r[1:, 0], r[1:, 1]
    cross = x * y1 - x1 * y
    a = cross.sum() / 2.0
    if a == 0:
        return 0.0, (float(x.mean()), float(y.mean()))
    cx = ((x + x1) * cross).sum() / (6.0 * a)
    cy = ((y + y1) * cross).sum() / (6.0 * a)
    return float(a), (float(cx), float(cy))
