"""ESRI Shapefile driver: distributed read + export write.

Implemented from the public format specification ("ESRI Shapefile
Technical Description", ESRI White Paper, July 1998) — the same spec the
reference's shapelib-based driver implements (ogr/ogrsf_frmts/shape/
shape2ogr.cpp, ogrshapelayer.cpp, shapefil.h) — with OGR's field-type and
ring-assignment conventions replayed where the spec is silent:

- OFTInteger64 -> DBF 'N' width 18 decimals 0; OFTReal -> 'N' 24.15;
  OFTString -> 'C' (ogr/ogrsf_frmts/shape/ogrshapelayer.cpp CreateField
  defaults).
- Polygon ring role comes from winding (outer = clockwise, holes =
  counter-clockwise, per the spec); holes attach to the smallest
  containing outer ring, and files with no CW ring at all treat every
  ring as an outer (the organizePolygons fallback,
  ogr/ogrgeometryfactory.cpp).
- FID is 0-based (record number - 1), matching OGR shapefile FIDs.

Spark-first scan: the .shx index (8 bytes per record) is read once on the
driver to plan N contiguous record ranges; each range becomes one Spark
task that seek-reads ONLY its byte span of the .shp and its fixed-width
slab of the .dbf, parsing both with vectorized numpy. A single large
shapefile therefore fans out across the cluster — at 100 TB (thousands of
shapefiles, or one huge one) parallelism is min(ranges, cores) with zero
shuffle, and the driver holds only the 8-byte-per-record index plan, never
features. Paths must be visible from executors (local mode, NFS, or any
fuse-mounted DFS); the parse itself never touches the SparkContext.

Write path: a shapefile is a single sequential file with a global header
(bbox, record count) — an inherently serial sink, exactly like the
reference's. ``write_shapefile`` streams ``df.toLocalIterator()`` through
the encoder with O(batch) driver memory, for exporting bounded result
layers to the exchange format; it is NOT the engine's scale sink (parquet
is).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ._util import local_path as _local
from .. import geom

_SHP_NULL = 0
_SHP_POINT = 1
_SHP_POLYLINE = 3
_SHP_POLYGON = 5
_SHP_MULTIPOINT = 8
# Z/M variants parse as their XY base type (Z and M ordinates skipped)
_Z_BASE = {11: 1, 13: 3, 15: 5, 18: 8, 21: 1, 23: 3, 25: 5, 28: 8}




# ---------------------------------------------------------------------------
# DBF (dBASE III) — fixed-width attribute table
# ---------------------------------------------------------------------------


def _dbf_read_header(buf: bytes):
    """-> (nrec, header_size, record_size, fields=[(name, type, len, dec)])."""
    nrec, hsize, rsize = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while off < hsize - 1 and buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    return nrec, hsize, rsize, fields


def _dbf_parse_records(slab: bytes, nrec: int, rsize: int, fields):
    """Vectorized fixed-width decode: one numpy reshape, then per-field
    byte-column slices. Returns list of per-field python lists."""
    arr = np.frombuffer(slab[: nrec * rsize], dtype="S1").reshape(nrec, rsize)
    out = []
    col = 1  # byte 0 is the deletion flag
    for name, ftype, flen, fdec in fields:
        raw = arr[:, col : col + flen].tobytes()
        vals = []
        for i in range(nrec):
            s = raw[i * flen : (i + 1) * flen].decode("utf-8", "replace")
            if ftype == "C":
                s = s.rstrip()
                vals.append(s if s else None)
            elif ftype in ("N", "F"):
                s = s.strip()
                if not s or s.lstrip("*") == "":
                    vals.append(None)
                elif ftype == "N" and fdec == 0 and "." not in s:
                    vals.append(int(s))
                else:
                    vals.append(float(s))
            elif ftype == "L":
                vals.append(
                    True if s[:1] in "YyTt" else False if s[:1] in "NnFf" else None
                )
            else:  # D and anything else -> trimmed string
                s = s.strip()
                vals.append(s if s else None)
        out.append(vals)
        col += flen
    return out


def _dbf_field_defs(schema_fields):
    """Spark schema -> DBF field descriptors (OGR shapefile defaults)."""
    defs = []
    for f in schema_fields:
        t = f.dataType.simpleString()
        name = f.name[:10]  # DBF caps names at 10 chars; case preserved
        if t in ("tinyint", "smallint", "int", "bigint"):
            defs.append((f.name, name, "N", 18, 0))
        elif t in ("float", "double"):
            defs.append((f.name, name, "N", 24, 15))
        elif t == "boolean":
            defs.append((f.name, name, "L", 1, 0))
        else:
            defs.append((f.name, name, "C", 80, 0))
    return defs


def _dbf_format_value(v, ftype: str, flen: int, fdec: int) -> bytes:
    if v is None:
        return b" " * flen
    if ftype == "N" and fdec == 0:
        s = "%*d" % (flen, int(v))
    elif ftype == "N":
        s = "%*.*f" % (flen, fdec, float(v))
        if len(s) > flen:  # overflow: fall back to %g within width
            s = "%*.*g" % (flen, max(1, flen - 9), float(v))
    elif ftype == "L":
        s = "T" if v else "F"
    else:
        s = str(v)[:flen].ljust(flen)
    b = s.encode("utf-8", "replace")
    return b[:flen].rjust(flen) if ftype in ("N", "F") else b[:flen].ljust(flen)


# ---------------------------------------------------------------------------
# SHP geometry <-> WKB
# ---------------------------------------------------------------------------


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _shape_to_wkb(rec: memoryview):
    """One .shp record content -> WKB bytes (or None for null shapes)."""
    (stype,) = struct.unpack_from("<i", rec, 0)
    stype = _Z_BASE.get(stype, stype)
    if stype == _SHP_NULL:
        return None
    if stype == _SHP_POINT:
        x, y = struct.unpack_from("<2d", rec, 4)
        return geom.wkb_point(x, y)
    if stype == _SHP_MULTIPOINT:
        (n,) = struct.unpack_from("<i", rec, 36)
        pts = np.frombuffer(rec, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
        if n == 1:
            return geom.wkb_point(float(pts[0, 0]), float(pts[0, 1]))
        out = [struct.pack("<BI", 1, geom.WKB_MULTIPOINT), struct.pack("<I", n)]
        out += [geom.wkb_point(float(x), float(y)) for x, y in pts]
        return b"".join(out)
    # polyline / polygon share the parts layout
    nparts, npts = struct.unpack_from("<2i", rec, 36)
    parts = np.frombuffer(rec, dtype="<i4", count=nparts, offset=44)
    coords = np.frombuffer(
        rec, dtype="<f8", count=2 * npts, offset=44 + 4 * nparts
    ).reshape(npts, 2)
    bounds = np.append(parts, npts)
    pieces = [coords[bounds[i] : bounds[i + 1]] for i in range(nparts)]
    if stype == _SHP_POLYLINE:
        if nparts == 1:
            return geom.wkb_linestring(pieces[0])
        out = [struct.pack("<BI", 1, geom.WKB_MULTILINESTRING), struct.pack("<I", nparts)]
        out += [geom.wkb_linestring(p) for p in pieces]
        return b"".join(out)
    # polygon: winding classifies rings (spec: outer CW, holes CCW)
    outers, holes = [], []
    for ring in pieces:
        (outers if _ring_signed_area(ring) <= 0 else holes).append(ring)
    if not outers:  # organizePolygons fallback: no CW ring -> all outers
        outers, holes = holes, []
    polys = [[o] for o in outers]
    areas = [abs(_ring_signed_area(o)) for o in outers]
    for h in holes:
        px, py = float(h[0, 0]), float(h[0, 1])
        best, best_area = None, np.inf
        for i, o in enumerate(outers):
            if areas[i] < best_area and geom.points_in_ring(
                np.array([px]), np.array([py]), o
            )[0]:
                best, best_area = i, areas[i]
        if best is None:
            polys.append([h])  # orphan hole promoted (GDAL fallback)
        else:
            polys[best].append(h)
    if len(polys) == 1:
        return geom.wkb_polygon(polys[0])
    return geom.wkb_multipolygon(polys)


def _close(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    return ring


def _wkb_to_shape(wkb: bytes):
    """WKB -> (shape_type, content_bytes_after_type, bbox or None)."""
    if wkb is None:
        return _SHP_NULL, b"", None
    g = geom.parse_wkb(bytes(wkb))
    if g.kind == geom.WKB_POINT:
        xy = np.asarray(g.parts, dtype=np.float64).ravel()
        x, y = float(xy[0]), float(xy[1])
        return _SHP_POINT, struct.pack("<2d", x, y), (x, y, x, y)
    if g.kind == geom.WKB_MULTIPOINT:
        pts = np.asarray(g.parts, dtype=np.float64).reshape(-1, 2)
        bbox = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        body = struct.pack("<4d", *bbox) + struct.pack("<i", len(pts))
        return _SHP_MULTIPOINT, body + pts.astype("<f8").tobytes(), bbox
    if g.kind in (geom.WKB_LINESTRING, geom.WKB_MULTILINESTRING):
        # Geometry.parts is already a list of (n,2) coord arrays for both
        pieces = [np.asarray(p, dtype=np.float64) for p in g.parts]
        return _parts_record(_SHP_POLYLINE, pieces)
    if g.kind in (geom.WKB_POLYGON, geom.WKB_MULTIPOLYGON):
        rings = []
        for poly in g.polygons():
            for j, r in enumerate(poly):
                r = _close(np.asarray(r, dtype=np.float64))
                sa = _ring_signed_area(r)
                # spec winding: outer CW (negative shoelace), holes CCW
                if (j == 0) != (sa <= 0):
                    r = r[::-1]
                rings.append(r)
        return _parts_record(_SHP_POLYGON, rings)
    raise ValueError(f"shapefile cannot store WKB kind {g.kind}")


def _parts_record(stype: int, pieces):
    allc = np.vstack(pieces)
    bbox = (
        float(allc[:, 0].min()),
        float(allc[:, 1].min()),
        float(allc[:, 0].max()),
        float(allc[:, 1].max()),
    )
    npts = sum(len(p) for p in pieces)
    offs, acc = [], 0
    for p in pieces:
        offs.append(acc)
        acc += len(p)
    body = (
        struct.pack("<4d", *bbox)
        + struct.pack("<2i", len(pieces), npts)
        + np.asarray(offs, dtype="<i4").tobytes()
        + allc.astype("<f8").tobytes()
    )
    return stype, body, bbox


# ---------------------------------------------------------------------------
# distributed scan
# ---------------------------------------------------------------------------


def scan_shapefile(spark, shp_path: str, num_partitions: int | None = None):
    """Read ``<base>.shp`` + ``<base>.dbf`` as a DataFrame
    ``(fid bigint, geometry binary<WKB>, <dbf fields...>)``.

    The .shx is read driver-side (8 bytes/record) to split the record
    sequence into ``num_partitions`` contiguous ranges; each range is one
    Spark task seek-reading only its own .shp byte span and .dbf slab.
    """
    shp_path = _local(shp_path)
    base = shp_path[:-4]
    with open(base + ".shx", "rb") as f:
        shx = f.read()
    nrec = (len(shx) - 100) // 8
    idx = np.frombuffer(shx, dtype=">i4", count=2 * nrec, offset=100).reshape(nrec, 2)
    with open(base + ".dbf", "rb") as f:
        dbf_head = f.read(32)
        _, hsize, rsize = struct.unpack_from("<IHH", dbf_head, 4)
        f.seek(0)
        dbf_header = f.read(hsize)
    dbf_nrec, _, _, fields = _dbf_read_header(dbf_header + b"\x0d")
    if num_partitions is None:
        num_partitions = max(1, spark.sparkContext.defaultParallelism)
    num_partitions = max(1, min(num_partitions, nrec or 1))
    splits = np.linspace(0, nrec, num_partitions + 1).astype(np.int64)

    ranges = []
    for p in range(num_partitions):
        lo, hi = int(splits[p]), int(splits[p + 1])
        if lo >= hi:
            continue
        byte_lo = int(idx[lo, 0]) * 2
        byte_hi = (int(idx[hi - 1, 0]) + 4 + int(idx[hi - 1, 1])) * 2
        ranges.append((lo, hi, byte_lo, byte_hi))
    rng_df = spark.createDataFrame(
        ranges, "lo bigint, hi bigint, byte_lo bigint, byte_hi bigint"
    ).repartition(max(1, len(ranges)))

    from pyspark.sql.types import (
        BinaryType,
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    def spark_type(ftype, fdec):
        if ftype == "N" and fdec == 0:
            return LongType()
        if ftype in ("N", "F"):
            return DoubleType()
        if ftype == "L":
            return BooleanType()
        return StringType()

    out_schema = StructType(
        [StructField("fid", LongType()), StructField("geometry", BinaryType())]
        + [
            StructField(name, spark_type(ftype, fdec))
            for name, ftype, flen, fdec in fields
        ]
    )
    field_names = [f[0] for f in fields]

    def read_ranges(batches):
        import pandas as pd

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                with open(base + ".shp", "rb") as f:
                    f.seek(r.byte_lo)
                    span = memoryview(f.read(r.byte_hi - r.byte_lo))
                n = int(r.hi - r.lo)
                geoms = []
                for i in range(int(r.lo), int(r.hi)):
                    off = idx[i, 0] * 2 - r.byte_lo
                    clen = int(idx[i, 1]) * 2
                    geoms.append(_shape_to_wkb(span[off + 8 : off + 8 + clen]))
                with open(base + ".dbf", "rb") as f:
                    f.seek(hsize + int(r.lo) * rsize)
                    slab = f.read(n * rsize)
                cols = _dbf_parse_records(slab, n, rsize, fields)
                data = {
                    "fid": np.arange(r.lo, r.hi, dtype=np.int64),
                    "geometry": geoms,
                }
                for name, vals in zip(field_names, cols):
                    data[name] = vals
                yield pd.DataFrame(data, columns=["fid", "geometry"] + field_names)

    return rng_df.mapInPandas(read_ranges, schema=out_schema)


# ---------------------------------------------------------------------------
# export write (driver-streamed single file — the exchange-format sink)
# ---------------------------------------------------------------------------


def write_shapefile(df, shp_path: str, geometry: str = "geometry"):
    """Stream ``df`` into ``<base>.shp/.shx/.dbf``. Single sequential file
    by format design (global bbox + record count in the header), so this
    is an EXPORT sink: O(batch) driver memory via toLocalIterator, not a
    distributed write. Returns (n_records, shape_type)."""
    shp_path = _local(shp_path)
    base = shp_path[:-4]
    attr_fields = [f for f in df.schema.fields if f.name != geometry]
    defs = _dbf_field_defs(attr_fields)
    rsize = 1 + sum(d[3] for d in defs)

    bbox = [np.inf, np.inf, -np.inf, -np.inf]
    shape_type = [_SHP_NULL]
    recs_shp, recs_shx, recs_dbf = [], [], []
    offset_words = 50  # shp header = 100 bytes

    cols = [f.name for f in attr_fields]
    for row in df.toLocalIterator():
        stype, body, b = _wkb_to_shape(row[geometry])
        if stype != _SHP_NULL:
            shape_type[0] = stype
        if b is not None:
            bbox[0] = min(bbox[0], b[0])
            bbox[1] = min(bbox[1], b[1])
            bbox[2] = max(bbox[2], b[2])
            bbox[3] = max(bbox[3], b[3])
        content = struct.pack("<i", stype) + body
        clen_words = len(content) // 2
        recnum = len(recs_shp) + 1
        recs_shp.append(struct.pack(">2i", recnum, clen_words) + content)
        recs_shx.append(struct.pack(">2i", offset_words, clen_words))
        offset_words += 4 + clen_words
        rec = b" "
        for (name, _dn, ftype, flen, fdec) in defs:
            rec += _dbf_format_value(row[name], ftype, flen, fdec)
        recs_dbf.append(rec)

    n = len(recs_shp)
    if not np.isfinite(bbox[0]):
        bbox = [0.0, 0.0, 0.0, 0.0]

    def shp_header(total_words):
        return (
            struct.pack(">i", 9994)
            + b"\x00" * 20
            + struct.pack(">i", total_words)
            + struct.pack("<2i", 1000, shape_type[0])
            + struct.pack("<4d", *bbox)
            + struct.pack("<4d", 0, 0, 0, 0)
        )

    with open(base + ".shp", "wb") as f:
        f.write(shp_header(offset_words))
        for r in recs_shp:
            f.write(r)
    with open(base + ".shx", "wb") as f:
        f.write(shp_header(50 + 4 * n))
        for r in recs_shx:
            f.write(r)
    with open(base + ".dbf", "wb") as f:
        hsize = 32 + 32 * len(defs) + 1
        f.write(
            struct.pack("<4B", 0x03, 99, 1, 1)
            + struct.pack("<IHH", n, hsize, rsize)
            + b"\x00" * 20
        )
        for (_name, dname, ftype, flen, fdec) in defs:
            f.write(
                dname.encode("ascii", "replace")[:11].ljust(11, b"\x00")
                + ftype.encode()
                + b"\x00" * 4
                + struct.pack("<2B", flen, fdec)
                + b"\x00" * 14
            )
        f.write(b"\x0d")
        for r in recs_dbf:
            f.write(r)
        f.write(b"\x1a")
    return n, shape_type[0]
