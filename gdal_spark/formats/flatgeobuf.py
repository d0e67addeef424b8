"""FlatGeobuf driver: distributed read, streaming write — from the spec.

FlatGeobuf (the cloud-native single-file vector format; reference driver
ogr/ogrsf_frmts/flatgeobuf/) is 8 magic bytes ``fgb\\x03fgb\\x00``, a
size-prefixed flatbuffers Header, an optional packed Hilbert R-tree
index, then one size-prefixed flatbuffers Feature per row. Everything
here — including the minimal flatbuffers reader/builder — is implemented
from the public FlatBuffers wire format and the FlatGeobuf schema
(vtable slot numbers match Header.fbs / Feature.fbs), not from the
reference C++.

Spark-first split story (the same driver-plans/executors-read pattern as
the shapefile driver's .shx scan):

- When the file HAS a spatial index, the leaf level of the packed R-tree
  is a flat array of 40-byte nodes whose ``offset`` field is each
  feature's byte offset — the driver reads ONLY those trailing
  ``n*40`` bytes, plans K contiguous byte ranges, and each Spark task
  seek-reads just its span. One big .fgb fans out across the cluster
  with zero shuffle and no full-file driver read.
- Without an index, feature records are size-prefixed but not
  self-synchronizing, so the driver walks the prefixes once (4-byte
  reads) to recover offsets — correct everywhere, documented as the
  slow path; write with an index (or ask for one) at scale.

The export sink streams ``toLocalIterator`` into a single spec-valid
file with O(batch) driver memory (single-file formats cannot have a
distributed sink without a final concatenation owner); features spool to
a temp file so the header — which must precede them and carries
``features_count`` + envelope — is still written in one pass.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ._util import local_path as _local
from .. import geom

MAGIC = b"fgb\x03fgb\x00"

# FlatGeobuf GeometryType (header_generated.h:27-49)
GT_UNKNOWN, GT_POINT, GT_LINESTRING, GT_POLYGON = 0, 1, 2, 3
GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON = 4, 5, 6

# FlatGeobuf ColumnType (header_generated.h:107-125)
CT_BYTE, CT_UBYTE, CT_BOOL, CT_SHORT, CT_USHORT = 0, 1, 2, 3, 4
CT_INT, CT_UINT, CT_LONG, CT_ULONG = 5, 6, 7, 8
CT_FLOAT, CT_DOUBLE, CT_STRING, CT_JSON, CT_DATETIME, CT_BINARY = (
    9, 10, 11, 12, 13, 14,
)

_CT_FIXED = {
    CT_BYTE: ("<b", 1), CT_UBYTE: ("<B", 1), CT_BOOL: ("<B", 1),
    CT_SHORT: ("<h", 2), CT_USHORT: ("<H", 2), CT_INT: ("<i", 4),
    CT_UINT: ("<I", 4), CT_LONG: ("<q", 8), CT_ULONG: ("<Q", 8),
    CT_FLOAT: ("<f", 4), CT_DOUBLE: ("<d", 8),
}
_CT_VARLEN = {CT_STRING, CT_JSON, CT_DATETIME, CT_BINARY}

# FGB column type -> Spark type (ULong follows the reference driver's
# lossy OFTReal mapping; DateTime kept as its ISO string)
_CT_SPARK = {
    CT_BYTE: "tinyint", CT_UBYTE: "smallint", CT_BOOL: "boolean",
    CT_SHORT: "smallint", CT_USHORT: "int", CT_INT: "int",
    CT_UINT: "bigint", CT_LONG: "bigint", CT_ULONG: "double",
    CT_FLOAT: "float", CT_DOUBLE: "double", CT_STRING: "string",
    CT_JSON: "string", CT_DATETIME: "string", CT_BINARY: "binary",
}
_SPARK_CT = {
    "boolean": CT_BOOL, "tinyint": CT_BYTE, "smallint": CT_SHORT,
    "int": CT_INT, "bigint": CT_LONG, "float": CT_FLOAT,
    "double": CT_DOUBLE, "string": CT_STRING, "binary": CT_BINARY,
}


# ---------------------------------------------------------------------------
# minimal flatbuffers wire format: reader
# ---------------------------------------------------------------------------


def _u16(b, o):
    return struct.unpack_from("<H", b, o)[0]


def _u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


def _root(b):
    return _u32(b, 0)


def _field(b, tpos, vt_slot):
    """Byte offset of a table field from the table position; 0 = absent.
    vt_slot is the VT_* constant (4, 6, 8, ...)."""
    soff = struct.unpack_from("<i", b, tpos)[0]
    vt = tpos - soff
    if vt_slot >= _u16(b, vt):
        return 0
    return _u16(b, vt + vt_slot)


def _scalar(b, tpos, slot, fmt, default):
    off = _field(b, tpos, slot)
    if off == 0:
        return default
    return struct.unpack_from(fmt, b, tpos + off)[0]


def _indirect(b, pos):
    return pos + _u32(b, pos)


def _vec(b, tpos, slot):
    """(data_pos, count) of a vector field, or (0, 0)."""
    off = _field(b, tpos, slot)
    if off == 0:
        return 0, 0
    vpos = _indirect(b, tpos + off)
    return vpos + 4, _u32(b, vpos)


def _string(b, tpos, slot):
    pos, n = _vec(b, tpos, slot)
    if pos == 0:
        return None
    return b[pos:pos + n].decode("utf-8")


def _f64_vec(b, tpos, slot):
    pos, n = _vec(b, tpos, slot)
    if pos == 0:
        return None
    return np.frombuffer(b, dtype="<f8", count=n, offset=pos)


def _u32_vec(b, tpos, slot):
    pos, n = _vec(b, tpos, slot)
    if pos == 0:
        return None
    return np.frombuffer(b, dtype="<u4", count=n, offset=pos)


def _table_vec(b, tpos, slot):
    """List of table positions for a vector-of-tables field."""
    pos, n = _vec(b, tpos, slot)
    if pos == 0:
        return []
    return [_indirect(b, pos + 4 * i) for i in range(n)]


# ---------------------------------------------------------------------------
# minimal flatbuffers wire format: builder (back-to-front chunks)
# ---------------------------------------------------------------------------


class _Builder:
    """Just enough of a FlatBufferBuilder for the FGB schemas: scalar
    vectors, strings, tables, vectors of tables. Offsets returned are
    back-offsets (distance from buffer end); the final buffer is padded
    so its total size is a multiple of 8, which makes every internally
    8-aligned item 8-aligned absolutely."""

    def __init__(self):
        self.chunks: list[bytes] = []
        self.size = 0

    def _push(self, b: bytes):
        self.chunks.append(b)
        self.size += len(b)

    def _aligned_push(self, chunk: bytes, want_end_mod: int, align: int):
        """Push chunk with leading pad so (size_after % align) ==
        want_end_mod; returns size_after (the chunk-start back-offset)."""
        pad = (want_end_mod - (self.size + len(chunk))) % align
        if pad:
            self._push(b"\x00" * pad)
        self._push(chunk)
        return self.size

    def vector_f64(self, vals) -> int:
        a = np.asarray(vals, dtype="<f8")
        chunk = struct.pack("<I", len(a)) + a.tobytes()
        return self._aligned_push(chunk, 4, 8)  # data 8-aligned, len before

    def vector_u32(self, vals) -> int:
        a = np.asarray(vals, dtype="<u4")
        chunk = struct.pack("<I", len(a)) + a.tobytes()
        return self._aligned_push(chunk, 0, 4)

    def bytes_vec(self, data: bytes) -> int:
        chunk = struct.pack("<I", len(data)) + bytes(data)
        return self._aligned_push(chunk, 0, 4)

    def string(self, s: str) -> int:
        data = s.encode("utf-8")
        chunk = struct.pack("<I", len(data)) + data + b"\x00"
        return self._aligned_push(chunk, 0, 4)

    def vector_of_tables(self, offs: list[int]) -> int:
        # element k (at chunk offset 4+4k) stores a forward uoffset to its
        # table: elem_back = S - (4+4k); value = elem_back - target_back
        n = len(offs)
        chunk_len = 4 + 4 * n
        pad = (0 - (self.size + chunk_len)) % 4
        S = self.size + pad + chunk_len
        parts = [struct.pack("<I", n)]
        for k, t in enumerate(offs):
            parts.append(struct.pack("<I", (S - (4 + 4 * k)) - t))
        if pad:
            self._push(b"\x00" * pad)
        self._push(b"".join(parts))
        assert self.size == S
        return S

    def table(self, fields) -> int:
        """fields: list of (vt_slot, kind, value); kind in
        {'u8','u16','u32','u64','i32','f64','off'}. Returns back-offset."""
        sizes = {"u8": 1, "u16": 2, "u32": 4, "u64": 8, "i32": 4,
                 "f64": 8, "off": 4}
        fmts = {"u8": "<B", "u16": "<H", "u32": "<I", "u64": "<Q",
                "i32": "<i", "f64": "<d"}
        present = [f for f in fields if f[2] is not None]
        # biggest-first layout => internal alignment with zero thought
        present.sort(key=lambda f: -sizes[f[1]])
        d = 4  # after the 4-byte soffset
        slots = {}
        for slot, kind, _v in present:
            sz = sizes[kind]
            d += (-d) % sz
            slots[slot] = (d, kind)
            d += sz
        tbl_len = d + ((-d) % 4)
        max_slot = max((f[0] for f in present), default=2)
        vt_len = max_slot + 2
        # table chunk start back-offset S: pushed 8-aligned
        pad = (0 - (self.size + tbl_len)) % 8
        S = self.size + pad + tbl_len
        buf = bytearray(tbl_len)
        struct.pack_into("<i", buf, 0, vt_len)  # soffset: vtable follows
        for slot, kind, v in present:
            dd, _k = slots[slot]
            if kind == "off":
                struct.pack_into("<I", buf, dd, (S - dd) - v)
            else:
                struct.pack_into(fmts[kind], buf, dd, v)
        if pad:
            self._push(b"\x00" * pad)
        self._push(bytes(buf))
        assert self.size == S
        # vtable directly after (in back-offset order) => soffset == vt_len
        vt = bytearray(vt_len)
        struct.pack_into("<H", vt, 0, vt_len)
        struct.pack_into("<H", vt, 2, tbl_len)
        for slot, (dd, _k) in slots.items():
            struct.pack_into("<H", vt, slot, dd)
        self._push(bytes(vt))
        return S

    def finish_size_prefixed(self, root: int) -> bytes:
        body = b"".join(reversed(self.chunks))
        pad = (0 - (4 + len(body))) % 8
        total = 4 + pad + len(body)
        return (
            struct.pack("<I", total)
            + struct.pack("<I", total - root)
            + b"\x00" * pad
            + body
        )


# ---------------------------------------------------------------------------
# header
# ---------------------------------------------------------------------------

# Header vtable slots (header_generated.h:519-536)
_H_NAME, _H_ENVELOPE, _H_GEOMTYPE = 4, 6, 8
_H_COLUMNS, _H_COUNT, _H_NODESIZE, _H_CRS = 18, 20, 22, 24
# Column slots (header_generated.h:160-176)
_C_NAME, _C_TYPE = 4, 6
# Crs slots: org=4, code=6
_CRS_ORG, _CRS_CODE = 4, 6
# Geometry slots (feature_generated.h:32-39)
_G_ENDS, _G_XY, _G_TYPE, _G_PARTS = 4, 6, 16, 18
# Feature slots (feature_generated.h:221-223)
_F_GEOMETRY, _F_PROPERTIES = 4, 6


def _parse_header(buf: bytes) -> dict:
    t = _root(buf)
    cols = []
    for cpos in _table_vec(buf, t, _H_COLUMNS):
        cols.append(
            (_string(buf, cpos, _C_NAME),
             _scalar(buf, cpos, _C_TYPE, "<B", 0))
        )
    crs_off = _field(buf, t, _H_CRS)
    code = 0
    if crs_off:
        code = _scalar(buf, _indirect(buf, t + crs_off), _CRS_CODE, "<i", 0)
    env = _f64_vec(buf, t, _H_ENVELOPE)
    return {
        "name": _string(buf, t, _H_NAME),
        "geometry_type": _scalar(buf, t, _H_GEOMTYPE, "<B", 0),
        "columns": cols,
        "features_count": _scalar(buf, t, _H_COUNT, "<Q", 0),
        "index_node_size": _scalar(buf, t, _H_NODESIZE, "<H", 16),
        "srid": code,
        "envelope": None if env is None else [float(v) for v in env],
    }


def _build_header(name, gtype, columns, count, srid, envelope,
                  node_size: int = 0) -> bytes:
    fb = _Builder()
    col_offs = []
    for cname, ct in columns:
        noff = fb.string(cname)
        col_offs.append(
            fb.table([(_C_NAME, "off", noff), (_C_TYPE, "u8", ct or None)])
        )
    cols_vec = fb.vector_of_tables(col_offs) if col_offs else None
    crs = None
    if srid:
        org = fb.string("EPSG")
        crs = fb.table([(_CRS_ORG, "off", org), (_CRS_CODE, "i32", srid)])
    env = fb.vector_f64(envelope) if envelope is not None else None
    noff = fb.string(name)
    root = fb.table([
        (_H_NAME, "off", noff),
        (_H_ENVELOPE, "off", env),
        (_H_GEOMTYPE, "u8", gtype or None),
        (_H_COLUMNS, "off", cols_vec),
        (_H_COUNT, "u64", count or None),
        (_H_NODESIZE, "u16", node_size),  # explicit (flatbuffer default is 16)
        (_H_CRS, "off", crs),
    ])
    return fb.finish_size_prefixed(root)


def _index_size(n: int, node_size: int) -> int:
    """Packed Hilbert R-tree byte size (packedrtree.cpp level math)."""
    if node_size == 0 or n == 0:
        return 0
    ns = max(int(node_size), 2)
    # replicate the reference's do-while exactly: even a single item gets
    # a root level above it (packedrtree.cpp generateLevelBounds)
    sizes = [n]
    m = n
    while True:
        m = (m + ns - 1) // ns
        sizes.append(m)
        if m == 1:
            break
    return 40 * sum(sizes)


# ---------------------------------------------------------------------------
# geometry: WKB <-> FGB Geometry table
# ---------------------------------------------------------------------------


def _geom_fields(fb: _Builder, g: geom.Geometry):
    """Returns (fields for a Geometry table, geometry_type)."""
    if g.kind == geom.WKB_POINT:
        xy = fb.vector_f64(np.asarray(g.parts, float).ravel())
        return [(_G_XY, "off", xy), (_G_TYPE, "u8", GT_POINT)], GT_POINT
    if g.kind == geom.WKB_LINESTRING:
        coords = g.parts[0] if isinstance(g.parts, list) else g.parts
        xy = fb.vector_f64(np.asarray(coords, float).ravel())
        return [(_G_XY, "off", xy), (_G_TYPE, "u8", GT_LINESTRING)], GT_LINESTRING
    if g.kind == geom.WKB_POLYGON:
        rings = [np.asarray(r, float) for r in g.parts]
        flat = np.vstack(rings)
        xy = fb.vector_f64(flat.ravel())
        ends = None
        if len(rings) > 1:
            ends = fb.vector_u32(np.cumsum([len(r) for r in rings]))
        return (
            [(_G_ENDS, "off", ends), (_G_XY, "off", xy),
             (_G_TYPE, "u8", GT_POLYGON)],
            GT_POLYGON,
        )
    if g.kind == geom.WKB_MULTIPOLYGON:
        part_offs = []
        for rings in g.parts:
            sub = geom.Geometry(geom.WKB_POLYGON, rings)
            fields, _t = _geom_fields(fb, sub)
            part_offs.append(fb.table(fields))
        parts = fb.vector_of_tables(part_offs)
        return (
            [(_G_PARTS, "off", parts), (_G_TYPE, "u8", GT_MULTIPOLYGON)],
            GT_MULTIPOLYGON,
        )
    raise ValueError(f"flatgeobuf write: unsupported WKB kind {g.kind}")


def _wkb_multipoint(xy: np.ndarray) -> bytes:
    out = [struct.pack("<BI", 1, geom.WKB_MULTIPOINT),
           struct.pack("<I", len(xy))]
    for x, y in xy:
        out.append(struct.pack("<BIdd", 1, geom.WKB_POINT, x, y))
    return b"".join(out)


def _wkb_multilinestring(lines) -> bytes:
    out = [struct.pack("<BI", 1, geom.WKB_MULTILINESTRING),
           struct.pack("<I", len(lines))]
    for ln in lines:
        out.append(geom.wkb_linestring(ln))
    return b"".join(out)


def _split_ends(xy: np.ndarray, ends) -> list[np.ndarray]:
    if ends is None or len(ends) < 2:
        return [xy]
    parts, prev = [], 0
    for e in ends:
        parts.append(xy[prev:int(e)])
        prev = int(e)
    return parts


def _read_geometry(buf: bytes, gpos: int, header_type: int) -> bytes | None:
    gt = _scalar(buf, gpos, _G_TYPE, "<B", 0) or header_type
    xyf = _f64_vec(buf, gpos, _G_XY)
    xy = None if xyf is None else xyf.reshape(-1, 2)
    ends = _u32_vec(buf, gpos, _G_ENDS)
    # EMPTY geometries (table present, no coordinate vector) come back as
    # NULL geometry — crashing the task on POINT EMPTY in a foreign file
    # is not an option (multipolygons carry coords in parts instead)
    if xy is None and gt != GT_MULTIPOLYGON:
        return None
    if gt == GT_POINT:
        return geom.wkb_point(float(xy[0, 0]), float(xy[0, 1]))
    if gt == GT_LINESTRING:
        return geom.wkb_linestring(xy)
    if gt == GT_POLYGON:
        return geom.wkb_polygon(_split_ends(xy, ends))
    if gt == GT_MULTIPOINT:
        return _wkb_multipoint(xy)
    if gt == GT_MULTILINESTRING:
        return _wkb_multilinestring(_split_ends(xy, ends))
    if gt == GT_MULTIPOLYGON:
        polys = []
        for ppos in _table_vec(buf, gpos, _G_PARTS):
            pxy = _f64_vec(buf, ppos, _G_XY).reshape(-1, 2)
            pends = _u32_vec(buf, ppos, _G_ENDS)
            polys.append(_split_ends(pxy, pends))
        return geom.wkb_multipolygon(polys)
    raise ValueError(f"flatgeobuf read: unsupported geometry type {gt}")


# ---------------------------------------------------------------------------
# properties blob
# ---------------------------------------------------------------------------


def _encode_props(values: dict, columns) -> bytes:
    out = []
    for i, (name, ct) in enumerate(columns):
        v = values.get(name)
        if v is None or (isinstance(v, float) and pd.isna(v)):
            continue
        out.append(struct.pack("<H", i))
        if ct in _CT_FIXED:
            fmt, _sz = _CT_FIXED[ct]
            if ct == CT_BOOL:
                v = 1 if v else 0
            out.append(struct.pack(fmt, v))
        elif ct == CT_BINARY:
            b = bytes(v)
            out.append(struct.pack("<I", len(b)) + b)
        else:  # string-family
            b = str(v).encode("utf-8")
            out.append(struct.pack("<I", len(b)) + b)
    return b"".join(out)


def _decode_props(buf: bytes, columns) -> dict:
    vals = {}
    o, n = 0, len(buf)
    while o + 2 <= n:
        idx = struct.unpack_from("<H", buf, o)[0]
        o += 2
        name, ct = columns[idx]
        if ct in _CT_FIXED:
            fmt, sz = _CT_FIXED[ct]
            v = struct.unpack_from(fmt, buf, o)[0]
            if ct == CT_BOOL:
                v = bool(v)
            elif ct == CT_ULONG:
                v = float(v)
            o += sz
        else:
            ln = struct.unpack_from("<I", buf, o)[0]
            o += 4
            raw = buf[o:o + ln]
            o += ln
            v = bytes(raw) if ct == CT_BINARY else raw.decode("utf-8")
        vals[name] = v
    return vals


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------




def read_fgb_header(path: str) -> dict:
    """Parse magic + header; adds the absolute byte offset where features
    start (header end + index size)."""
    with open(_local(path), "rb") as f:
        magic = f.read(8)
        if magic[:4] != MAGIC[:4]:
            raise ValueError(f"not a FlatGeobuf file: magic {magic[:4]!r}")
        hsize = struct.unpack("<I", f.read(4))[0]
        hdr = _parse_header(f.read(hsize))
        hdr["features_offset"] = (
            12 + hsize
            + _index_size(hdr["features_count"], hdr["index_node_size"])
        )
        hdr["index_offset"] = 12 + hsize
    return hdr


def _feature_offsets(path: str, hdr: dict) -> np.ndarray:
    """Byte offset of every feature record, relative to features_offset.

    Index present: read ONLY the trailing leaf level of the packed
    R-tree (one node per feature, 40 bytes, offset field at +32).
    No index: walk the size prefixes once (the documented slow path)."""
    n = hdr["features_count"]
    with open(_local(path), "rb") as f:
        if hdr["index_node_size"] > 0 and n > 0:
            isize = _index_size(n, hdr["index_node_size"])
            f.seek(hdr["index_offset"] + isize - 40 * n)
            nodes = np.frombuffer(f.read(40 * n), dtype="<u1").reshape(n, 40)
            offs = nodes[:, 32:40].copy().view("<u8").ravel()
            return np.sort(offs.astype(np.int64))
        f.seek(0, 2)
        end = f.tell()
        offs = []
        pos = hdr["features_offset"]
        while pos + 4 <= end:
            offs.append(pos - hdr["features_offset"])
            f.seek(pos)
            sz = struct.unpack("<I", f.read(4))[0]
            pos += 4 + sz
        return np.asarray(offs, dtype=np.int64)


def _search_index(path: str, hdr: dict, bbox) -> np.ndarray:
    """Packed-R-tree bbox search (the reference's streamSearch shape):
    walk levels top-down, reading only the node spans the query
    intersects, and return the byte offsets of matching FEATURES. The
    driver reads O(matching subtrees * 40B), never the feature bytes."""
    n = hdr["features_count"]
    ns = max(int(hdr["index_node_size"]), 2)
    sizes = [n]
    m = n
    while True:
        m = (m + ns - 1) // ns
        sizes.append(m)
        if m == 1:
            break
    num_nodes = sum(sizes)
    starts = []
    acc = num_nodes
    for sz in sizes:
        acc -= sz
        starts.append(acc)  # starts[0] = leaf level start index
    # level of each start for bound lookups: level i spans
    # [starts[i], starts[i] + sizes[i])
    qx0, qy0, qx1, qy1 = bbox
    hits: list[int] = []
    with open(_local(path), "rb") as f:
        def read_nodes(i0, i1):
            f.seek(hdr["index_offset"] + 40 * i0)
            raw = f.read(40 * (i1 - i0))
            return [
                struct.unpack_from("<ddddQ", raw, 40 * k)
                for k in range(i1 - i0)
            ]

        # queue of (node_index, level); root is the last level
        root_level = len(sizes) - 1
        queue = [(starts[root_level], root_level)]
        while queue:
            idx, lvl = queue.pop()
            end = min(idx + ns, starts[lvl] + sizes[lvl])
            for off, nd in enumerate(read_nodes(idx, end)):
                if nd[0] > qx1 or nd[1] > qy1 or nd[2] < qx0 or nd[3] < qy0:
                    continue
                if lvl == 0:
                    hits.append(int(nd[4]))
                else:
                    queue.append((int(nd[4]), lvl - 1))
                del off
    return np.sort(np.asarray(hits, dtype=np.int64))


def scan_flatgeobuf(spark, path: str, num_partitions: int = 4, bbox=None):
    """Distributed read -> (geometry binary<WKB>, <props...>). The driver
    touches header + index (or prefix walk) only; each task seek-reads
    its contiguous byte span and parses its features.

    ``bbox=(minx, miny, maxx, maxy)`` with an indexed file pushes the
    spatial filter INTO the scan: the packed R-tree prunes to matching
    feature offsets driver-side (envelope phase), tasks read only the
    byte spans that contain candidates, and an exact envelope re-check
    runs per feature (rows whose envelope merely touched a shared tree
    node are dropped). Without an index, bbox degrades to the exact
    per-feature check over the full walk."""
    hdr = read_fgb_header(path)
    cols = hdr["columns"]
    fields = ", ".join(f"`{c}` {_CT_SPARK[t]}" for c, t in cols)
    schema = "geometry binary" + (", " + fields if fields else "")
    size = os.path.getsize(_local(path))
    feat0 = hdr["features_offset"]
    gtype = hdr["geometry_type"]
    pruned = (
        bbox is not None
        and hdr["index_node_size"] > 0
        and hdr["features_count"] > 0
    )
    all_offs = _feature_offsets(_local(path), hdr)
    offs = _search_index(_local(path), hdr, bbox) if pruned else all_offs
    n = len(offs)
    k = max(1, min(num_partitions, n)) if n else 1
    if n == 0:
        ranges = [] if bbox is not None else [(path, feat0, size)]
    else:
        # k groups of consecutive candidates; each span ends at the offset
        # of the feature AFTER the group's last candidate (known from the
        # full leaf set), so spans never split a record
        ends = np.append(all_offs, size - feat0)
        ranges = []
        for i in range(k):
            g0, g1 = (i * n) // k, ((i + 1) * n) // k
            if g1 <= g0:
                continue
            lo = int(offs[g0])
            last = int(offs[g1 - 1])
            hi = int(ends[np.searchsorted(all_offs, last) + 1])
            ranges.append((path, feat0 + lo, feat0 + hi))
    if not ranges:
        return spark.createDataFrame([], schema)
    # parallelize with one slice per range: exactly one task per planned
    # byte span (repartition's round-robin starts at a random offset per
    # input partition and can clump ranges together)
    rdf = spark.createDataFrame(
        spark.sparkContext.parallelize(ranges, len(ranges)),
        "path string, lo long, hi long",
    )

    col_names = [c for c, _t in cols]

    def parse(batches):
        CHUNK = 32 << 20     # bytes read from the file at a time
        FLUSH = 8192         # rows per yielded Arrow frame
        # a task's memory is O(CHUNK + largest feature + FLUSH rows),
        # never O(range span) — the span only streams through
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                rows = []
                with open(_local(r.path), "rb") as f:
                    f.seek(r.lo)
                    remaining = r.hi - r.lo
                    buf = b""
                    pos = 0
                    while True:
                        need = 4
                        if len(buf) - pos >= 4:
                            need = 4 + struct.unpack_from("<I", buf, pos)[0]
                        while len(buf) - pos < need and remaining > 0:
                            chunk = f.read(min(CHUNK, remaining))
                            remaining -= len(chunk)
                            buf = buf[pos:] + chunk
                            pos = 0
                            if len(buf) >= 4:
                                need = 4 + struct.unpack_from("<I", buf, 0)[0]
                        if len(buf) - pos < need or need == 4:
                            break
                        fbuf = buf[pos + 4:pos + need]
                        pos += need
                        t = _root(fbuf)
                        goff = _field(fbuf, t, _F_GEOMETRY)
                        wkb = None
                        if goff:
                            wkb = _read_geometry(
                                fbuf, _indirect(fbuf, t + goff), gtype
                            )
                        if bbox is not None:
                            # exact envelope phase-2 check: spans may carry
                            # non-candidates between candidates, and tree
                            # nodes over-approximate
                            if wkb is None:
                                continue
                            e = geom.parse_wkb(bytes(wkb)).envelope()
                            if (e[0] > bbox[2] or e[1] > bbox[3]
                                    or e[2] < bbox[0] or e[3] < bbox[1]):
                                continue
                        ppos, pn = _vec(fbuf, t, _F_PROPERTIES)
                        props = (
                            _decode_props(fbuf[ppos:ppos + pn], cols)
                            if ppos else {}
                        )
                        rows.append([wkb] + [props.get(c) for c in col_names])
                        if len(rows) >= FLUSH:
                            yield pd.DataFrame(
                                rows, columns=["geometry"] + col_names
                            )
                            rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=["geometry"] + col_names)

    return rdf.mapInPandas(parse, schema=schema)


def _hilbert_d(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Classic Hilbert curve xy->d (the textbook rotate-and-flip loop,
    vectorized). The FlatGeobuf spec only requires the tree's bounding
    boxes to contain their children — leaf ORDER affects query locality,
    not validity — so this variant's orientation differing from the
    canonical implementation's curve is a layout detail."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = ry == 0
        swapflip = flip & (rx == 1)
        x2 = np.where(swapflip, s - 1 - x, x)
        y2 = np.where(swapflip, s - 1 - y, y)
        x, y = np.where(flip, y2, x2), np.where(flip, x2, y2)
        s >>= 1
    return d


def _build_index(leaves: list[tuple], node_size: int) -> bytes:
    """Packed Hilbert R-tree bytes (packedrtree.cpp storage layout:
    root level first, leaves last; internal node offset = index of its
    first child NODE). ``leaves`` = [(minx,miny,maxx,maxy,offset), ...]
    already in Hilbert order with final feature byte offsets."""
    n = len(leaves)
    ns = max(int(node_size), 2)
    sizes = [n]
    m = n
    while True:
        m = (m + ns - 1) // ns
        sizes.append(m)
        if m == 1:
            break
    num_nodes = sum(sizes)
    # level start indexes in storage order (leaves last)
    starts = []
    acc = num_nodes
    for sz in sizes:
        acc -= sz
        starts.append(acc)  # starts[0] = leaf level start
    nodes = [(0.0, 0.0, 0.0, 0.0, 0)] * num_nodes
    for i, leaf in enumerate(leaves):
        nodes[starts[0] + i] = leaf
    for lvl in range(len(sizes) - 1):
        pos, end = starts[lvl], starts[lvl] + sizes[lvl]
        newpos = starts[lvl + 1]
        while pos < end:
            first_child = pos
            bb = [np.inf, np.inf, -np.inf, -np.inf]
            for _ in range(ns):
                if pos >= end:
                    break
                c = nodes[pos]
                bb = [min(bb[0], c[0]), min(bb[1], c[1]),
                      max(bb[2], c[2]), max(bb[3], c[3])]
                pos += 1
            nodes[newpos] = (bb[0], bb[1], bb[2], bb[3], first_child)
            newpos += 1
    return b"".join(
        struct.pack("<ddddQ", *nd) for nd in nodes
    )


def write_flatgeobuf(df, path: str, name: str = "layer", srid: int = 0,
                     geometry: str = "geometry", batch_size: int = 1024,
                     index_node_size: int = 0):
    """Single-file spec-valid sink: features spool through a temp file
    while the envelope / count / layer geometry type accumulate, then
    magic + header (+ optional packed Hilbert R-tree) + features
    concatenate. O(batch) driver memory via toLocalIterator.

    With ``index_node_size > 0`` the sink also writes the spatial index:
    features are re-ordered by the Hilbert value of their envelope
    center (random reads of the temp spool — a driver-side pass, the
    price any single-file indexed sink pays) and the leaf nodes carry
    their final byte offsets, so :func:`scan_flatgeobuf` plans ranges
    from the index instead of walking prefixes — write with an index at
    scale."""
    import shutil
    import tempfile

    attr = [
        (f.name, _SPARK_CT.get(f.dataType.simpleString()))
        for f in df.schema.fields
        if f.name != geometry
    ]
    for fname, _ct in attr:
        if _ct is None:
            raise ValueError(f"flatgeobuf write: unsupported column {fname}")
    out_path = _local(path)
    count = 0
    env = [np.inf, np.inf, -np.inf, -np.inf]
    gtypes = set()
    recs = []  # (minx, miny, maxx, maxy, spool_off, size) per feature
    spool_off = 0
    tmp = tempfile.NamedTemporaryFile(delete=False)
    try:
        for row in df.toLocalIterator():
            fb = _Builder()
            d = row.asDict()
            wkb = d.get(geometry)
            if wkb is None and index_node_size > 0:
                # reference-driver parity: a spatial index cannot carry a
                # geometry-less feature (its leaf bbox would be a lie)
                raise ValueError(
                    "flatgeobuf write: NULL geometry not supported with "
                    "a spatial index (index_node_size > 0)"
                )
            gfields = None
            fenv = (0.0, 0.0, 0.0, 0.0)
            if wkb is not None:
                g = geom.parse_wkb(bytes(wkb))
                fields, gt = _geom_fields(fb, g)
                gfields = fb.table(fields)
                gtypes.add(gt)
                e = g.envelope()
                fenv = e
                env[0] = min(env[0], e[0])
                env[1] = min(env[1], e[1])
                env[2] = max(env[2], e[2])
                env[3] = max(env[3], e[3])
            props = _encode_props(d, attr)
            poff = fb.bytes_vec(props) if props else None
            root = fb.table([
                (_F_GEOMETRY, "off", gfields),
                (_F_PROPERTIES, "off", poff),
            ])
            rec = fb.finish_size_prefixed(root)
            tmp.write(rec)
            if index_node_size > 0:
                # only the indexed path reorders/rereads the spool; the
                # default path must stay O(batch) driver memory
                recs.append((fenv[0], fenv[1], fenv[2], fenv[3],
                             spool_off, len(rec)))
            spool_off += len(rec)
            count += 1
        tmp.close()
        gtype = gtypes.pop() if len(gtypes) == 1 else GT_UNKNOWN
        # all-null-geometry layers have no meaningful extent: skip the index
        with_index = index_node_size > 0 and count > 0 and np.isfinite(env[0])
        header = _build_header(
            name, gtype, attr, count, srid,
            env if count and np.isfinite(env[0]) else None,
            node_size=index_node_size if with_index else 0,
        )
        order = range(count)
        index_bytes = b""
        if with_index:
            w = max(env[2] - env[0], 0.0) or 1.0
            h = max(env[3] - env[1], 0.0) or 1.0
            mx = np.array([(r[0] + r[2]) / 2 for r in recs])
            my = np.array([(r[1] + r[3]) / 2 for r in recs])
            hx = np.floor(65535 * (mx - env[0]) / w).astype(np.int64)
            hy = np.floor(65535 * (my - env[1]) / h).astype(np.int64)
            hd = _hilbert_d(np.clip(hx, 0, 65535), np.clip(hy, 0, 65535))
            order = np.argsort(hd, kind="stable")
            leaves, off = [], 0
            for i in order:
                r = recs[i]
                leaves.append((r[0], r[1], r[2], r[3], off))
                off += r[5]
            index_bytes = _build_index(leaves, index_node_size)
        with open(out_path, "wb") as out:
            out.write(MAGIC)
            out.write(header)
            out.write(index_bytes)
            with open(tmp.name, "rb") as src:
                if with_index:
                    for i in order:
                        src.seek(recs[i][4])
                        out.write(src.read(recs[i][5]))
                else:
                    shutil.copyfileobj(src, out, 1 << 20)
    finally:
        os.unlink(tmp.name)
    return count
