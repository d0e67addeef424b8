"""SpatiaLite / SQLite vector driver — the other big SQLite GIS
container besides GeoPackage.

Reference driver: ogr/ogrsf_frmts/sqlite (ogrsqlitelayer.cpp's
SpatiaLite geometry importer — semantics only; this is a from-scratch
implementation of the published SpatiaLite BLOB-Geometry format over
Python's bundled sqlite3, sharing the GeoPackage driver's distributed
scan shape).

SpatiaLite BLOB layout (public spec): 0x00 start byte, endian byte
(0x01 little / 0x00 big), int32 SRID, 32-byte MBR (minx/miny/maxx/maxy
doubles), 0x7C MBR-end marker, then the geometry body — an int32 class
code followed by WKB-like coordinate data but WITHOUT per-part endian
bytes (the header's endianness governs the whole blob; collection
entities are instead introduced by a 0x69 marker + class code), closed
by 0xFE. Classes 1-7 (XY), 1001-1007 (XYZ) AND the compressed XY
classes (1000000 + base — intermediate vertices as float32 deltas
from the previous vertex, first and last as full doubles; the
reference's own autotest fixture ships compressed polygons) are
supported; XYM/XYZM and compressed-Z are rejected with a clear error.

Conformance: `poly_spatialite.sqlite` (a reference autotest DATA file,
see tests/data/README.md) carries the SAME `poly` layer the FlatGeobuf
conformance fixture does, so the test pins this reader's output against
the independent FlatGeobuf reader's — two from-scratch decoders of two
foreign formats must agree: exactly on the layer extent / counts /
ring endpoints (stored as doubles in both), and to the float32 delta
precision on intermediate vertices (this fixture's polygons are
COMPRESSED — that loss is the format's, not the reader's).

Spark shape: identical to the GeoPackage scan — the driver reads only
the schema catalog + rowid extent, plans contiguous rowid ranges, and
each task opens its own read-only connection and selects only its
slice (sqlite allows unlimited concurrent readers). The writer is the
exchange-format EXPORT sink (sqlite is single-writer by design),
mirroring write_geopackage; the engine's scale sink remains parquet.
"""

from __future__ import annotations

import struct

import numpy as np

from ._util import local_path as _local

# ---------------------------------------------------------------------------
# SpatiaLite BLOB <-> WKB
# ---------------------------------------------------------------------------

_WKB_NAMES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON",
              4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON",
              7: "GEOMETRYCOLLECTION"}


def _geom_body_to_wkb(buf: bytes, i: int, cls: int, bo: str,
                      out: bytearray) -> int:
    """Append the WKB encoding of one geometry body (class ``cls``
    starting at ``buf[i]``) to ``out``; returns the new offset. WKB is
    emitted little-endian regardless of the blob's byte order.
    Compressed classes (1000000 + base: intermediate vertices stored
    as float32 deltas from the previous vertex, first AND last as full
    doubles — the reference's own autotest fixture ships these)
    decompress transparently."""
    compressed = cls >= 1000000
    rest = cls - 1000000 if compressed else cls
    base = rest % 1000
    dims = rest // 1000
    if dims not in (0, 1) or (compressed and dims != 0):
        raise ValueError(
            f"SpatiaLite geometry class {cls} unsupported "
            "(XY + XYZ, compressed XY)"
        )
    ncoord = 3 if dims == 1 else 2
    wkb_type = base + (1000 if dims == 1 else 0)
    out += struct.pack("<BI", 1, wkb_type)

    def rd(fmt, size):
        nonlocal i
        v = struct.unpack_from(bo + fmt, buf, i)
        i += size
        return v

    def copy_points(n):
        nonlocal i
        if not compressed or n <= 2:
            # compressed n<=2 still stores all endpoints as doubles
            raw = buf[i:i + 8 * ncoord * n]
            i += 8 * ncoord * n
            if bo == "<":
                out.extend(raw)
            else:
                out.extend(np.frombuffer(raw, ">f8")
                           .astype("<f8").tobytes())
            return
        pts = np.empty((n, 2), dtype="<f8")
        x, y = rd("2d", 16)
        pts[0] = (x, y)
        for j in range(1, n - 1):
            dx, dy = rd("2f", 8)
            x += float(np.float32(dx))
            y += float(np.float32(dy))
            pts[j] = (x, y)
        pts[n - 1] = rd("2d", 16)
        out.extend(pts.tobytes())

    if base == 1:
        copy_points(1)
    elif base == 2:
        (n,) = rd("I", 4)
        out += struct.pack("<I", n)
        copy_points(n)
    elif base == 3:
        (nr,) = rd("I", 4)
        out += struct.pack("<I", nr)
        for _ in range(nr):
            (n,) = rd("I", 4)
            out += struct.pack("<I", n)
            copy_points(n)
    elif base in (4, 5, 6, 7):
        (ne,) = rd("I", 4)
        out += struct.pack("<I", ne)
        for _ in range(ne):
            marker = buf[i]
            i += 1
            if marker != 0x69:
                raise ValueError(
                    f"bad SpatiaLite entity marker 0x{marker:02x}"
                )
            (ecls,) = rd("I", 4)
            i = _geom_body_to_wkb(buf, i, ecls, bo, out)
    else:
        raise ValueError(f"SpatiaLite geometry class {cls} unsupported")
    return i


def spatialite_to_wkb(blob: bytes | None) -> bytes | None:
    """SpatiaLite BLOB-Geometry -> standard little-endian WKB
    (returns None for NULL)."""
    if blob is None:
        return None
    if len(blob) < 45 or blob[0] != 0x00:
        raise ValueError("not a SpatiaLite geometry blob")
    bo = "<" if blob[1] == 0x01 else ">"
    if blob[38] != 0x7C:
        raise ValueError("SpatiaLite blob missing MBR end marker")
    (cls,) = struct.unpack_from(bo + "I", blob, 39)
    out = bytearray()
    end = _geom_body_to_wkb(blob, 43, cls, bo, out)
    if end >= len(blob) or blob[end] != 0xFE:
        raise ValueError("SpatiaLite blob missing 0xFE terminator")
    return bytes(out)


def spatialite_srid(blob: bytes) -> int:
    bo = "<" if blob[1] == 0x01 else ">"
    return struct.unpack_from(bo + "i", blob, 2)[0]


def wkb_to_spatialite(wkb: bytes | None, srid: int) -> bytes | None:
    """Standard WKB -> SpatiaLite BLOB (little-endian, exact MBR)."""
    if wkb is None:
        return None
    body = bytearray()
    i = _wkb_body(wkb, 0, body, top=True)
    if i != len(wkb):
        raise ValueError("trailing bytes after WKB geometry")
    pts = np.frombuffer(bytes(_collect_xy(wkb)), dtype="<f8")
    xs, ys = pts[0::2], pts[1::2]
    head = struct.pack(
        "<BBi4dB", 0x00, 0x01, int(srid),
        float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()),
        0x7C,
    )
    return head + bytes(body) + b"\xfe"


def _wkb_read_header(wkb: bytes, i: int):
    """Normalize both ISO (1001) and EWKB (0x80000001) Z spellings;
    returns (byte order, base type 1-7, has_z, offset past header)."""
    bo = "<" if wkb[i] == 1 else ">"
    (t,) = struct.unpack_from(bo + "I", wkb, i + 1)
    if t & 0x80000000:  # EWKB flags
        has_z = True
        base = t & 0xFF
    else:
        has_z = (t % 10000) // 1000 == 1
        if (t % 10000) // 1000 >= 2:
            raise ValueError(
                "XYM/XYZM WKB unsupported in SpatiaLite writer")
        base = t % 1000
    if t & 0x40000000:
        raise ValueError("XYM/XYZM WKB unsupported in SpatiaLite writer")
    return bo, base, has_z, i + 5


def _wkb_body(wkb: bytes, i: int, out: bytearray, top: bool) -> int:
    bo, base, has_z, i = _wkb_read_header(wkb, i)
    ncoord = 3 if has_z else 2
    cls = base + (1000 if has_z else 0)
    if top:
        out += struct.pack("<I", cls)

    def copy_points(n):
        nonlocal i
        raw = wkb[i:i + 8 * ncoord * n]
        i += 8 * ncoord * n
        if bo == "<":
            out.extend(raw)
        else:
            out.extend(np.frombuffer(raw, ">f8").astype("<f8").tobytes())

    def rd_u32():
        nonlocal i
        (v,) = struct.unpack_from(bo + "I", wkb, i)
        i += 4
        return v

    if base == 1:
        copy_points(1)
    elif base == 2:
        n = rd_u32()
        out += struct.pack("<I", n)
        copy_points(n)
    elif base == 3:
        nr = rd_u32()
        out += struct.pack("<I", nr)
        for _ in range(nr):
            n = rd_u32()
            out += struct.pack("<I", n)
            copy_points(n)
    elif base in (4, 5, 6, 7):
        ne = rd_u32()
        out += struct.pack("<I", ne)
        for _ in range(ne):
            # peek the child's class for the 0x69 entity header
            _cbo, cbase, chas_z, _ci = _wkb_read_header(wkb, i)
            ccls = cbase + (1000 if chas_z else 0)
            out += b"\x69" + struct.pack("<I", ccls)
            i = _wkb_body(wkb, i, out, top=False)
    else:
        raise ValueError(f"WKB type {base} unsupported")
    return i


def _collect_xy(wkb: bytes) -> bytearray:
    """All x,y doubles of a WKB geometry, little-endian, for the MBR."""
    out = bytearray()

    def walk(i):
        bo, base, has_z, i = _wkb_read_header(wkb, i)
        ncoord = 3 if has_z else 2

        def take(n):
            nonlocal i
            for _ in range(n):
                raw = wkb[i:i + 8 * ncoord]
                i += 8 * ncoord
                xy = raw[:16]
                if bo == ">":
                    xy = np.frombuffer(xy, ">f8").astype("<f8").tobytes()
                out.extend(xy)

        def rd_u32():
            nonlocal i
            (v,) = struct.unpack_from(bo + "I", wkb, i)
            i += 4
            return v

        if base == 1:
            take(1)
        elif base == 2:
            take(rd_u32())
        elif base == 3:
            for _ in range(rd_u32()):
                take(rd_u32())
        else:
            for _ in range(rd_u32()):
                i = walk(i)
        return i

    walk(0)
    if not out:
        raise ValueError("empty WKB geometry")
    return out


# ---------------------------------------------------------------------------
# catalog + distributed scan
# ---------------------------------------------------------------------------


def spatialite_layers(path: str) -> list[dict]:
    """geometry_columns catalog -> [{'table', 'geometry', 'srid'}]."""
    import sqlite3

    con = sqlite3.connect(f"file:{_local(path)}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT f_table_name, f_geometry_column, srid "
            "FROM geometry_columns"
        ).fetchall()
    finally:
        con.close()
    return [{"table": t, "geometry": g, "srid": int(s or 0)}
            for t, g, s in rows]


def scan_spatialite(spark, path: str, table: str,
                    num_partitions: int | None = None):
    """Read one SpatiaLite feature table as ``(fid bigint, geometry
    binary<WKB>, <attrs...>)`` — rowid-range planned exactly like
    :func:`scan_geopackage` (the catalog differs, the container math
    doesn't)."""
    import sqlite3

    path = _local(path)
    if not table.replace("_", "").isalnum():
        raise ValueError(f"bad table name {table!r}")
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cols = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        row = con.execute(
            "SELECT f_geometry_column FROM geometry_columns "
            "WHERE lower(f_table_name) = lower(?)", (table,),
        ).fetchone()
        geom_col = row[0] if row else None
        if geom_col is not None:
            # PRAGMA names are case-exact; catalog may differ in case
            for _cid, name, *_ in cols:
                if name.lower() == geom_col.lower():
                    geom_col = name
                    break
        ext = con.execute(
            f'SELECT min(rowid), max(rowid), count(*) FROM "{table}"'
        ).fetchone()
    finally:
        con.close()
    if geom_col is None:
        raise ValueError(f"{table}: not in geometry_columns")
    lo, hi, nrec = (ext[0] or 0), (ext[1] or -1), ext[2]

    def decl_to_spark(decl: str):
        d = (decl or "").upper()
        if "INT" in d:
            return "bigint"
        if any(k in d for k in ("REAL", "FLOA", "DOUB")):
            return "double"
        if "BLOB" in d:
            return "binary"
        return "string"

    attr = [
        (name, decl_to_spark(decl))
        for _cid, name, decl, *_ in cols
        if name.lower() != geom_col.lower()
        and name.upper() != "OGC_FID"
        and not (name.lower() == "fid" and "INT" in (decl or "").upper())
    ]
    schema = "fid bigint, geometry binary" + "".join(
        f", {n} {t}" for n, t in attr
    )
    sel_cols = ", ".join(
        ["rowid", f'"{geom_col}"'] + [f'"{n}"' for n, _t in attr]
    )

    if num_partitions is None:
        num_partitions = max(1, spark.sparkContext.defaultParallelism)
    num_partitions = max(1, min(num_partitions, max(1, nrec)))
    splits = np.linspace(lo, hi + 1, num_partitions + 1).astype(np.int64)
    ranges = [
        (int(splits[p]), int(splits[p + 1]) - 1)
        for p in range(num_partitions)
        if splits[p] <= splits[p + 1] - 1
    ]
    rng_df = spark.createDataFrame(
        ranges, "lo bigint, hi bigint"
    ).repartition(max(1, len(ranges)))
    attr_names = [n for n, _t in attr]

    def read_ranges(batches):
        import pandas as pd
        import sqlite3 as sq

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                c = sq.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    rows = c.execute(
                        f'SELECT {sel_cols} FROM "{table}" '
                        f"WHERE rowid BETWEEN {int(r.lo)} AND {int(r.hi)} "
                        "ORDER BY rowid"
                    ).fetchall()
                finally:
                    c.close()
                data = {
                    "fid": [row[0] for row in rows],
                    "geometry": [spatialite_to_wkb(row[1])
                                 for row in rows],
                }
                for j, n in enumerate(attr_names):
                    data[n] = [row[2 + j] for row in rows]
                yield pd.DataFrame(
                    data, columns=["fid", "geometry"] + attr_names
                )

    return rng_df.mapInPandas(read_ranges, schema=schema)


# ---------------------------------------------------------------------------
# export write
# ---------------------------------------------------------------------------

_SQLITE_TYPE = {
    "tinyint": "INTEGER", "smallint": "INTEGER", "int": "INTEGER",
    "bigint": "INTEGER", "float": "REAL", "double": "REAL",
    "boolean": "INTEGER", "string": "TEXT", "binary": "BLOB",
}


def write_spatialite(df, path: str, table: str,
                     geometry: str = "geometry", srid: int = 4326,
                     geometry_type: str = "GEOMETRY") -> int:
    """Export ``df`` (geometry column = WKB binary) into a minimal
    SpatiaLite-layout database: spatial_ref_sys + the v4
    geometry_columns catalog + the feature table with BLOB-Geometry
    values. Driver-streamed (toLocalIterator, O(batch) memory) because
    sqlite is single-writer — same contract as write_geopackage."""
    import os
    import sqlite3

    path = _local(path)
    if os.path.exists(path):
        os.unlink(path)
    fields = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if f.name != geometry
    ]
    con = sqlite3.connect(path)
    try:
        con.execute(
            "CREATE TABLE spatial_ref_sys (srid INTEGER PRIMARY KEY, "
            "auth_name TEXT, auth_srid INTEGER, ref_sys_name TEXT, "
            "proj4text TEXT, srtext TEXT)"
        )
        con.execute(
            "INSERT INTO spatial_ref_sys VALUES (?, 'epsg', ?, ?, '', '')",
            (int(srid), int(srid), f"EPSG:{srid}"),
        )
        gtype_code = {"POINT": 1, "LINESTRING": 2, "POLYGON": 3,
                      "MULTIPOINT": 4, "MULTILINESTRING": 5,
                      "MULTIPOLYGON": 6, "GEOMETRY": 0}[geometry_type]
        con.execute(
            "CREATE TABLE geometry_columns (f_table_name TEXT, "
            "f_geometry_column TEXT, geometry_type INTEGER, "
            "coord_dimension INTEGER, srid INTEGER, "
            "spatial_index_enabled INTEGER)"
        )
        con.execute(
            "INSERT INTO geometry_columns VALUES (?, ?, ?, 2, ?, 0)",
            (table, geometry, gtype_code, int(srid)),
        )
        col_sql = ", ".join(
            f'"{n}" {_SQLITE_TYPE.get(t, "TEXT")}' for n, t in fields
        )
        con.execute(
            f'CREATE TABLE "{table}" (OGC_FID INTEGER PRIMARY KEY'
            + (", " + col_sql if col_sql else "")
            + f', "{geometry}" BLOB)'
        )
        names = [n for n, _t in fields]
        ph = ", ".join(["?"] * (len(names) + 1))
        quoted = ", ".join(f'"{n}"' for n in names)
        ins = (f'INSERT INTO "{table}" ({quoted}'
               + (", " if names else "")
               + f'"{geometry}") VALUES ({ph})')
        n = 0
        batch = []
        for row in df.toLocalIterator():
            d = row.asDict()
            vals = [d[nm] for nm in names]
            wkb = d[geometry]
            vals.append(
                wkb_to_spatialite(bytes(wkb) if wkb is not None else None,
                                  srid)
            )
            batch.append(vals)
            n += 1
            if len(batch) >= 1000:
                con.executemany(ins, batch)
                batch = []
        if batch:
            con.executemany(ins, batch)
        con.commit()
    finally:
        con.close()
    return n
