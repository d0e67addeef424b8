"""GeoPackage driver: distributed read + export write over stdlib sqlite3.

Implemented from the OGC GeoPackage Encoding Standard (OGC 12-128r19):
GeoPackageBinary (GPB) geometry blobs (§2.1.3 — 'GP' magic, flags byte
with byte-order + envelope-indicator bits, srs_id, optional envelope,
then standard WKB) over a SQLite 3 container with the mandatory
``gpkg_spatial_ref_sys`` / ``gpkg_contents`` / ``gpkg_geometry_columns``
metadata tables. The reference driver is ogr/ogrsf_frmts/gpkg/ (~40k LoC,
C++ over libsqlite3); this is a from-spec reimplementation on Python's
bundled sqlite3 — none of GDAL's code or SQL is reused.

Spark-first scan: the driver opens the file once (read-only) to read the
schema catalog and the rowid extent, plans N contiguous rowid ranges, and
each range becomes one Spark task that opens its own read-only sqlite
connection and selects ONLY its slice (``rowid BETWEEN lo AND hi``, an
index-range scan on the implicit rowid btree — no full-table scan per
task). A multi-GB GeoPackage therefore fans out across executors; sqlite
permits unlimited concurrent readers. Paths must be executor-visible
(local mode, NFS, fuse-mounted DFS).

Write path: SQLite is a single-writer container by design, so
``write_geopackage`` is the exchange-format EXPORT sink (driver-streamed
``toLocalIterator``, O(batch) memory), mirroring the shapefile writer; the
engine's scale sink remains parquet.
"""

from __future__ import annotations

import struct

import numpy as np

from ._util import local_path as _local




# ---------------------------------------------------------------------------
# GPB blob <-> WKB
# ---------------------------------------------------------------------------

_ENV_LEN = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def gpb_to_wkb(blob: bytes | None) -> bytes | None:
    """GeoPackageBinary -> the embedded standard WKB (None for NULL or
    empty-flagged geometries)."""
    if blob is None:
        return None
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob (bad magic)")
    flags = blob[3]
    if flags & 0x20:
        raise ValueError("extended GPB (user-defined) not supported")
    if flags & 0x10:  # empty-geometry flag
        return None
    env = (flags >> 1) & 0x07
    return bytes(blob[8 + _ENV_LEN[env] :])


def wkb_to_gpb(wkb: bytes | None, srid: int) -> bytes | None:
    """Standard WKB -> GPB with no envelope (envelope indicator 0 is
    spec-valid; readers that want one recompute it from the WKB)."""
    if wkb is None:
        return None
    return b"GP\x00\x01" + struct.pack("<i", srid) + bytes(wkb)


# ---------------------------------------------------------------------------
# distributed scan
# ---------------------------------------------------------------------------


def _decl_to_spark(decl: str):
    d = (decl or "").upper()
    if "BOOL" in d:
        return "boolean"
    if "INT" in d:
        return "bigint"
    if any(k in d for k in ("REAL", "DOUB", "FLOA")):
        return "double"
    if any(k in d for k in ("CHAR", "TEXT", "CLOB", "DATE", "TIME")):
        return "string"
    return "binary"  # BLOB and geometry types


_GEOM_DECLS = {
    "GEOMETRY", "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
    "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION",
}


def scan_geopackage(spark, path: str, table: str, num_partitions: int | None = None):
    """Read one feature table as ``(fid bigint, geometry binary<WKB>,
    <attrs...>)``; the geometry column (from gpkg_geometry_columns, falling
    back to declared-type sniffing) is decoded from GPB to plain WKB."""
    import sqlite3

    path = _local(path)
    if not table.replace("_", "").isalnum():
        raise ValueError(f"bad table name {table!r}")
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cols = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        try:
            row = con.execute(
                "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
                (table,),
            ).fetchone()
            geom_col = row[0] if row else None
        except sqlite3.OperationalError:
            geom_col = None
        if geom_col is None:
            for _cid, name, decl, *_ in cols:
                if (decl or "").upper() in _GEOM_DECLS:
                    geom_col = name
                    break
        ext = con.execute(
            f'SELECT min(rowid), max(rowid), count(*) FROM "{table}"'
        ).fetchone()
    finally:
        con.close()
    lo, hi, nrec = (ext[0] or 0), (ext[1] or -1), ext[2]

    attr = [
        (name, _decl_to_spark(decl))
        for _cid, name, decl, *_ in cols
        if name != geom_col and not (name == "fid" and "INT" in (decl or "").upper())
    ]
    schema = "fid bigint, geometry binary" + "".join(
        f", {n} {t}" for n, t in attr
    )
    sel_cols = ", ".join(
        ["rowid"]
        + ([f'"{geom_col}"'] if geom_col else ["NULL"])
        + [f'"{n}"' for n, _t in attr]
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
    rng_df = spark.createDataFrame(ranges, "lo bigint, hi bigint").repartition(
        max(1, len(ranges))
    )
    attr_names = [n for n, _t in attr]
    attr_types = dict(attr)

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
                    "geometry": [gpb_to_wkb(row[1]) for row in rows],
                }
                for j, n in enumerate(attr_names):
                    vals = [row[2 + j] for row in rows]
                    if attr_types[n] == "boolean":
                        vals = [None if v is None else bool(v) for v in vals]
                    data[n] = vals
                yield pd.DataFrame(data, columns=["fid", "geometry"] + attr_names)

    return rng_df.mapInPandas(read_ranges, schema=schema)


# ---------------------------------------------------------------------------
# export write
# ---------------------------------------------------------------------------

_SQLITE_TYPE = {
    "tinyint": "INTEGER", "smallint": "INTEGER", "int": "INTEGER",
    "bigint": "INTEGER", "float": "REAL", "double": "REAL",
    "boolean": "BOOLEAN", "string": "TEXT", "binary": "BLOB",
}


def _srs_wkt(srid: int) -> str:
    try:
        from ..crs_wkt import crs_to_wkt

        return crs_to_wkt(srid)
    except Exception:
        return "undefined"


def write_geopackage(df, path: str, table: str, geometry: str = "geometry",
                     srid: int = 4326):
    """Stream ``df`` into a spec-complete GeoPackage: application_id GPKG,
    the three mandatory metadata tables, one features table. Returns the
    row count."""
    import sqlite3

    path = _local(path)
    if not table.replace("_", "").isalnum():
        raise ValueError(f"bad table name {table!r}")
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")
        con.execute("PRAGMA user_version = 10300")
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, "
            "definition TEXT NOT NULL, description TEXT)"
        )
        for sid, name, org, code, wkt in [
            (-1, "Undefined cartesian SRS", "NONE", -1, "undefined"),
            (0, "Undefined geographic SRS", "NONE", 0, "undefined"),
            (4326, "WGS 84 geodetic", "EPSG", 4326, _srs_wkt(4326)),
        ]:
            con.execute(
                "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
                (name, sid, org, code, wkt),
            )
        if srid not in (-1, 0, 4326):
            con.execute(
                "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
                (f"EPSG:{srid}", srid, "EPSG", srid, _srs_wkt(srid)),
            )
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            "table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, "
            "identifier TEXT UNIQUE, description TEXT DEFAULT '', "
            "last_change DATETIME NOT NULL DEFAULT "
            "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), "
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
            "srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
            "table_name TEXT NOT NULL, column_name TEXT NOT NULL, "
            "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
            "z TINYINT NOT NULL, m TINYINT NOT NULL, "
            "PRIMARY KEY (table_name, column_name))"
        )
        attr = [
            (f.name, _SQLITE_TYPE.get(f.dataType.simpleString(), "TEXT"))
            for f in df.schema.fields
            if f.name != geometry
        ]
        cols_sql = ", ".join(f'"{n}" {t}' for n, t in attr)
        con.execute(
            f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            f'"{geometry}" GEOMETRY{", " + cols_sql if cols_sql else ""})'
        )
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id)"
            " VALUES (?, 'features', ?, ?)",
            (table, table, srid),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, ?, 'GEOMETRY', ?, 0, 0)",
            (table, geometry, srid),
        )
        placeholders = ", ".join(["?"] * (1 + len(attr)))
        ins = (
            f'INSERT INTO "{table}" ("{geometry}"'
            + "".join(f', "{n}"' for n, _t in attr)
            + f") VALUES ({placeholders})"
        )
        n = 0
        batch = []
        env = [None, None, None, None]  # layer extent for gpkg_contents
        for row in df.toLocalIterator():
            gv = row[geometry]
            if gv is not None:
                from .. import geom as _geom

                e = _geom.parse_wkb(bytes(gv)).envelope()
                env = [
                    e[0] if env[0] is None else min(env[0], e[0]),
                    e[1] if env[1] is None else min(env[1], e[1]),
                    e[2] if env[2] is None else max(env[2], e[2]),
                    e[3] if env[3] is None else max(env[3], e[3]),
                ]
            batch.append(
                (wkb_to_gpb(bytes(gv) if gv is not None else None, srid),)
                + tuple(row[nm] for nm, _t in attr)
            )
            n += 1
            if len(batch) >= 2048:
                con.executemany(ins, batch)
                batch = []
        if batch:
            con.executemany(ins, batch)
        if env[0] is not None:
            # spec-recommended layer extent (the reference driver fills
            # it; ogrtindex-style catalogs read it header-only)
            con.execute(
                "UPDATE gpkg_contents SET min_x=?, min_y=?, max_x=?, max_y=? "
                "WHERE table_name=?",
                (*env, table),
            )
        con.commit()
    finally:
        con.close()
    return n
