"""MBTiles driver: single-file SQLite tile container (mbtiles-spec 1.3).

Reference semantics (frmts/mbtiles/mbtilesdataset.cpp — semantics only,
no code reused):

- ``tiles (zoom_level, tile_column, tile_row, tile_data)`` with a
  ``UNIQUE (zoom_level, tile_column, tile_row)`` constraint and a
  ``metadata (name, value)`` table carrying name / type / version /
  description / format / bounds / center / minzoom / maxzoom
  (mbtilesdataset.cpp:3023-3081, 1105-1203).
- ``tile_row`` is in the TMS scheme (south origin):
  ``tile_row = 2**z - 1 - y_xyz`` — the engine's ``ty`` column already
  uses this convention (grid.xyz_flip).
- Reads select per zoom level with a ``tile_row BETWEEN`` range
  (mbtilesdataset.cpp:1537-1540); ``tiles`` may be a plain table or the
  deduplicated ``map``+``images`` VIEW layout produced by mapbox tooling
  (both layouts are read here).

This is a from-spec reimplementation over Python's bundled sqlite3.

Scale posture: the WRITE funnels through the driver via
``toLocalIterator`` — inherent to a one-file deliverable, same as the
.gpkg/.fgb/.shp sinks (see BENCH/NOTES.md for the measured trade-off vs
the distributed sinks). The SCAN is distributed: the driver reads only
sqlite headers/aggregates to plan row ranges, then fans out ONE TASK PER
RANGE, each opening the file read-only — so a billion-tile pyramid is
read by many executors in parallel.
"""

from __future__ import annotations

import math
import os

import numpy as np

from ._util import local_path as _local

_FORMATS = {"png", "jpg", "jpeg", "webp", "pbf"}

SCAN_SCHEMA = "z int, tx long, ty long, y_xyz long, data binary"


def _bounds_lonlat(minx_m, miny_m, maxx_m, maxy_m):
    """Spherical-mercator meters -> lon/lat (gdal2tiles MetersToLatLon)."""
    from ..grid import ORIGIN_SHIFT

    def lon(mx):
        return mx / ORIGIN_SHIFT * 180.0

    def lat(my):
        d = my / ORIGIN_SHIFT * 180.0
        return (
            180.0
            / math.pi
            * (2.0 * math.atan(math.exp(d * math.pi / 180.0)) - math.pi / 2.0)
        )

    return lon(minx_m), lat(miny_m), lon(maxx_m), lat(maxy_m)


def write_mbtiles(
    tiles,
    path: str,
    fmt: str = "png",
    name: str | None = None,
    description: str = "",
    layer_type: str = "overlay",
    version: str = "1.1",
    overwrite: bool = False,
    data_col: str = "png",
) -> int:
    """Stream a tile DataFrame (columns ``z, tx, ty`` — ``ty`` TMS — and
    ``data_col`` with encoded tile bytes) into one ``.mbtiles`` file.

    Writes the spec's two tables exactly as the reference creates them
    (tiles with the UNIQUE triple constraint + metadata), computes
    bounds/center/minzoom/maxzoom from the tile set while streaming, and
    returns the tile count. Driver-funnel single-file sink by design.
    """
    import sqlite3

    from ..grid import MercatorGrid

    if fmt not in _FORMATS:
        raise ValueError(f"format {fmt!r} not in {sorted(_FORMATS)}")
    path = _local(path)
    if os.path.exists(path):
        if not overwrite:
            raise FileExistsError(path)
        os.remove(path)
    if name is None:
        name = os.path.splitext(os.path.basename(path))[0]
    g = MercatorGrid()
    con = sqlite3.connect(path)
    try:
        con.execute(
            "CREATE TABLE tiles ("
            "zoom_level INTEGER NOT NULL,"
            "tile_column INTEGER NOT NULL,"
            "tile_row INTEGER NOT NULL,"
            "tile_data BLOB NOT NULL,"
            "UNIQUE (zoom_level, tile_column, tile_row))"
        )
        con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        n = 0
        zmin = zmax = None
        env = None  # mercator-meters union of tile bounds
        batch = []
        for row in tiles.select("z", "tx", "ty", data_col).toLocalIterator():
            z, tx, ty = int(row[0]), int(row[1]), int(row[2])
            batch.append((z, tx, ty, bytes(row[3])))
            zmin = z if zmin is None else min(zmin, z)
            zmax = z if zmax is None else max(zmax, z)
            b = g.tile_bounds(tx, ty, z)
            env = (
                b
                if env is None
                else (
                    min(env[0], b[0]),
                    min(env[1], b[1]),
                    max(env[2], b[2]),
                    max(env[3], b[3]),
                )
            )
            if len(batch) >= 512:
                con.executemany("INSERT INTO tiles VALUES (?,?,?,?)", batch)
                n += len(batch)
                batch = []
        if batch:
            con.executemany("INSERT INTO tiles VALUES (?,?,?,?)", batch)
            n += len(batch)
        meta = [
            ("name", name),
            ("type", layer_type),
            ("version", version),
            ("description", description or name),
            ("format", fmt),
        ]
        if n:
            w, s, e, nn = _bounds_lonlat(*env)
            meta.append(("bounds", f"{w:.7f},{s:.7f},{e:.7f},{nn:.7f}"))
            meta.append(
                ("center", f"{(w + e) / 2:.7f},{(s + nn) / 2:.7f},{zmax}")
            )
            meta.append(("minzoom", str(zmin)))
            meta.append(("maxzoom", str(zmax)))
        con.executemany("INSERT INTO metadata VALUES (?,?)", meta)
        con.commit()
    finally:
        con.close()
    return n


def mbtiles_info(path: str) -> dict:
    """The metadata table as a dict (reference open path reads the same
    name/value pairs, mbtilesdataset.cpp:1352)."""
    import sqlite3

    con = sqlite3.connect(f"file:{_local(path)}?mode=ro", uri=True)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def scan_mbtiles(spark, path: str, num_partitions: int | None = None):
    """Distributed scan of one ``.mbtiles`` into
    ``(z, tx, ty<TMS>, y_xyz, data)`` rows.

    Planning happens driver-side from sqlite aggregates only (never tile
    bytes): if ``tiles`` is a real table the plan is rowid ranges (as the
    GeoPackage scan does); if it is the deduplicated map+images VIEW the
    plan is per-zoom ``tile_row`` bands — the same access shape the
    reference uses for its block reads (mbtilesdataset.cpp:1537-1540).
    One task per range; each task opens the file read-only.
    """
    import sqlite3

    path = _local(path)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        kind = con.execute(
            "SELECT type FROM sqlite_master WHERE name = 'tiles'"
        ).fetchone()
        if kind is None:
            raise ValueError(f"{path}: no tiles table/view")
        is_table = kind[0] == "table"
        if is_table:
            lo, hi, nrec = con.execute(
                "SELECT min(rowid), max(rowid), count(*) FROM tiles"
            ).fetchone()
        else:
            zspans = con.execute(
                "SELECT zoom_level, min(tile_row), max(tile_row), count(*) "
                "FROM tiles GROUP BY zoom_level ORDER BY zoom_level"
            ).fetchall()
            nrec = sum(r[3] for r in zspans)
    finally:
        con.close()

    if num_partitions is None:
        num_partitions = max(1, spark.sparkContext.defaultParallelism)
    num_partitions = max(1, min(num_partitions, max(1, nrec or 1)))

    if is_table:
        lo = lo or 0
        hi = hi if hi is not None else -1
        splits = np.linspace(lo, hi + 1, num_partitions + 1).astype(np.int64)
        ranges = [
            (-1, int(splits[p]), int(splits[p + 1]) - 1)
            for p in range(num_partitions)
            if splits[p] <= splits[p + 1] - 1
        ]
        where = "rowid BETWEEN {lo} AND {hi}"
    else:
        # per-zoom tile_row bands, task count proportional to zoom size
        ranges = []
        for z, rlo, rhi, cnt in zspans:
            k = max(1, round(num_partitions * cnt / max(1, nrec)))
            sp = np.linspace(rlo, rhi + 1, k + 1).astype(np.int64)
            ranges.extend(
                (int(z), int(sp[p]), int(sp[p + 1]) - 1)
                for p in range(k)
                if sp[p] <= sp[p + 1] - 1
            )
        where = "zoom_level = {z} AND tile_row BETWEEN {lo} AND {hi}"
    if not ranges:
        ranges = [(-1, 0, -1)]  # empty container -> one no-op task
    rng_df = spark.createDataFrame(
        ranges, "z int, lo bigint, hi bigint"
    ).repartition(len(ranges))

    def read_ranges(batches):
        import pandas as pd
        import sqlite3 as sq

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                c = sq.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    rows = c.execute(
                        "SELECT zoom_level, tile_column, tile_row, tile_data"
                        " FROM tiles WHERE "
                        + where.format(z=int(r.z), lo=int(r.lo), hi=int(r.hi))
                        + " ORDER BY zoom_level, tile_column, tile_row"
                    ).fetchall()
                finally:
                    c.close()
                yield pd.DataFrame(
                    {
                        "z": [int(q[0]) for q in rows],
                        "tx": [int(q[1]) for q in rows],
                        "ty": [int(q[2]) for q in rows],
                        "y_xyz": [
                            (1 << int(q[0])) - 1 - int(q[2]) for q in rows
                        ],
                        "data": [bytes(q[3]) for q in rows],
                    }
                )

    return rng_df.mapInPandas(read_ranges, schema=SCAN_SCHEMA)
