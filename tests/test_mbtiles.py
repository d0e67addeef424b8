"""MBTiles driver tests: spec-table write (UNIQUE triple, metadata keys,
TMS row convention), distributed range-planned scan, the deduplicated
map+images VIEW layout, partition invariance, and a tile_pyramid
round-trip checksum parity."""

import os
import sqlite3

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import mbtiles_info, scan_mbtiles, write_mbtiles

TILE_COLS = "z int, tx long, ty long, png binary"


def _tiles_df(spark):
    """Six distinct tiles across z1/z2 (ty in TMS)."""
    rows = []
    cells = [(1, 0, 0), (1, 1, 0), (1, 0, 1), (2, 0, 3), (2, 3, 0), (2, 2, 2)]
    for i, (z, tx, ty) in enumerate(cells):
        arr = np.full((8, 8), 10 * i + 1, dtype=np.uint8)
        arr[0, 0] = 255 - i
        rows.append((z, tx, ty, codecs.encode_png(arr)))
    return spark.createDataFrame(rows, TILE_COLS).repartition(3), {
        (z, tx, ty): i for i, (z, tx, ty) in enumerate(cells)
    }


class TestWriteScan:
    def test_roundtrip(self, spark, tmp_path):
        df, idx = _tiles_df(spark)
        p = str(tmp_path / "t.mbtiles")
        n = write_mbtiles(df, p)
        assert n == 6
        out = scan_mbtiles(spark, p, num_partitions=3).collect()
        assert len(out) == 6
        for r in out:
            i = idx[(r.z, r.tx, r.ty)]
            assert r.y_xyz == (1 << r.z) - 1 - r.ty
            arr = codecs.decode_png(bytes(r.data))
            assert arr[1, 1] == 10 * i + 1 and arr[0, 0] == 255 - i

    def test_schema_and_metadata(self, spark, tmp_path):
        df, _ = _tiles_df(spark)
        p = str(tmp_path / "m.mbtiles")
        write_mbtiles(df, p, name="demo", description="d", fmt="png")
        con = sqlite3.connect(p)
        ddl = con.execute(
            "SELECT sql FROM sqlite_master WHERE name='tiles'"
        ).fetchone()[0]
        assert "UNIQUE (zoom_level, tile_column, tile_row)" in ddl
        with pytest.raises(sqlite3.IntegrityError):
            con.execute(
                "INSERT INTO tiles VALUES (1, 0, 0, x'00')"
            )
        con.close()
        meta = mbtiles_info(p)
        assert meta["name"] == "demo"
        assert meta["format"] == "png"
        assert (meta["minzoom"], meta["maxzoom"]) == ("1", "2")
        w, s, e, n_ = (float(v) for v in meta["bounds"].split(","))
        assert -180.01 <= w < e <= 180.01 and -85.1 <= s < n_ <= 85.1
        # z1 tiles cover the west hemisphere + y halves -> bounds reach 0
        assert abs(w - (-180.0)) < 1e-6 and abs(n_ - 85.0511287798066) < 1e-6

    def test_overwrite_semantics(self, spark, tmp_path):
        df, _ = _tiles_df(spark)
        p = str(tmp_path / "o.mbtiles")
        write_mbtiles(df, p)
        with pytest.raises(FileExistsError):
            write_mbtiles(df, p)
        assert write_mbtiles(df.limit(2), p, overwrite=True) == 2
        assert scan_mbtiles(spark, p).count() == 2

    def test_bad_format_rejected(self, spark, tmp_path):
        df, _ = _tiles_df(spark)
        with pytest.raises(ValueError, match="format"):
            write_mbtiles(df, str(tmp_path / "x.mbtiles"), fmt="gif")

    def test_partition_invariance(self, spark, tmp_path):
        df, _ = _tiles_df(spark)
        p = str(tmp_path / "p.mbtiles")
        write_mbtiles(df, p)
        a = sorted(
            (r.z, r.tx, r.ty, bytes(r.data))
            for r in scan_mbtiles(spark, p, num_partitions=1).collect()
        )
        b = sorted(
            (r.z, r.tx, r.ty, bytes(r.data))
            for r in scan_mbtiles(spark, p, num_partitions=5).collect()
        )
        assert a == b

    def test_empty(self, spark, tmp_path):
        df = spark.createDataFrame([], TILE_COLS)
        p = str(tmp_path / "e.mbtiles")
        assert write_mbtiles(df, p) == 0
        assert "minzoom" not in mbtiles_info(p)
        assert scan_mbtiles(spark, p).count() == 0


class TestViewLayout:
    def test_map_images_dedup(self, spark, tmp_path):
        """The mapbox dedup layout: tiles is a VIEW over map+images;
        two map rows share one blob. The scan must read it identically
        (per-zoom row-band planning path)."""
        p = str(tmp_path / "v.mbtiles")
        con = sqlite3.connect(p)
        con.execute(
            "CREATE TABLE map (zoom_level INTEGER, tile_column INTEGER, "
            "tile_row INTEGER, tile_id TEXT)"
        )
        con.execute("CREATE TABLE images (tile_data BLOB, tile_id TEXT)")
        con.execute(
            "CREATE VIEW tiles AS SELECT map.zoom_level, map.tile_column, "
            "map.tile_row, images.tile_data FROM map JOIN images "
            "ON map.tile_id = images.tile_id"
        )
        blob_a = codecs.encode_png(np.full((4, 4), 7, np.uint8))
        blob_b = codecs.encode_png(np.full((4, 4), 9, np.uint8))
        con.execute("INSERT INTO images VALUES (?, 'a')", (blob_a,))
        con.execute("INSERT INTO images VALUES (?, 'b')", (blob_b,))
        con.executemany(
            "INSERT INTO map VALUES (?,?,?,?)",
            [(0, 0, 0, "a"), (1, 0, 0, "a"), (1, 1, 1, "b")],
        )
        con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        con.execute("INSERT INTO metadata VALUES ('format', 'png')")
        con.commit()
        con.close()
        out = sorted(
            (r.z, r.tx, r.ty, bytes(r.data))
            for r in scan_mbtiles(spark, p, num_partitions=4).collect()
        )
        assert [(z, tx, ty) for z, tx, ty, _ in out] == [
            (0, 0, 0), (1, 0, 0), (1, 1, 1)]
        assert out[0][3] == out[1][3] == bytes(blob_a)
        assert out[2][3] == bytes(blob_b)

    def test_missing_tiles_rejected(self, spark, tmp_path):
        p = str(tmp_path / "bad.mbtiles")
        sqlite3.connect(p).close()
        with pytest.raises(ValueError, match="tiles"):
            scan_mbtiles(spark, p)


class TestPyramidRoundtrip:
    def test_checksum_parity(self, spark, tmp_path):
        """tile_pyramid z0-1 -> write_mbtiles -> scan_mbtiles preserves
        the exact tile set and pixel bytes (GDAL checksums equal)."""
        from gdal_spark import fixtures
        from gdal_spark.operators.tile import tile_pyramid

        world = fixtures.images_df(spark, 1, tier="t2", partitions=1)
        tiles = tile_pyramid(world, 0, 1, resampling="bilinear",
                             persist=False)
        want = {
            (r.z, r.tx, r.ty): (r.y_xyz, r.checksum)
            for r in tiles.select("z", "tx", "ty", "y_xyz",
                                  "checksum").collect()
        }
        p = str(tmp_path / "world.mbtiles")
        n = write_mbtiles(tiles, p, name="world")
        assert n == len(want)
        got = scan_mbtiles(spark, p, num_partitions=3).collect()
        assert len(got) == len(want)
        for r in got:
            y_xyz, cs = want[(r.z, r.tx, r.ty)]
            assert r.y_xyz == y_xyz
            band0 = np.atleast_3d(codecs.decode_png(bytes(r.data)))[:, :, 0]
            assert gdal_checksum(band0) == cs
