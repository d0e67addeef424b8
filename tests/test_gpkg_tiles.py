"""GeoPackage raster tile pyramid tests.

Conformance: autotest byte.gpkg (one 256x256 grey+alpha PNG tile on
a custom EPSG:26711 matrix; its gpkg_contents window holds the
byte.tif ramp at checksum 4672). Semantics: OGC 12-128r19 §2.2
(reference driver ogr/ogrsf_frmts/gpkg/ tile side). Unlike MBTiles,
tile_row is top-down. Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.geopackage import (
    gpkg_raster_info,
    scan_geopackage_tiles,
    write_geopackage_tiles,
)

DATA = os.path.join(os.path.dirname(__file__), "data")
BYTE = os.path.join(DATA, "gpkg", "byte.gpkg")


class TestConformance:
    def test_info(self):
        info = gpkg_raster_info(BYTE)
        assert info["table"] == "byte"
        assert info["srs_id"] == 26711
        assert info["set_bounds"] == (440720.0, 3735960.0,
                                      456080.0, 3751320.0)
        assert info["content_bounds"] == (440720.0, 3750120.0,
                                          441920.0, 3751320.0)
        m = info["matrices"][0]
        assert (m["tile_width"], m["pixel_x_size"]) == (256, 60.0)

    def test_scan_content_checksum(self, spark):
        rows = scan_geopackage_tiles(spark, BYTE).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.image_id, r.w, r.h) == ("byte/z0/0/0", 256, 256)
        # tile anchored at the matrix-SET top-left
        assert (r.gt0, r.gt3, r.gt1, r.gt5) == (
            440720.0, 3751320.0, 60.0, -60.0)
        assert r.srid == 26711
        arr = codecs.decode_image(bytes(r.bytes), "raw")
        band = arr if arr.ndim == 2 else arr[:, :, 0]
        # content window = top-left 20x20 of the tile = byte.tif
        assert gdal_checksum(band[:20, :20]) == 4672


class TestRoundTrip:
    def _tiles(self, spark, z=2, n=2):
        rng = np.random.default_rng(3)
        data = {}
        rows = []
        for tx in range(n):
            for ty in range(n):
                arr = rng.integers(0, 255, (256, 256)).astype(np.uint8)
                data[(tx, ty)] = arr
                rows.append((z, tx, ty,
                             bytearray(codecs.encode_png(arr))))
        return data, spark.createDataFrame(
            rows, "z int, tx int, ty int, png binary")

    def test_write_scan(self, spark, tmp_path):
        data, tdf = self._tiles(spark)
        path = str(tmp_path / "t.gpkg")
        assert write_geopackage_tiles(tdf, path, table="cover") == 4
        info = gpkg_raster_info(path)
        assert info["srs_id"] == 3857
        assert 2 in info["matrices"]
        back = scan_geopackage_tiles(spark, path)
        rows = {r.image_id: r for r in back.collect()}
        assert len(rows) == 4
        for (tx, ty), arr in data.items():
            row_td = (1 << 2) - 1 - ty  # spec top-down row
            r = rows[f"cover/z2/{tx}/{row_td}"]
            got = codecs.decode_image(bytes(r.bytes), "raw")
            band = got if got.ndim == 2 else got[:, :, 0]
            assert np.array_equal(band, arr)
            assert r.srid == 3857

    def test_mandatory_tables(self, spark, tmp_path):
        _, tdf = self._tiles(spark)
        path = str(tmp_path / "t2.gpkg")
        write_geopackage_tiles(tdf, path)
        import sqlite3
        con = sqlite3.connect(path)
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        for required in ("gpkg_spatial_ref_sys", "gpkg_contents",
                         "gpkg_tile_matrix_set", "gpkg_tile_matrix",
                         "tiles"):
            assert required in names
        dt, srs = con.execute(
            "SELECT data_type, srs_id FROM gpkg_contents").fetchone()
        assert (dt, srs) == ("tiles", 3857)
        appid = con.execute("PRAGMA application_id").fetchone()[0]
        assert appid == 0x47504B47
        con.close()

    def test_bad_zoom_raises(self, spark, tmp_path):
        _, tdf = self._tiles(spark)
        path = str(tmp_path / "t3.gpkg")
        write_geopackage_tiles(tdf, path)
        with pytest.raises(ValueError, match="no tiles at zoom"):
            scan_geopackage_tiles(spark, path, zoom=5).collect()
