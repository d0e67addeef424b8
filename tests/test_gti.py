"""GTI (GDAL Raster Tile Index) tests (formats.gti).

Conformance per autotest/gdrivers/gti.py's contract on the
checked-in fixtures: the composed mosaic places every referenced
tile's pixels byte-identically at its own georeferenced window
(the reference asserts VRT equality per band); both tiles at
checksum 29783, union grid (512x256x3) with the south tile below
the north one.
"""

import os

import numpy as np

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.gti import gti_locations, read_gti, scan_gti
from gdal_spark.formats.gtiff import parse_gtiff

DATA = os.path.join(os.path.dirname(__file__), "data", "gti")
INDEX = os.path.join(DATA, "tile-001.gti.gpkg")


class TestGti:
    def test_locations(self):
        locs = gti_locations(INDEX)
        assert [os.path.basename(p) for p in locs] == [
            "tile-001-000.tif", "tile-001-001.tif"]

    def test_mosaic_contract(self):
        arr, gt, paths = read_gti(INDEX)
        assert arr.shape == (512, 256, 3)
        for p in paths:
            with open(p, "rb") as f:
                t, tg, _, _ = parse_gtiff(f.read())
            x0 = int(round((tg[0] - gt[0]) / gt[1]))
            y0 = int(round((gt[3] - tg[3]) / -gt[5]))
            sub = arr[y0:y0 + t.shape[0], x0:x0 + t.shape[1]]
            assert np.array_equal(sub, t)
            assert gdal_checksum(t[:, :, 0]) == 29783

    def test_scan(self, spark):
        from gdal_spark import codecs

        df = scan_gti(spark, INDEX)
        rows = df.collect()
        assert len(rows) == 2
        for r in rows:
            a = codecs.decode_raw(bytes(r.bytes))
            assert gdal_checksum(a[:, :, 0]) == 29783
