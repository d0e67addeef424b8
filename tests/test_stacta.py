"""STACTA driver tests (formats.stacta).

Conformance per autotest/gdrivers/stacta.py on the checked-in
fixtures (provenance in tests/data/README.md): 2048x1024x3 at the
quoted geotransform (-180, 0.17578125, 0, 90, 0, -0.17578125) with
nodata 0.0 from the tile metadata; the composed raster equals the
reference's own VRT-of-tiles contract byte-for-byte; the east-
hemisphere item anchors at longitude 0.
"""

import os

import numpy as np
import pytest

from gdal_spark.formats.gtiff import parse_gtiff
from gdal_spark.formats.stacta import read_stacta, scan_stacta

DATA = os.path.join(os.path.dirname(__file__), "data", "stacta")


class TestStacta:
    def test_mosaic_contract(self):
        arr, gt, info = read_stacta(os.path.join(DATA, "test.json"))
        assert arr.shape == (1024, 2048, 3)
        assert info["nodata"] == 0.0
        assert info["levels"] == ["0", "1", "2"]
        exp = [-180.0, 0.17578125, 0.0, 90.0, 0.0, -0.17578125]
        assert max(abs(a - b) for a, b in zip(gt, exp)) < 1e-12
        with open(os.path.join(DATA, "WorldCRS84Quad", "2", "0",
                               "0.tif"), "rb") as f:
            t0 = parse_gtiff(f.read())[0]
        with open(os.path.join(DATA, "WorldCRS84Quad", "2", "0",
                               "1.tif"), "rb") as f:
            t1 = parse_gtiff(f.read())[0]
        ref = np.concatenate([t0, t1], axis=1)
        assert np.array_equal(arr, ref)

    def test_overview_level(self):
        arr, gt, info = read_stacta(os.path.join(DATA, "test.json"),
                                    level="1")
        assert arr.shape == (512, 1024, 3)
        assert gt[1] == pytest.approx(0.3515625)

    def test_east_hemisphere(self):
        arr, gt, info = read_stacta(
            os.path.join(DATA, "test_east_hemisphere.json"))
        assert gt[0] == pytest.approx(0.0)
        assert gt[1] == pytest.approx(0.17578125)

    def test_scan_one_task_per_tile(self, spark):
        from gdal_spark import codecs

        df = scan_stacta(spark, os.path.join(DATA, "test.json"))
        rows = sorted(df.collect(), key=lambda r: r.image_id)
        assert [r.image_id for r in rows] == ["2/0/0", "2/0/1"]
        assert rows[0].gt0 == pytest.approx(-180.0)
        assert rows[1].gt0 == pytest.approx(0.0)
        a = codecs.decode_raw(bytes(rows[0].bytes))
        assert a.shape == (1024, 1024, 3)
