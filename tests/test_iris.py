"""IRIS radar driver tests (formats.iris).

Conformance quoted from autotest/gdrivers/iris.py on the checked-in
fixtures (provenance in tests/data/README.md): fakeiris.dat band-1
checksum 65532; iristest.dat checksum 52872 plus the quoted
Mercator geotransform at 1e-5 relative (Vincenty east/north walk
from the product center projected on the product ellipsoid — we
land within 7e-7).
"""

import os

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.iris import parse_iris, scan_iris

DATA = os.path.join(os.path.dirname(__file__), "data", "iris")


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


class TestIris:
    def test_fake_checksum(self):
        arr, gt, info = parse_iris(_read("fakeiris.dat"))
        assert gdal_checksum(arr) == 65532

    def test_real_checksum_and_gt(self):
        arr, gt, info = parse_iris(_read("iristest.dat"))
        assert arr.shape == (262, 260)
        assert gdal_checksum(arr) == 52872
        exp = [16435.721785269096, 1370.4263720754534, 0.0,
               5289830.4584420761, 0.0, -1357.6498705837876]
        for i in range(6):
            if exp[i] == 0.0:
                assert gt[i] == 0.0
            else:
                assert abs(gt[i] - exp[i]) / abs(exp[i]) <= 1e-5
        assert info["product_name"] == "CAPPI"
        assert info["units"] == "dBZ"
        assert info["projection"] == 1  # Mercator

    def test_scan(self, spark):
        from gdal_spark import codecs

        df = scan_iris(spark, os.path.join(DATA, "*.dat"))
        rows = {r.source: r for r in df.collect()}
        arr = codecs.decode_raw(bytes(rows["iristest.dat"].bytes))
        assert gdal_checksum(arr) == 52872
        assert rows["iristest.dat"].product == "CAPPI"
        assert rows["iristest.dat"].nodata == -9999.0
