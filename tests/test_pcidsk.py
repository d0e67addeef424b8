"""PCIDSK (.pix) driver tests (formats.pcidsk).

Conformance quoted from autotest/gdrivers/pcidsk.py on the
checked-in fixtures (provenance in tests/data/README.md):

- utm.pix: band checksum 39576, overview checksum 8368, and (via
  testCreateCopy(check_gt=1)) the byte.tif UTM geotransform
  (440720, 60, 0, 3751320, 0, -60);
- tile_v1.1.pix: checksum 49526 through the version-1 ASCII tile
  directory (SysBMDir + SysBData 8 KiB block chains), overview
  checksum 12003;
- tile_v2.pix: checksum 49526 through the version-2 binary tile
  directory (TileDir/TileData segments).

Reference semantics: frmts/pcidsk/sdk (the published PCIDSK
Database File Format specification).
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.pcidsk import (
    format_pcidsk,
    parse_pcidsk,
    pcidsk_overviews,
    scan_pcidsk,
    write_pcidsk,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "pcidsk")


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


class TestRead:
    def test_utm(self):
        bands, gt, geosys = parse_pcidsk(_read("utm.pix"))
        assert len(bands) == 1
        assert bands[0].shape == (7, 500)
        assert gdal_checksum(bands[0]) == 39576
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert geosys.startswith("UTM")

    @pytest.mark.parametrize("name", ["tile_v1.1.pix", "tile_v2.pix"])
    def test_tiled(self, name):
        bands, gt, geosys = parse_pcidsk(_read(name))
        assert bands[0].shape == (65, 65)
        assert gdal_checksum(bands[0]) == 49526
        assert gt == (428720.0, 30.0, 0.0, 3734400.0, 0.0, -30.0)

    def test_overviews(self):
        ovr = pcidsk_overviews(_read("utm.pix"))
        assert [gdal_checksum(a) for a in ovr] == [8368]
        ovr = pcidsk_overviews(_read("tile_v1.1.pix"))
        # layer 0 is the image itself, layer 1 its overview
        assert [gdal_checksum(a) for a in ovr] == [49526, 12003]
        assert ovr[1].shape == (32, 32)


class TestWrite:
    def test_roundtrip_multitype(self):
        rng = np.random.default_rng(7)
        b1 = rng.integers(0, 256, (37, 53), dtype=np.uint8)
        b2 = rng.random((37, 53)).astype(np.float32)
        b3 = rng.integers(-1000, 1000, (37, 53)).astype(np.int16)
        gt = (1000.0, 2.5, 0.0, 5000.0, 0.0, -2.5)
        buf = format_pcidsk([b1, b2, b3], gt, "UTM    17")
        bands, gt2, geosys = parse_pcidsk(buf)
        assert len(bands) == 3
        for a, b in zip((b1, b2, b3), bands):
            assert a.dtype == b.dtype
            assert np.array_equal(a, b)
        assert gt2 == gt
        assert geosys == "UTM    17"

    def test_blocks_are_512_aligned(self):
        buf = format_pcidsk([np.zeros((5, 7), np.uint8)])
        assert len(buf) % 512 == 0
        assert buf[:8] == b"PCIDSK  "


class TestScan:
    def test_scan_fixtures(self, spark):
        df = scan_pcidsk(spark, os.path.join(DATA, "*.pix"))
        rows = {r.source: r for r in df.collect()}
        assert len(rows) == 3
        u = rows["utm.pix"]
        assert (u.w, u.h) == (500, 7)
        assert (u.gt0, u.gt1, u.gt3, u.gt5) == (440720.0, 60.0,
                                                3751320.0, -60.0)
        from gdal_spark import codecs
        arr = codecs.decode_raw(bytes(rows["tile_v2.pix"].bytes))
        assert gdal_checksum(arr) == 49526

    def test_write_scan_roundtrip(self, spark, tmp_path):
        import pandas as pd

        rng = np.random.default_rng(3)
        arrs = {f"img{i}": rng.integers(0, 256, (16, 20),
                                        dtype=np.uint8)
                for i in range(3)}
        from gdal_spark import codecs
        pdf = pd.DataFrame([
            {"image_id": k, "bytes": codecs.encode_raw(v),
             "gt0": 10.0 * i, "gt1": 1.0, "gt2": 0.0,
             "gt3": 100.0, "gt4": 0.0, "gt5": -1.0}
            for i, (k, v) in enumerate(sorted(arrs.items()))])
        df = spark.createDataFrame(pdf)
        out = write_pcidsk(df, str(tmp_path))
        assert len(out) == 3
        back = scan_pcidsk(spark, str(tmp_path) + "/*.pix")
        for r in back.collect():
            key = r.source[:-4]
            arr = codecs.decode_raw(bytes(r.bytes))
            assert np.array_equal(arr, arrs[key])
