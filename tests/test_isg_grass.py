"""GRASS ASCII grid + ISG geoid grid conformance + roundtrip tests.

Both drivers live beside AAIGrid in the reference
(frmts/aaigrid/aaigriddataset.cpp: GRASSASCIIDataset :626,
ISGDataset :732). Conformance fixtures are byte-identical GDAL
autotest DATA files; expected values are the reference's own autotest
expectations (grassasciigrid.py, isg.py):

- grassascii.txt: checksum 212, gt (-100, 62.5, 0, 250, 0,
  -41.666...) — NON-square cells derived from the extent.
- test.isg: checksum 159, gt (120, 0.25, 0, 41, 0, -0.25).
- approx_georeferencing_auto_corrected.isg: the GEOIDEAR16 header —
  the 0.0167 literal retry snaps to cell-center multiples of
  0.016667 with NO warning (gt0 = -76.0098535).
- approx_georeferencing_warning.isg: modified delta_lon — accepted
  approximately (delta = extent/n) WITH the warning flag.
- approx_georeferencing_rejected_by_default.isg: rejected unless
  skip_consistency_check (the ISG_SKIP_GEOREF_CONSISTENCY_CHECK
  analog).
- header_larger_than_1024bytes.isg: ISG 2.0 half-cell expansion
  (gt (12.99375, 0.0125, 0, 47.004166..., 0, -0.008333...)).
- header_dms.isg: dms coord units through the reference's APPROXIMATE
  minute/second multipliers, EPSG code 6668
  (gt (119.9875, 0.025, 0, 50.008333..., 0, -0.016666...)).
"""

import hashlib
import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.aaigrid import (
    format_grassascii,
    format_isg,
    parse_grassascii,
    parse_isg,
    parse_isg_header,
)

DATA = os.path.join(os.path.dirname(__file__), "data")

MD5 = {
    "grassascii.txt": "c2a80573752c5d043880dea3ba922238",
    "isg/test.isg": "695d824b31f33dce717591b4ddc9c9ba",
    "isg/approx_georeferencing_auto_corrected.isg":
        "920abd54ebb4ecd9bedafc61218b36b2",
    "isg/approx_georeferencing_rejected_by_default.isg":
        "c49e56efc35fadddb76d6102ff0328b5",
    "isg/approx_georeferencing_warning.isg":
        "d9ef009399a0b763454fc0ab9d3a2d51",
    "isg/header_dms.isg": "aff520082b1edb944b12f5994391d0ba",
    "isg/header_larger_than_1024bytes.isg":
        "6b0b780f73ce48b9a48fdb39bdcc26cd",
}


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def test_fixture_provenance():
    for name, md5 in MD5.items():
        assert hashlib.md5(_read(name)).hexdigest() == md5, name


class TestGrass:
    def test_conformance(self):
        arr, gt, nd = parse_grassascii(
            _read("grassascii.txt").decode("ascii")
        )
        np.testing.assert_allclose(
            gt, (-100.0, 62.5, 0.0, 250.0, 0.0, -41.666666666666664)
        )
        assert nd is None or nd == -9999
        # autotest checksum is over the raw values (nodata kept)
        raw = np.where(np.isnan(arr), -9999, arr)
        assert gdal_checksum(raw) == 212

    def test_null_and_type(self):
        text = ("north: 2\nsouth: 0\neast: 3\nwest: 0\n"
                "rows: 2\ncols: 3\nnull: -1\ntype: float\n"
                "1 2 -1\n4 5 6\n")
        arr, gt, nd = parse_grassascii(text)
        assert nd == -1.0
        assert np.isnan(arr[0, 2]) and arr[1, 0] == 4
        assert gt == (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)

    def test_format_roundtrip(self):
        text = ("north: 10\nsouth: 0\neast: 20\nwest: 0\n"
                "rows: 2\ncols: 4\nnull: -9\n"
                "1 2 3 -9\n5 6 7 8\n")
        arr, gt, nd = parse_grassascii(text)
        arr2, gt2, nd2 = parse_grassascii(format_grassascii(arr, gt, nd))
        np.testing.assert_allclose(gt2, gt)
        np.testing.assert_array_equal(
            np.isnan(arr), np.isnan(arr2)
        )
        np.testing.assert_allclose(
            np.nan_to_num(arr), np.nan_to_num(arr2)
        )


class TestISG:
    def test_conformance(self):
        arr, gt, nd, srid = parse_isg(
            _read("isg/test.isg").decode("utf-8")
        )
        np.testing.assert_allclose(gt, (120.0, 0.25, 0.0, 41.0, 0.0,
                                        -0.25))
        raw = np.where(np.isnan(arr), nd, arr)
        assert gdal_checksum(raw) == 159
        assert srid == 4326

    def test_auto_corrected(self):
        h = parse_isg_header(
            _read("isg/approx_georeferencing_auto_corrected.isg")
            .decode("utf-8")
        )
        np.testing.assert_allclose(
            h["gt"],
            (-76.0098535, 0.016667, 0.0, -20.0087335, 0.0, -0.016667),
            rtol=1e-8,
        )
        assert not h["approx"]

    def test_warning(self):
        h = parse_isg_header(
            _read("isg/approx_georeferencing_warning.isg")
            .decode("utf-8")
        )
        np.testing.assert_allclose(
            h["gt"],
            (-76.0083, 0.01666694444444445, 0.0, -20.0083, 0.0,
             -0.016667027027027027),
            rtol=1e-8,
        )
        assert h["approx"]

    def test_rejected_by_default(self):
        raw = _read(
            "isg/approx_georeferencing_rejected_by_default.isg"
        ).decode("utf-8")
        with pytest.raises(ValueError, match="skip_consistency_check"):
            parse_isg_header(raw)
        h = parse_isg_header(raw, skip_consistency_check=True)
        np.testing.assert_allclose(
            h["gt"][1], 0.01666694444444445, rtol=1e-8
        )

    def test_header_larger_than_1024(self):
        h = parse_isg_header(
            _read("isg/header_larger_than_1024bytes.isg")
            .decode("utf-8")
        )
        np.testing.assert_allclose(
            h["gt"],
            (12.99375, 0.0125, 0.0, 47.00416666666666, 0.0,
             -0.008333333333333333),
            rtol=1e-8,
        )

    def test_dms(self):
        h = parse_isg_header(
            _read("isg/header_dms.isg").decode("utf-8")
        )
        np.testing.assert_allclose(
            h["gt"],
            (119.9875, 0.025, 0.0, 50.0083333333, 0.0,
             -0.01666666666),
            rtol=1e-8,
        )
        assert h["srid"] == 6668

    def test_rejections(self):
        base = (
            "begin_of_head =\nlat min = 0\nlat max = 1\nlon min = 0\n"
            "lon max = 1\ndelta lat = 0.5\ndelta lon = 0.5\n"
            "nrows = 2\nncols = 2\n{extra}end_of_head =\n1 2\n3 4\n"
        )
        for extra, msg in (
            ("data format : sparse\n", "data format"),
            ("data ordering : S-to-N, W-to-E\n", "data ordering"),
            ("coord type : projected\n", "coord type"),
            ("coord units : feet\n", "coord units"),
        ):
            with pytest.raises(ValueError, match=msg):
                parse_isg_header(base.format(extra=extra))

    def test_format_roundtrip(self):
        arr = np.array([[1.5, np.nan], [3.25, 4.0]])
        gt = (10.0, 0.5, 0.0, 20.0, 0.0, -0.25)
        text = format_isg(arr, gt, nodata=-9999.0)
        arr2, gt2, nd2, srid = parse_isg(text)
        np.testing.assert_allclose(gt2, gt)
        assert np.isnan(arr2[0, 1]) and arr2[1, 0] == 3.25


class TestSpark:
    def test_scan_grass(self, spark):
        from gdal_spark.formats import scan_grassascii

        df = scan_grassascii(
            spark, os.path.join(DATA, "grassascii.txt")
        )
        r = df.collect()[0]
        assert (r["w"], r["h"]) == (4, 6)
        assert r["gt1"] == 62.5

    def test_scan_isg(self, spark):
        from gdal_spark.formats import scan_isg

        df = scan_isg(spark, os.path.join(DATA, "isg", "test.isg"))
        r = df.collect()[0]
        assert (r["w"], r["h"]) == (6, 4)
        assert r["gt0"] == 120.0 and r["srid"] == 4326

    def test_roundtrip_both(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import (
            scan_grassascii, scan_isg, write_grassascii, write_isg,
        )

        arrs = [
            (50.0 * k + np.arange(12, dtype=np.float64)).reshape(3, 4)
            for k in range(4)
        ]
        rows = [
            (f"g{k}", bytearray(codecs.encode_raw(a)), 4, 3, "raw",
             10.0 + k, 0.5, 0.0, 40.0, 0.0, -0.25, 4326, -9999.0)
            for k, a in enumerate(arrs)
        ]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(2)
        d1 = str(tmp_path / "grass")
        write_grassascii(src, d1)
        back = {r["image_id"]: r for r in
                scan_grassascii(spark, d1 + "/*.txt").collect()}
        assert len(back) == 4
        a0 = codecs.decode_image(bytes(back["g0"]["bytes"]), "raw")
        np.testing.assert_allclose(np.squeeze(a0), arrs[0])
        assert back["g2"]["gt0"] == 12.0

        d2 = str(tmp_path / "isg")
        write_isg(src, d2)
        back = {r["image_id"]: r for r in
                scan_isg(spark, d2 + "/*.isg").collect()}
        assert len(back) == 4
        a1 = codecs.decode_image(bytes(back["g1"]["bytes"]), "raw")
        np.testing.assert_allclose(np.squeeze(a1), arrs[1])
        assert back["g3"]["gt3"] == 40.0
