"""HFA (ERDAS Imagine .img) driver tests — conformance on real
ERDAS-written autotest DATA files (byte-identical copies, see
tests/data/README.md); expected values quoted from
autotest/gdrivers/hfa.py."""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import hfa as H

DATA = os.path.join(os.path.dirname(__file__), "data")


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


class TestConformance:
    def test_int_img(self):
        # test_hfa_int_read: checksum 6691 (RLE-compressed blocks);
        # test_hfa_int_stats_*: the quoted statistics
        arr, gt, _srid, nd, stats = H.parse_hfa(_read("int.img"))
        assert arr.shape == (201, 201) and arr.dtype == np.int32
        assert gdal_checksum(arr) == 6691
        assert nd is None
        assert stats["minimum"] == 40918.0
        assert stats["maximum"] == 41134.0
        assert stats["median"] == 41017.0
        assert stats["mode"] == 41013.0
        assert stats["mean"] == pytest.approx(41019.784218148, abs=1e-4)
        assert stats["stddev"] == pytest.approx(44.637237445468, abs=1e-4)

    def test_float_img(self):
        # test_hfa_float_read: checksum 23529, pixel (100,100) =
        # 41.021659851074219; test_hfa_float_stats_*
        arr, gt, _s, _n, stats = H.parse_hfa(_read("float.img"))
        assert arr.dtype == np.float32
        assert gdal_checksum(arr) == 23529
        assert arr[100, 100] == pytest.approx(41.021659851074219,
                                              abs=1e-4)
        assert stats["minimum"] == pytest.approx(40.91858291626,
                                                 abs=1e-4)
        assert stats["maximum"] == pytest.approx(41.134323120117,
                                                 abs=1e-4)
        assert stats["mean"] == pytest.approx(41.020284249223, abs=1e-4)
        assert stats["stddev"] == pytest.approx(0.044636441749041,
                                                abs=1e-4)

    def test_both_share_the_mapinfo_georef(self):
        a = H.parse_hfa(_read("int.img"))
        b = H.parse_hfa(_read("float.img"))
        assert a[1] == b[1] == (135362.5, 100.0, 0.0,
                                7122712.5, 0.0, -100.0)

    def test_not_hfa_rejected(self):
        with pytest.raises(ValueError, match="EHFA_HEADER_TAG"):
            H.parse_hfa(b"II*\x00" + b"\x00" * 100)


class TestDictionary:
    def test_parse_canonical_defs(self):
        types = H.parse_dictionary(H._W_DICT[:-1])
        lay = {f["name"]: f for f in types["Eimg_Layer"]}
        assert lay["pixelType"]["item"] == "e"
        assert lay["pixelType"]["enum"][9] == "f32"
        dms = {f["name"]: f for f in types["Edms_State"]}
        assert dms["blockinfo"]["pointer"] == "p"
        assert dms["blockinfo"]["obj"] == "Edms_VirtualBlockInfo"

    def test_enum_with_spaces_and_embedded_objects(self):
        types = H.parse_dictionary(H._W_DICT[:-1])
        lt = {f["name"]: f for f in types["Eimg_Layer"]}["layerType"]
        assert lt["enum"] == ["thematic", "athematic",
                              "fft of real-valued data"]
        mi = {f["name"]: f for f in types["Eprj_MapInfo"]}
        assert mi["upperLeftCenter"]["pointer"] == "*"
        assert mi["upperLeftCenter"]["obj"] == "Eprj_Coordinate"


class TestWriteRead:
    @pytest.mark.parametrize("dt", [np.uint8, np.int16, np.uint16,
                                    np.int32, np.float32, np.float64])
    def test_roundtrip_dtypes(self, dt):
        rng = np.random.default_rng(5)
        a = (rng.random((70, 130)) * 200).astype(dt)
        gt = (100.0, 0.5, 0.0, 900.0, 0.0, -0.5)
        b, g2, _s, _n, _st = H.parse_hfa(H.format_hfa(a, gt))
        assert np.array_equal(a, b) and g2 == gt

    def test_multiblock_edges(self):
        # 64x64 blocks with ragged edges in both directions
        a = np.arange(100 * 70, dtype=np.uint16).reshape(100, 70)
        b = H.parse_hfa(H.format_hfa(a, (0, 1, 0, 100, 0, -1)))[0]
        assert np.array_equal(a, b)


class TestSpark:
    def test_scan_fixtures(self, spark):
        rows = {r.image_id: r
                for r in H.scan_hfa(
                    spark, os.path.join(DATA, "*.img")).collect()}
        a = codecs.decode_image(bytes(rows["int"].bytes),
                                rows["int"].fmt)
        assert gdal_checksum(a.astype(np.int32)) == 6691
        f = codecs.decode_image(bytes(rows["float"].bytes),
                                rows["float"].fmt)
        assert gdal_checksum(f.astype(np.float32)) == 23529
        assert rows["int"].gt0 == 135362.5

    def test_sink_scan_roundtrip(self, spark, tmp_path):
        rows = [
            (f"t{k}", codecs.encode_raw(
                (np.arange(24, dtype=np.int32) + 100 * k).reshape(4, 6)),
             6, 4, "raw", float(k), 1.0, 0.0, 50.0, 0.0, -1.0, 0, None)
            for k in range(5)
        ]
        df = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(3)
        H.write_hfa(df, str(tmp_path))
        back = {r.image_id: r
                for r in H.scan_hfa(
                    spark, str(tmp_path / "*.img")).collect()}
        assert len(back) == 5
        for k in range(5):
            a = codecs.decode_image(bytes(back[f"t{k}"].bytes), "raw")
            assert np.array_equal(
                a, (np.arange(24, dtype=np.int32) + 100 * k)
                .reshape(4, 6))
            assert back[f"t{k}"].gt0 == float(k)
