"""SAGA GIS binary grid driver tests.

Conformance quoted from autotest/gdrivers/saga.py test_saga_1:
4byteFloat.sdat opens with checksum 108 and the NAD27 UTM 11N .prj
(EPSG:26711 via the engine's parameter-match WKT1 path). Semantics:
frmts/saga/sagadataset.cpp (bottom-up rows, cell-center
POSITION_XMIN/YMIN, TOPTOBOTTOM/Z_FACTOR rejections). Fixture
provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import saga as S

DATA = os.path.join(os.path.dirname(__file__), "data")


def _fixture():
    with open(os.path.join(DATA, "4byteFloat.sgrd")) as f:
        hdr = S.parse_sgrd(f.read())
    with open(os.path.join(DATA, "4byteFloat.sdat"), "rb") as f:
        return S.decode_saga(f.read(), hdr)


class TestConformance:
    def test_4byte_float(self):
        arr, gt, nodata = _fixture()
        assert arr.shape == (10, 10) and arr.dtype == np.float32
        assert gdal_checksum(arr) == 108
        # POSITION_* are cell centers: 333.3-5, 555.5+95
        assert gt == pytest.approx(
            (328.3, 10.0, 0.0, 650.5, 0.0, -10.0), abs=1e-9)
        assert nodata == -99999.0

    def test_prj_srid(self):
        from gdal_spark.formats.ehdr import _srid_from_prj

        assert _srid_from_prj(
            os.path.join(DATA, "4byteFloat.sdat")) == 26711

    def test_bottom_up(self):
        # first stored value is the SW cell
        with open(os.path.join(DATA, "4byteFloat.sdat"), "rb") as f:
            first = np.frombuffer(f.read(4), "<f4")[0]
        arr, _, _ = _fixture()
        assert arr[-1, 0] == first


class TestRejections:
    def test_toptobottom(self):
        hdr = S.parse_sgrd("DATAFORMAT\t= FLOAT\nCELLCOUNT_X\t= 2\n"
                           "CELLCOUNT_Y\t= 2\nCELLSIZE\t= 1\n"
                           "TOPTOBOTTOM\t= TRUE\n")
        with pytest.raises(ValueError, match="TOPTOBOTTOM"):
            S.decode_saga(b"\x00" * 16, hdr)

    def test_z_factor(self):
        hdr = S.parse_sgrd("DATAFORMAT\t= FLOAT\nCELLCOUNT_X\t= 2\n"
                           "CELLCOUNT_Y\t= 2\nCELLSIZE\t= 1\n"
                           "Z_FACTOR\t= 2.0\n")
        with pytest.raises(ValueError, match="Z_FACTOR"):
            S.decode_saga(b"\x00" * 16, hdr)

    def test_unknown_format(self):
        with pytest.raises(ValueError, match="DATAFORMAT"):
            S.decode_saga(b"", S.parse_sgrd("DATAFORMAT\t= WEIRD\n"))

    def test_non_square_cells(self):
        with pytest.raises(ValueError, match="square"):
            S.format_saga(np.zeros((2, 2), np.float32),
                          (0, 1, 0, 2, 0, -2))


class TestRoundTrip:
    GT = (100.0, 2.5, 0.0, 50.0, 0.0, -2.5)

    @pytest.mark.parametrize("dtype", [
        np.uint8, np.int16, np.uint16, np.int32, np.uint32,
        np.float32, np.float64,
    ])
    def test_all_dtypes(self, dtype):
        arr = (np.arange(24).reshape(4, 6) * 2 + 1).astype(dtype)
        data, hdr = S.format_saga(arr, self.GT, nodata=-1.0)
        a2, gt2, nd2 = S.decode_saga(data, S.parse_sgrd(hdr))
        assert a2.dtype == np.dtype(dtype)
        assert np.array_equal(a2, arr)
        assert gt2 == pytest.approx(self.GT, abs=1e-9)
        assert nd2 == -1.0

    def test_datafile_offset(self):
        arr = np.arange(6, dtype=np.float32).reshape(2, 3)
        data, hdr = S.format_saga(arr, (0, 1, 0, 2, 0, -1))
        hdr = hdr.replace("DATAFILE_OFFSET\t= 0",
                          "DATAFILE_OFFSET\t= 7")
        a2, _, _ = S.decode_saga(b"\x00" * 7 + data,
                                 S.parse_sgrd(hdr))
        assert np.array_equal(a2, arr)

    def test_big_endian_read(self):
        arr = np.arange(6, dtype=np.float32).reshape(2, 3)
        data = np.ascontiguousarray(arr[::-1, :]).astype(">f4").tobytes()
        hdr = S.parse_sgrd(
            "DATAFORMAT\t= FLOAT\nBYTEORDER_BIG\t= TRUE\n"
            "CELLCOUNT_X\t= 3\nCELLCOUNT_Y\t= 2\nCELLSIZE\t= 1\n"
            "POSITION_XMIN\t= 0.5\nPOSITION_YMIN\t= 0.5\n")
        a2, gt2, _ = S.decode_saga(data, hdr)
        assert np.array_equal(a2, arr)
        assert gt2 == (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)


class TestSpark:
    def test_scan_write_round_trip(self, spark, tmp_path):
        rows = []
        for i in range(3):
            arr = (np.arange(12, dtype=np.float32).reshape(3, 4)
                   + 5 * i)
            rows.append((
                f"s{i}", bytearray(codecs.encode_raw(arr)), 4, 3,
                "raw", float(i), 0.5, 0.0, 40.0, 0.0, -0.5,
                32601 + i, -99999.0,
            ))
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(3)
        out = str(tmp_path / "saga")
        assert len(S.write_saga(src, out)) == 3
        # .prj written from the projected srid
        assert os.path.exists(os.path.join(out, "s0.prj"))
        got = {r.image_id: r for r in S.scan_saga(
            spark, os.path.join(out, "*.sdat")).collect()}
        assert set(got) == {"s0", "s1", "s2"}
        for i in range(3):
            r = got[f"s{i}"]
            a = codecs.decode_image(bytes(r.bytes), "raw")
            assert np.array_equal(
                a, np.arange(12, dtype=np.float32).reshape(3, 4)
                + 5 * i)
            assert r.srid == 32601 + i
            assert (r.gt0, r.gt5) == pytest.approx((float(i), -0.5),
                                                   abs=1e-9)

    def test_scan_fixture(self, spark):
        r = S.scan_saga(
            spark, os.path.join(DATA, "4byteFloat.sdat")).collect()[0]
        arr = codecs.decode_image(bytes(r.bytes), "raw")
        assert gdal_checksum(arr) == 108
        assert r.srid == 26711
