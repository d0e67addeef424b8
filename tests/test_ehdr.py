"""EHdr (ESRI BIL / GridFloat) driver tests — conformance on reference
autotest DATA files (byte-identical copies, see tests/data/README.md);
expected checksums quoted from autotest/gdrivers/ehdr.py."""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import ehdr as E

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestConformance:
    def test_float32_bil(self):
        # test_ehdr_3: checksum 27; ULXMAP/ULYMAP are pixel CENTERS so
        # the geotransform must come out as byte.tif's; SRID from the
        # AUTHORITY-less ESRI .prj via the UTM parameter match
        a, gt, srid, nd = E.parse_ehdr(os.path.join(DATA, "float32.bil"))
        assert a.shape == (20, 20) and a.dtype == np.float32
        assert gdal_checksum(a) == 27
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert srid == 26711 and nd is None

    def test_nbits_inferred_from_file_size(self):
        # test_ehdr_10: header has NO NBITS — 4 bytes/cell => Float32
        a, gt, _s, _n = E.parse_ehdr(os.path.join(DATA, "ehdr10.bil"))
        assert a.dtype == np.float32 and gdal_checksum(a) == 8202
        # xllcorner/yllcorner anchor the lower-left CORNER
        assert gt[0] == -17973801.662435
        assert gt[3] == 2041811.701239 + 2 * 2500.0

    def test_flt_extension_implies_float(self):
        # test_ehdr_11: NBITS 32 + .flt extension => Float32, not u4
        a, _g, _s, _n = E.parse_ehdr(os.path.join(DATA, "ehdr11.flt"))
        assert a.dtype == np.float32 and gdal_checksum(a) == 8202

    def test_negative_nodata_implies_signed(self, tmp_path):
        raw = np.array([[-5, 3], [100, -32000]], np.int16)
        (tmp_path / "s.bil").write_bytes(
            raw.astype("<i2").tobytes())
        (tmp_path / "s.hdr").write_text(
            "ncols 2\nnrows 2\nnbits 16\nnodata -32000\n")
        a, _g, _s, nd = E.parse_ehdr(str(tmp_path / "s.bil"))
        assert a.dtype == np.int16 and nd == -32000.0
        assert np.array_equal(a, raw)

    def test_sub_byte_rejected(self, tmp_path):
        (tmp_path / "b.bil").write_bytes(b"\x00")
        (tmp_path / "b.hdr").write_text("ncols 2\nnrows 2\nnbits 1\n")
        with pytest.raises(ValueError, match="sub-byte"):
            E.parse_ehdr(str(tmp_path / "b.bil"))


class TestSpark:
    def test_scan_fixtures(self, spark):
        rows = {r.image_id: r
                for r in E.scan_ehdr(
                    spark, os.path.join(DATA, "float32.bil")).collect()}
        r = rows["float32"]
        a = codecs.decode_image(bytes(r.bytes), r.fmt)
        assert gdal_checksum(a.astype(np.float32)) == 27
        assert r.srid == 26711 and r.gt0 == 440720.0

    def test_write_scan_roundtrip(self, spark, tmp_path):
        cases = [
            ("u8", np.arange(24, dtype=np.uint8).reshape(4, 6)),
            ("i16", (np.arange(24, dtype=np.int16) - 12).reshape(4, 6)),
            ("f32", np.linspace(-1, 1, 24, dtype=np.float32)
             .reshape(4, 6)),
        ]
        rows = [
            (name, codecs.encode_raw(arr), 6, 4, "raw",
             10.0, 0.5, 0.0, 20.0, 0.0, -0.5, 32611, None)
            for name, arr in cases
        ]
        df = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(3)
        paths = E.write_ehdr(df, str(tmp_path))
        assert len(paths) == 3
        assert any(p.endswith(".flt") for p in paths)  # GridFloat
        back = {r.image_id: r
                for r in E.scan_ehdr(
                    spark, str(tmp_path / "*")).collect()}
        for name, arr in cases:
            b = codecs.decode_image(bytes(back[name].bytes),
                                    back[name].fmt)
            assert np.array_equal(b.astype(arr.dtype), arr), name
            assert back[name].gt0 == 10.0 and back[name].gt3 == 20.0
            assert back[name].srid == 32611  # via the written .prj
