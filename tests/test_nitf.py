"""NITF driver tests.

Conformance quoted from autotest/gdrivers/nitf.py: rgb.ntf band-3
checksum 21349 + the test_nitf_6 "adjusted IGEOLO" gt golden; the
three 1-bit fixtures (i_3034c.ntf NC, ns3034d.nsf NSIF NM,
i_3034f.ntf) at checksum 170; ns3114a.nsf TEXT DATA_0 == 'A';
U_0002A.NTF header-only rejection; U_1050A.NTF C1 rejection with a
clear error. Semantics: frmts/nitf/{nitffile.c,nitfimage.c} (the
published MIL-STD-2500C). Provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import nitf as N

DATA = os.path.join(os.path.dirname(__file__), "data", "nitf")


def _b(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


class TestConformance:
    def test_rgb(self):
        (arr, gt, meta), = N.parse_nitf(_b("rgb.ntf"))
        assert arr.shape == (50, 50, 3)
        assert gdal_checksum(arr[:, :, 2]) == 21349
        exp = (-44.842029478458, 0.003503401360, 0,
               -22.930748299319, 0, -0.003503401360)
        assert gt == pytest.approx(exp, abs=1e-10)

    @pytest.mark.parametrize("name", ["i_3034c.ntf", "ns3034d.nsf",
                                      "i_3034f.ntf"])
    def test_1bit(self, name):
        (arr, gt, meta), = N.parse_nitf(_b(name))
        assert arr.shape == (18, 35)
        assert gdal_checksum(arr) == 170
        assert meta["ic"] in ("NC", "NM")

    def test_fake_nsif(self):
        (arr, gt, meta), = N.parse_nitf(_b("fake_nsif.ntf"))
        assert meta["version"] == "NSIF01.00"
        assert arr.shape == (30, 30)
        assert gdal_checksum(arr) == 12033

    def test_text_segment(self):
        # test_nitf_21's TEXT metadata golden
        assert N.nitf_texts(_b("ns3114a.nsf"))["DATA_0"] == "A"

    def test_header_only_rejected(self):
        with pytest.raises(ValueError, match="header-only"):
            N.parse_nitf(_b("U_0002A.NTF"))

    def test_compressed_rejected(self):
        with pytest.raises(ValueError, match="IC='C1'"):
            N.parse_nitf(_b("U_1050A.NTF"))

    def test_truncated_zero_fills(self):
        (arr, _, _), = N.parse_nitf(_b("i_6130a_truncated.ntf"))
        assert arr.shape == (1, 1)


class TestRoundTrip:
    GT = (-100.125, 0.25, 0.0, 50.25, 0.0, -0.25)

    @pytest.mark.parametrize("dt", [np.uint8, np.int8, np.int16,
                                    np.uint16, np.int32, np.uint32,
                                    np.float32, np.float64])
    def test_write_parse(self, dt):
        rng = np.random.default_rng(4)
        arr = (rng.normal(0, 40, (5, 7)).astype(dt)
               if np.issubdtype(dt, np.floating)
               else rng.integers(0, 120, (5, 7)).astype(dt))
        (a2, g2, meta), = N.parse_nitf(N.format_nitf(arr, self.GT))
        assert a2.dtype == np.dtype(dt)
        assert np.array_equal(a2, arr)
        # quarter-degree grids survive the 3-dp IGEOLO D encoding
        # exactly (centers land on the 3-dp grid)
        assert g2 == self.GT

    def test_multiband_pixel_interleave(self):
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 255, (6, 9, 3)).astype(np.uint8)
        (a2, g2, meta), = N.parse_nitf(N.format_nitf(arr, self.GT))
        assert np.array_equal(a2, arr)
        assert meta["imode"] == "P"

    def test_rejects_rotation(self):
        with pytest.raises(ValueError, match="north-up"):
            N.format_nitf(np.zeros((2, 2), np.uint8),
                          (0, 1, 0.1, 0, 0, -1))


class TestScan:
    def test_scan_sink(self, spark, tmp_path):
        rng = np.random.default_rng(6)
        from gdal_spark import codecs
        arrs = {f"n{i}": rng.integers(0, 255, (5, 6, 3))
                .astype(np.uint8) for i in range(3)}
        rows = [(k, bytearray(codecs.encode_raw(v)), 6, 5, "raw",
                 -10.125, 0.25, 0.0, 40.25, 0.0, -0.25, 0, None)
                for k, v in arrs.items()]
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double")
        N.write_nitf(src, str(tmp_path))
        df = N.scan_nitf(spark, str(tmp_path / "*.ntf"))
        got = {r.image_id: r for r in df.collect()}
        for k, v in arrs.items():
            assert np.array_equal(
                codecs.decode_image(bytes(got[k].bytes), "raw"), v)
            assert got[k].gt0 == -10.125
