"""VICAR + ISIS2 planetary driver tests.

Conformance quoted from autotest/gdrivers/vicar.py
(test_vicar_read_datatypes: every FORMAT x INTFMT/REALFMT fixture at
checksum 129/123/148/226, BASIC/BASIC2 at 4672 and 34464;
test_vicar_1: the truncated HRSC product's gt
(-53985, 25, 0, -200805, 0, -25), nodata 0, scale 2.34, offset 4.56)
and autotest/gdrivers/isis2.py (test_isis2_1: checksum 382 + the gt
golden within gdaltest's own epsilon (|gt1|+|gt2|)/100).
Semantics: frmts/pds/vicardataset.cpp, frmts/pds/isis2dataset.cpp.
Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import isis2 as I
from gdal_spark.formats import vicar as V

DATA = os.path.join(os.path.dirname(__file__), "data")


def _read(sub, name):
    with open(os.path.join(DATA, sub, name), "rb") as f:
        return f.read()


def _band1(arr):
    return arr if arr.ndim == 2 else arr[:, :, 0]


def _cs_complex(arr):
    # alg/gdalchecksum.cpp checksums complex bands over interleaved
    # (re, im) at doubled width
    h, w = arr.shape
    inter = np.empty((h, 2 * w), np.float64)
    inter[:, 0::2] = arr.real
    inter[:, 1::2] = arr.imag
    return gdal_checksum(inter)


class TestVicarConformance:
    # (fixture, dtype, band-1 checksum) straight from
    # test_vicar_read_datatypes
    CASES = [
        ("vicar_byte.vic", np.uint8, 129),
        ("vicar_int16.vic", np.int16, 129),
        ("vicar_bigendian_int16.vic", np.int16, 129),
        ("vicar_int32.vic", np.int32, 129),
        ("vicar_float32_bsq.vic", np.float32, 123),
        ("vicar_float32_bil.vic", np.float32, 123),
        ("vicar_float32_bip.vic", np.float32, 123),
        ("vicar_bigendian_float32.vic", np.float32, 129),
        ("vicar_float64.vic", np.float64, 129),
        ("vicar_vax_float32.vic", np.float32, 129),
        ("vicar_vax_float64.vic", np.float64, 129),
        ("vicar_byte_basic.vic", np.uint8, 4672),
        ("vicar_byte_basic2.vic", np.uint8, 4672),
        ("vicar_int16_basic2.vic", np.int16, 4672),
        ("vicar_all_ones_basic2.vic", np.uint8, 34464),
    ]

    @pytest.mark.parametrize(
        "name,dt,cs", CASES, ids=[c[0] for c in CASES])
    def test_datatypes(self, name, dt, cs):
        arr, *_ = V.parse_vicar(_read("vicar", name))
        assert arr.dtype == np.dtype(dt)
        assert gdal_checksum(_band1(arr)) == cs

    @pytest.mark.parametrize("name,cs", [
        ("vicar_cfloat32.vic", 148),
        ("vicar_vax_cfloat32.vic", 226),
    ])
    def test_complex(self, name, cs):
        arr, *_ = V.parse_vicar(_read("vicar", name))
        assert arr.dtype == np.complex64
        assert _cs_complex(_band1(arr)) == cs

    def test_multiband_bil_bip_match_bsq(self):
        ref, *_ = V.parse_vicar(_read("vicar", "vicar_float32_bsq.vic"))
        for name in ("vicar_float32_bil.vic", "vicar_float32_bip.vic"):
            arr, *_ = V.parse_vicar(_read("vicar", name))
            assert arr.shape == ref.shape == (3, 4, 2)
            assert np.array_equal(arr, ref)

    def test_truncated_georef(self):
        # 97%-missing HRSC product: georef + instrument metadata
        # still come out, pixels zero-fill (RawRasterBand semantics)
        arr, gt, nodata, scale, offset, proj = V.parse_vicar(
            _read("vicar", "test_vicar_truncated.bin"))
        assert arr.shape == (1000, 400)
        exp = (-53985.0, 25.0, 0.0, -200805.0, 0.0, -25.0)
        assert gt == pytest.approx(exp, abs=1e-8)
        assert nodata == 0
        assert scale == pytest.approx(2.34, abs=1e-5)
        assert offset == pytest.approx(4.56, abs=1e-5)
        assert proj.startswith("SINUSOIDAL|MARS|3396|3396|137.0")
        # past-EOF rows are zero
        assert int(arr[-1].max()) == 0

    def test_binary_prefix_skipped(self):
        # NBB > 0: the per-record binary prefix must not leak into
        # the pixels
        arr, *_ = V.parse_vicar(_read("vicar", "vicar_binary_prefix.vic"))
        assert arr.shape == (1, 1)

    def test_label_quote_doubling(self):
        kv, _ = V.parse_vicar_label(_read("vicar", "test_vicar_truncated.bin"))
        # the reference pins TASK.HRORTHO EXTORI_FILE_NAME ==
        # "extori'_file_name" (doubled '' in the label)
        assert kv["HRORTHO.EXTORI_FILE_NAME"] == "extori'_file_name"


class TestVicarRoundTrip:
    GT = (-100.0, 25.0, 0.0, 5000.0, 0.0, -25.0)

    @pytest.mark.parametrize("dt", [np.uint8, np.int16, np.int32,
                                    np.float32, np.float64])
    def test_write_parse(self, dt):
        rng = np.random.default_rng(3)
        arr = (rng.normal(0, 40, (5, 7)).astype(dt)
               if np.issubdtype(dt, np.floating)
               else rng.integers(0, 120, (5, 7)).astype(dt))
        a2, gt2, *_ = V.parse_vicar(V.format_vicar(arr, self.GT))
        assert a2.dtype == np.dtype(dt)
        assert np.array_equal(a2, arr)
        assert gt2 == pytest.approx(self.GT, abs=1e-9)

    def test_multiband(self):
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 255, (4, 6, 3)).astype(np.uint8)
        a2, *_ = V.parse_vicar(V.format_vicar(arr, self.GT))
        assert np.array_equal(a2, arr)

    def test_rejects_rotation(self):
        with pytest.raises(ValueError, match="north-up"):
            V.format_vicar(np.zeros((2, 2), np.uint8),
                           (0, 1, 0.1, 0, 0, -1))


class TestIsis2:
    def test_arvidson(self):
        buf = _read("isis2", "arvidson_original_truncated.cub")
        arr, gt, nodata, scale, offset, proj = I.parse_isis2(buf)
        assert arr.dtype == np.float32
        assert arr.shape == (1, 43)
        assert gdal_checksum(arr) == 382
        # autotest golden compared within gdaltest's own gt epsilon
        # (|gt1|+|gt2|)/100 = 12 m; the quoted decimals bake an older
        # float-cast order, current source computes the round values
        exp = (10157400.403618813, 1200.0000476837158, 0.0,
               -585000.02324581146, 0.0, -1200.0000476837158)
        eps = (abs(exp[1]) + abs(exp[2])) / 100.0
        for a, b in zip(gt, exp):
            assert abs(a - b) <= eps
        assert gt[1] == 1200.0 and gt[0] == 10157400.0
        assert nodata == pytest.approx(-3.4028226550889044521e38)
        assert proj.split("|")[:2] == ["SIMPLE_CYLINDRICAL", "VENUS"]
        # CENTER_LATITUDE -6.5 becomes standard_parallel_1 in the
        # reference's Equirectangular SRS golden
        assert float(proj.split("|")[5]) == -6.5

    @pytest.mark.parametrize("dt", [np.uint8, np.int16, np.uint16,
                                    np.float32, np.float64])
    def test_roundtrip(self, dt):
        rng = np.random.default_rng(7)
        arr = (rng.normal(0, 50, (6, 9)).astype(dt)
               if np.issubdtype(dt, np.floating)
               else rng.integers(0, 200, (6, 9)).astype(dt))
        gt = (-300.0, 2.5, 0.0, 480.0, 0.0, -2.5)
        a2, gt2, *_ = I.parse_isis2(I.format_isis2(arr, gt))
        assert a2.dtype == np.dtype(dt)
        assert np.array_equal(a2, arr)
        assert gt2 == pytest.approx(gt, abs=1e-6)

    def test_roundtrip_multiband(self):
        rng = np.random.default_rng(8)
        arr = rng.integers(0, 255, (4, 5, 3)).astype(np.uint8)
        a2, *_ = I.parse_isis2(
            I.format_isis2(arr, (-300.0, 2.5, 0.0, 480.0, 0.0, -2.5)))
        assert np.array_equal(a2, arr)

    def test_rejects_suffix_planes(self):
        buf = _read("isis2", "arvidson_original_truncated.cub")
        bad = buf.replace(b"SUFFIX_ITEMS = (0,0,0)",
                          b"SUFFIX_ITEMS = (1,0,0)")
        with pytest.raises(ValueError, match="backplanes"):
            I.parse_isis2(bad)


class TestScans:
    def test_scan_vicar_and_write(self, spark, tmp_path):
        rng = np.random.default_rng(11)
        arrs = {f"v{i}": rng.integers(0, 255, (6, 8)).astype(np.uint8)
                for i in range(4)}
        for name, arr in arrs.items():
            with open(tmp_path / f"{name}.vic", "wb") as f:
                f.write(V.format_vicar(
                    arr, (10.0 * ord(name[1]), 2.0, 0.0, 99.0, 0.0, -2.0)))
        df = V.scan_vicar(spark, str(tmp_path / "*.vic"))
        assert df.rdd.getNumPartitions() == 4
        rows = {r.image_id: r for r in df.collect()}
        assert set(rows) == set(arrs)
        from gdal_spark import codecs
        for name, arr in arrs.items():
            got = codecs.decode_image(bytes(rows[name].bytes), "raw")
            assert np.array_equal(got, arr)
            assert rows[name].gt1 == 2.0

        out = tmp_path / "out"
        V.write_vicar(df, str(out))
        df2 = V.scan_vicar(spark, str(out / "*.vic"))
        for r in df2.collect():
            got = codecs.decode_image(bytes(r.bytes), "raw")
            assert np.array_equal(got, arrs[r.image_id])

    def test_scan_isis2(self, spark, tmp_path):
        rng = np.random.default_rng(12)
        arrs = {f"c{i}": rng.normal(0, 5, (3, 7)).astype(np.float32)
                for i in range(3)}
        for name, arr in arrs.items():
            with open(tmp_path / f"{name}.cub", "wb") as f:
                f.write(I.format_isis2(
                    arr, (0.0, 1.5, 0.0, 30.0, 0.0, -1.5)))
        df = I.scan_isis2(spark, str(tmp_path / "*.cub"))
        rows = {r.image_id: r for r in df.collect()}
        from gdal_spark import codecs
        for name, arr in arrs.items():
            got = codecs.decode_image(bytes(rows[name].bytes), "raw")
            assert np.array_equal(got, arr)
            assert rows[name].nodata == pytest.approx(
                -3.4028226550889044521e38)
