"""netCDF classic driver conformance + roundtrip tests.

Conformance fixtures are byte-identical GDAL autotest DATA files (md5
provenance in tests/data/README.md); expected values come from the
reference's own expectations in autotest/gdrivers/netcdf.py:

- byte.nc: band checksum 4672, the byte.tif geotransform, EPSG:26711
  from the embedded spatial_ref WKT; the data plane is stored
  BOTTOM-UP (ascending y coordinate variable) even though the
  GeoTransform attribute is north-up — the checksum only matches if
  the flip rule is right.
- bug636.nc, variable ``tas``: checksum 31621 (test_netcdf_1) —
  ascending-latitude flip over float data, nodata from missing_value.
- GLMELT_4X5.OCN.nc: lon/lat coordinate-variable georef.
"""

import os

import numpy as np
import pytest

from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats.netcdf import (
    format_netcdf,
    netcdf_rasters,
    parse_cdf,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def _read(name):
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


class TestConformance:
    def test_byte_nc(self):
        rs = netcdf_rasters(_read("byte.nc"))
        assert len(rs) == 1
        var, band, a, gt, srid, nodata = rs[0]
        assert var == "Band1" and a.shape == (20, 20)
        assert a.dtype == np.uint8  # _Unsigned reinterpret
        assert gdal_checksum(a) == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert srid == 26711

    def test_bug636_tas(self):
        rs = netcdf_rasters(_read("bug636.nc"), "tas")
        var, band, a, gt, srid, nodata = rs[0]
        assert a.shape == (64, 128) and a.dtype == np.float32
        assert gdal_checksum(a.astype(np.float64)) == 31621
        assert srid == 4326 and nodata == 1e20
        assert gt[5] < 0  # flipped to north-up

    def test_glmelt_lonlat_coords(self):
        var, band, a, gt, srid, _ = netcdf_rasters(
            _read("GLMELT_4X5.OCN.nc")
        )[0]
        assert var == "mask" and a.shape == (46, 72)
        assert gt[0] == -180.0 and gt[1] == 5.0 and gt[5] < 0
        assert srid == 4326

    def test_rejects_hdf5_and_garbage(self):
        with pytest.raises(ValueError, match="classic"):
            parse_cdf(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
        with pytest.raises(ValueError, match="CDF"):
            parse_cdf(b"not netcdf at all")


class TestWrite:
    @pytest.mark.parametrize(
        "dt", [np.uint8, np.int16, np.int32, np.float32, np.float64]
    )
    def test_roundtrip_multiband(self, dt):
        rng = np.random.default_rng(1)
        x = rng.normal(0, 100, (9, 13, 2)).astype(dt)
        b = format_netcdf(x, (10.0, 0.5, 0, 20.0, 0, -0.5),
                          srid=32611, nodata=-5.0)
        back = netcdf_rasters(b)
        assert [v[0] for v in back] == ["Band1", "Band2"]
        for var, band, a, gt, srid, nd in back:
            ch = int(var[4:]) - 1
            np.testing.assert_array_equal(a, x[:, :, ch])
            assert gt == (10.0, 0.5, 0, 20.0, 0, -0.5)
            assert srid == 32611 and nd == -5.0

    def test_reencode_byte_nc(self):
        var, _, a, gt, srid, _ = netcdf_rasters(_read("byte.nc"))[0]
        b = format_netcdf(a, gt, srid=srid)
        var2, _, a2, g2, s2, _ = netcdf_rasters(b)[0]
        assert np.array_equal(a2, a) and g2 == gt and s2 == 26711
        assert gdal_checksum(a2) == 4672

    def test_header_parse_of_own_output(self):
        hdr = parse_cdf(format_netcdf(
            np.zeros((3, 4), np.float32), (0, 1, 0, 0, 0, -1)
        ))
        assert [d[0] for d in hdr["dims"]] == ["x", "y"]
        assert set(hdr["vars"]) == {"crs", "x", "y", "Band1"}
        assert hdr["gatts"]["Conventions"] == "CF-1.5"


class TestSpark:
    def test_distributed_scan_and_sink(self, spark, tmp_path):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_netcdf, write_netcdf

        rng = np.random.default_rng(3)
        rows = []
        for i in range(4):
            a = rng.normal(0, 50, (7, 8)).astype(np.float32)
            rows.append((
                f"g{i}", bytearray(codecs.encode_raw(a)), 8, 7, "raw",
                float(10 * i), 0.25, 0.0, 50.0, 0.0, -0.25, 3857, -99.0,
            ))
        df = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
            "gt5 double, srid int, nodata double",
        )
        paths = write_netcdf(df, str(tmp_path / "nc"))
        assert len(paths) == 4
        back = scan_netcdf(spark, str(tmp_path / "nc" / "*.nc"))
        got = {r.image_id: r for r in back.collect()}
        src = {r.image_id: r for r in df.collect()}
        assert set(got) == set(src)
        for iid in got:
            a = codecs.decode_image(bytes(got[iid].bytes), got[iid].fmt)
            b = codecs.decode_image(bytes(src[iid].bytes), src[iid].fmt)
            np.testing.assert_array_equal(a, b)
            assert got[iid].srid == 3857 and got[iid].nodata == -99.0

    def test_scan_autotest_variable_select(self, spark):
        from gdal_spark import codecs
        from gdal_spark.formats import scan_netcdf

        row = scan_netcdf(
            spark, os.path.join(DATA, "bug636.nc"), variable="tas"
        ).collect()[0]
        a = codecs.decode_image(bytes(row.bytes), row.fmt)
        assert gdal_checksum(a.reshape(64, 128).astype(np.float64)) == 31621
