"""NTv2 datum grid-shift driver tests.

Conformance values quoted from the reference's own autotest suite
(autotest/gdrivers/ntv2.py test_ntv2_1 / test_ntv2_2): both byte
orders of the same 2x2 shift grid must open as a 4-band float32
raster with band-2 checksum 10 and the geotransform derived from the
subgrid header (the test quotes (-5.52, 7.8, 0, 52.05, 0, -5.55)
under its (gt1+gt2)/100 = 0.078 tolerance; the exact header math
gives gt0 = (W_LONG - LONG_INC/2)/3600 = -5.55, within it).
Semantics: frmts/raw/ntv2dataset.cpp (verified against the code this
round). Fixture provenance in tests/data/README.md.
"""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import ntv2 as N

DATA = os.path.join(os.path.dirname(__file__), "data")
EXPECT_GT = (-5.55, 7.8, 0.0, 52.05, 0.0, -5.55)


def _grid(name="TESTGRID", lat_off=2.0, lon_off=-3.0, h=4, w=5):
    """Synthetic subgrid: smooth offsets so bilinear interp is exact
    (offsets linear in lon/lat are reproduced exactly by bilinear)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    arr = np.stack([
        lat_off + 0.25 * xx + 0.5 * yy,    # lat offset (arcsec)
        lon_off + 0.125 * xx - 0.25 * yy,  # lon offset (+west)
        np.full((h, w), 0.01, np.float32),
        np.full((h, w), 0.02, np.float32),
    ], axis=2).astype(np.float32)
    gt = (-2.0, 0.5, 0.0, 51.0, 0.0, -0.5)
    return {"name": name, "gt": gt, "arr": arr}


class TestConformance:
    @pytest.mark.parametrize("fname", ["test_ntv2_le.gsb",
                                       "test_ntv2_be.gsb"])
    def test_autotest_fixture(self, fname):
        with open(os.path.join(DATA, fname), "rb") as f:
            meta, grids = N.parse_ntv2(f.read())
        assert len(grids) == 1
        g = grids[0]
        assert g["arr"].shape == (2, 2, 4)
        assert g["gt"] == pytest.approx(EXPECT_GT, abs=1e-12)
        # autotest checks band 2 (longitude offset) checksum 10
        assert gdal_checksum(g["arr"][:, :, 1]) == 10
        # overview header fields from the hex dump discipline
        assert meta["GS_TYPE"] == "SECONDS"
        assert meta["SYSTEM_F"] == "NTF"
        assert meta["MAJOR_F"] == pytest.approx(6378249.2)
        assert meta["MAJOR_T"] == pytest.approx(6378137.0)
        # orientation: stored first record is the SE corner; GDAL
        # band must carry it at the BOTTOM-RIGHT cell
        assert g["arr"][1, 1, 0] == pytest.approx(0.074352, abs=1e-6)

    def test_le_be_identical(self):
        with open(os.path.join(DATA, "test_ntv2_le.gsb"), "rb") as f:
            _, g_le = N.parse_ntv2(f.read())
        with open(os.path.join(DATA, "test_ntv2_be.gsb"), "rb") as f:
            _, g_be = N.parse_ntv2(f.read())
        assert np.array_equal(g_le[0]["arr"], g_be[0]["arr"])
        assert g_le[0]["gt"] == g_be[0]["gt"]


class TestRoundTrip:
    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_write_parse(self, bo):
        g = _grid()
        buf = N.format_ntv2([g], {"SYSTEM_F": "NAD27",
                                  "SYSTEM_T": "NAD83"},
                            byte_order=bo)
        meta, grids = N.parse_ntv2(buf)
        assert meta["SYSTEM_F"] == "NAD27"
        assert len(grids) == 1
        assert grids[0]["name"] == "TESTGRID"
        assert grids[0]["gt"] == pytest.approx(g["gt"], abs=1e-12)
        assert np.array_equal(grids[0]["arr"], g["arr"])

    def test_multi_subgrid(self):
        g1, g2 = _grid("COARSE"), _grid("FINE")
        g2["gt"] = (-1.0, 0.25, 0.0, 50.5, 0.0, -0.25)
        g2["parent"] = "COARSE"
        buf = N.format_ntv2([g1, g2])
        _, grids = N.parse_ntv2(buf)
        assert [g["name"] for g in grids] == ["COARSE", "FINE"]
        assert grids[1]["parent"] == "COARSE"

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="NUM_OREC"):
            N.parse_ntv2(b"\x00" * 100)


class TestGridShift:
    def test_forward_semantics(self):
        # constant offsets (exactly representable in float32):
        # dlat=+3.375", dlon=+7.25" (positive west)
        arr = np.zeros((3, 4, 4), np.float32)
        arr[:, :, 0] = 3.375
        arr[:, :, 1] = 7.25
        s = N.GridShift([{"gt": (-2.0, 1.0, 0.0, 52.0, 0.0, -1.0),
                          "arr": arr}])
        lon, lat = s.forward(np.array([0.0]), np.array([50.5]))
        assert lat[0] == pytest.approx(50.5 + 3.375 / 3600, abs=1e-13)
        assert lon[0] == pytest.approx(0.0 - 7.25 / 3600, abs=1e-13)

    def test_bilinear_exact_on_linear_field(self):
        g = _grid()
        s = N.GridShift([g])
        # probe at an interior non-node point; offsets linear in
        # lon/lat so bilinear must reproduce the closed form exactly
        lon = np.array([-1.1])
        lat = np.array([50.2])
        fx = (lon - g["gt"][0]) / g["gt"][1] - 0.5
        fy = (lat - g["gt"][3]) / g["gt"][5] - 0.5
        dlat = 2.0 + 0.25 * fx + 0.5 * fy
        dlon = -3.0 + 0.125 * fx - 0.25 * fy
        flon, flat = s.forward(lon, lat)
        assert flat[0] == pytest.approx(lat[0] + dlat[0] / 3600, abs=1e-12)
        assert flon[0] == pytest.approx(lon[0] - dlon[0] / 3600, abs=1e-12)

    def test_inverse_fixed_point(self):
        s = N.GridShift([_grid()])
        lon = np.linspace(-1.9, 0.2, 7)
        lat = np.linspace(49.6, 50.9, 7)
        flon, flat = s.forward(lon, lat)
        blon, blat = s.inverse(flon, flat)
        assert np.allclose(blon, lon, atol=1e-10)
        assert np.allclose(blat, lat, atol=1e-10)

    def test_outside_unshifted(self):
        s = N.GridShift([_grid()])
        lon, lat = s.forward(np.array([100.0]), np.array([0.0]))
        assert (lon[0], lat[0]) == (100.0, 0.0)

    def test_finest_subgrid_wins(self):
        coarse = _grid("COARSE", lat_off=36.0, lon_off=0.0)
        coarse["arr"][:, :, :2] = [36.0, 0.0]
        fine = _grid("FINE", lat_off=72.0, lon_off=0.0)
        fine["arr"][:, :, :2] = [72.0, 0.0]
        fine["gt"] = (-1.5, 0.25, 0.0, 50.75, 0.0, -0.25)
        s = N.GridShift([coarse, fine])
        # point inside both -> fine (0.02 deg); only coarse -> 0.01
        _, lat_in = s.forward(np.array([-1.0]), np.array([50.5]))
        _, lat_out = s.forward(np.array([-1.9]), np.array([50.9]))
        assert lat_in[0] == pytest.approx(50.5 + 0.02, abs=1e-12)
        assert lat_out[0] == pytest.approx(50.9 + 0.01, abs=1e-12)


class TestDatumRegistry:
    def test_registered_grid_routes_transforms(self):
        from gdal_spark import proj

        srid = 904267  # private test srid
        try:
            N.register_grid_datum(srid, [_grid()])
            t = proj.get_transformer(srid)
            lon, lat = np.array([-1.1]), np.array([50.2])
            # forward: WGS84 -> local = grid inverse
            s = N.GridShift([_grid()])
            glon, glat = t.inverse(*t.forward(lon, lat))
            assert glon[0] == pytest.approx(-1.1, abs=1e-10)
            assert glat[0] == pytest.approx(50.2, abs=1e-10)
            # to_wgs84 of the registry object == raw grid forward
            flon, flat = proj.DATUM_TABLE[srid].to_wgs84(lon, lat)
            elon, elat = s.forward(lon, lat)
            assert flon[0] == elon[0] and flat[0] == elat[0]
        finally:
            proj.DATUM_TABLE.pop(srid, None)
            proj._XFORM_CACHE.pop(srid, None)


class TestSpark:
    def test_scan_write_round_trip(self, spark, tmp_path):
        rows = []
        for i in range(3):
            g = _grid(f"G{i}", lat_off=float(i))
            rows.append((
                f"g{i}", bytearray(codecs.encode_raw(g["arr"])),
                5, 4, "raw", *[float(v) for v in g["gt"]], 4326, None,
            ))
        src = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        ).repartition(3)
        out = str(tmp_path / "gsb")
        paths = N.write_ntv2(src, out)
        assert len(paths) == 3
        got = {r.image_id: r for r in N.scan_ntv2(
            spark, os.path.join(out, "*.gsb")).collect()}
        assert set(got) == {"g0", "g1", "g2"}
        for i in range(3):
            r = got[f"g{i}"]
            arr = codecs.decode_image(bytes(r.bytes), "raw")
            assert arr.shape == (4, 5, 4)
            assert arr[0, 0, 0] == np.float32(float(i))
            assert (r.gt0, r.gt1, r.gt5) == (-2.0, 0.5, -0.5)
            assert r.srid == 4326

    def test_scan_autotest_fixture(self, spark):
        rows = N.scan_ntv2(
            spark, os.path.join(DATA, "test_ntv2_le.gsb")).collect()
        assert len(rows) == 1
        arr = codecs.decode_image(bytes(rows[0].bytes), "raw")
        assert gdal_checksum(arr[:, :, 1]) == 10
        assert rows[0].gt1 == pytest.approx(7.8)
