"""DEM products (gdaldem analogs) vs closed-form planes + distributed
halo parity."""

import numpy as np
import pytest

from gdal_spark.operators.dem import dem_array, dem_tiles


def plane_x(h=12, w=12):
    return np.tile(np.arange(w, dtype=float), (h, 1))


class TestDemArray:
    def test_slope_45_on_unit_plane(self):
        s = dem_array(plane_x(), "slope")
        assert np.allclose(s[1:-1, 1:-1], 45.0)
        assert np.isnan(s[0, 0])  # border nodata

    def test_aspect_west_for_east_rising_plane(self):
        a = dem_array(plane_x(), "aspect")
        assert np.allclose(a[1:-1, 1:-1], 270.0)

    def test_aspect_flat_is_nodata(self):
        a = dem_array(np.zeros((8, 8)), "aspect")
        assert np.isnan(a[1:-1, 1:-1]).all()

    def test_hillshade_flat(self):
        hsh = dem_array(np.zeros((8, 8)), "hillshade", altitude=45.0)
        expect = np.clip(np.round(254.0 * np.sin(np.radians(45.0))) + 1, 1, 255)
        assert np.allclose(hsh[1:-1, 1:-1], expect)

    def test_hillshade_facing_light_brighter(self):
        # light from az=315 (NW); a NW-facing slope is brighter than SE
        yy, xx = np.mgrid[0:16, 0:16]
        nw_facing = (xx + yy).astype(float)  # rises to SE -> faces NW
        se_facing = -(xx + yy).astype(float)
        hs_nw = np.nanmean(dem_array(nw_facing, "hillshade")[1:-1, 1:-1])
        hs_se = np.nanmean(dem_array(se_facing, "hillshade")[1:-1, 1:-1])
        assert hs_nw > hs_se

    def test_tri_tpi_roughness_on_plane(self):
        t = dem_array(plane_x(), "tri")
        assert np.allclose(t[1:-1, 1:-1], np.sqrt(6.0))
        p = dem_array(plane_x(), "tpi")
        assert np.allclose(p[1:-1, 1:-1], 0.0)
        r = dem_array(plane_x(), "roughness")
        assert np.allclose(r[1:-1, 1:-1], 2.0)

    def test_xres_scales_slope(self):
        s = dem_array(plane_x(), "slope", xres=2.0)
        assert np.allclose(s[1:-1, 1:-1], np.degrees(np.arctan(0.5)))


class TestDemTiles:
    def test_distributed_matches_local(self, spark):
        rng = np.random.default_rng(4)
        z = rng.standard_normal((48, 48)).cumsum(axis=0).cumsum(axis=1)
        rows = []
        for ty in range(3):
            for tx in range(3):
                sub = z[ty * 16 : ty * 16 + 16, tx * 16 : tx * 16 + 16]
                rows.append(
                    (tx, ty, 16, 16, bytearray(sub.astype(np.float64).tobytes()))
                )
        tiles = spark.createDataFrame(
            rows, "tile_x int, tile_y int, w int, h int, data binary"
        )
        for kind in ("slope", "hillshade", "tri", "tpi", "roughness"):
            out = dem_tiles(tiles, kind, tile_size=16).collect()
            got = np.zeros((48, 48))
            for t in out:
                sub = np.frombuffer(bytes(t.data), dtype=np.float64).reshape(16, 16)
                got[t.tile_y * 16 : t.tile_y * 16 + 16, t.tile_x * 16 : t.tile_x * 16 + 16] = sub
            local = np.nan_to_num(dem_array(z, kind), nan=-9999.0)
            np.testing.assert_allclose(got, local, atol=1e-9, err_msg=kind)


class TestColorRelief:
    """gdaldem color-relief (ColorAssociation interpolation,
    apps/gdaldem_lib.cpp)."""

    def test_kernel_interpolation_and_clamps(self):
        from gdal_spark.operators.dem import color_relief_array

        ramp = [(0, 0, 0, 255), (100, 0, 255, 0), (200, 255, 0, 0)]
        band = np.array([[-50.0, 0.0, 50.0], [100.0, 150.0, 250.0]])
        rgb = color_relief_array(band, ramp)
        assert rgb.shape == (2, 3, 3) and rgb.dtype == np.uint8
        assert tuple(rgb[0, 0]) == (0, 0, 255)  # below ramp clamps to first
        assert tuple(rgb[1, 2]) == (255, 0, 0)  # above ramp clamps to last
        assert tuple(rgb[1, 0]) == (0, 255, 0)  # exact ramp point
        exp = int(np.round(np.interp(50.0, [0, 100, 200], [0, 255, 0])))
        assert rgb[0, 2, 1] == exp  # linear interpolation
        nanband = np.array([[np.nan]])
        assert tuple(color_relief_array(nanband, ramp)[0, 0]) == (0, 0, 0)

    def test_images_pipeline(self, spark):
        from gdal_spark import codecs
        from gdal_spark.operators.dem import color_relief_array, color_relief_images

        z = (np.arange(256, dtype=np.uint8).reshape(16, 16))
        row = ("c1", bytearray(codecs.encode_png(z)), "png")
        df = spark.createDataFrame([row], "image_id string, bytes binary, fmt string")
        ramp = [(0, 0, 0, 255), (128, 0, 255, 0), (255, 255, 0, 0)]
        out = color_relief_images(df, ramp).collect()
        assert len(out) == 1
        rgb = codecs.decode_png(bytes(out[0]["bytes"]))
        np.testing.assert_array_equal(rgb, color_relief_array(z.astype(float), ramp))
