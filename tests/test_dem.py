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


class TestHillshadeVariants:
    """gdaldem -combined / -multidirectional / -igor semantics
    (apps/gdaldem_lib.cpp:1137,1234,940) vs a literal per-pixel
    re-implementation of the reference formulas."""

    @staticmethod
    def _brute(z, kind, xres=1.0, yres=1.0, zf_in=1.0, az_deg=315.0,
               alt_deg=45.0):
        import math

        h, w = z.shape
        out = np.full((h, w), np.nan)
        zf = zf_in / 8.0
        sin_alt, cos_alt = math.sin(math.radians(alt_deg)), math.cos(
            math.radians(alt_deg))
        az = math.radians(az_deg)
        for r in range(1, h - 1):
            for c in range(1, w - 1):
                win = [z[r - 1, c - 1], z[r - 1, c], z[r - 1, c + 1],
                       z[r, c - 1], z[r, c], z[r, c + 1],
                       z[r + 1, c - 1], z[r + 1, c], z[r + 1, c + 1]]
                X = ((win[0] + 2 * win[3] + win[6])
                     - (win[2] + 2 * win[5] + win[8])) / xres
                Y = ((win[6] + 2 * win[7] + win[8])
                     - (win[0] + 2 * win[1] + win[2])) / (-yres)
                xxyy = X * X + Y * Y
                if kind == "hillshade_combined":
                    slope_sq = zf * zf * xxyy
                    shade = (sin_alt - (Y * math.cos(az) - X * math.sin(az))
                             * cos_alt * zf) / math.sqrt(1 + slope_sq)
                    cang = 1 - math.acos(max(-1.0, min(1.0, shade))) \
                        * math.atan(math.sqrt(slope_sq)) / ((math.pi ** 2) / 4)
                    out[r, c] = round(1.0 if cang <= 0 else 1 + 254 * cang)
                elif kind == "hillshade_multidirectional":
                    if xxyy == 0:
                        out[r, c] = round(1 + 254 * sin_alt)
                        continue
                    cz = cos_alt * zf
                    c225 = math.cos(math.radians(225)) * cz
                    v = [max(0.0, sin_alt + (X - Y) * c225),
                         max(0.0, sin_alt - X * cz),
                         max(0.0, sin_alt + (X + Y) * c225),
                         max(0.0, sin_alt - Y * cz)]
                    wts = [0.5 * xxyy - X * Y, X * X, None, Y * Y]
                    wts[2] = xxyy - wts[0]
                    cang = sum(a * b for a, b in zip(wts, v)) / xxyy \
                        / math.sqrt(1 + zf * zf * xxyy)
                    out[r, c] = round(1 + 127 * cang)
                elif kind == "hillshade_igor":
                    slope_deg = math.degrees(math.atan(math.sqrt(xxyy) * zf))
                    dxr = (win[2] + 2 * win[5] + win[8]) - (
                        win[0] + 2 * win[3] + win[6])
                    dyr = (win[6] + 2 * win[7] + win[8]) - (
                        win[0] + 2 * win[1] + win[2])
                    aspect = math.atan2(dyr, -dxr)
                    tgt = math.pi * 1.5 - az
                    d = abs(aspect % (2 * math.pi) - tgt % (2 * math.pi))
                    if d > math.pi:
                        d = 2 * math.pi - d
                    out[r, c] = round(255 * (1 - (slope_deg / 90)
                                             * (1 - d / math.pi)))
        return out

    def test_matches_per_pixel_reference_formulas(self):
        rng = np.random.default_rng(7)
        z = rng.standard_normal((20, 24)).cumsum(axis=0).cumsum(axis=1) * 3
        for kind in ("hillshade_combined", "hillshade_multidirectional",
                     "hillshade_igor"):
            got = dem_array(z, kind, xres=2.0, yres=1.5, z_factor=2.0,
                            azimuth=290.0, altitude=40.0)
            want = self._brute(z, kind, xres=2.0, yres=1.5, zf_in=2.0,
                               az_deg=290.0, alt_deg=40.0)
            inner = np.s_[1:-1, 1:-1]
            np.testing.assert_allclose(got[inner], want[inner], atol=0,
                                       err_msg=kind)

    def test_flat_surface_values(self):
        z = np.full((8, 8), 100.0)
        md = dem_array(z, "hillshade_multidirectional")
        cb = dem_array(z, "hillshade_combined")
        ig = dem_array(z, "hillshade_igor")
        assert md[2, 2] == round(1 + 254 * np.sin(np.radians(45.0)))
        assert cb[2, 2] == 255.0  # atan(0) kills the slope term
        assert ig[2, 2] == 255.0  # zero slope strength -> no shadow

    def test_igor_light_alignment(self):
        """A slope facing the 315-deg light is brighter than one facing
        away; altitude is irrelevant for igor."""
        y, x = np.mgrid[0:16, 0:16]
        toward = ((x + y) * 2.0).astype(np.float64)  # aspect along the light
        away = -toward
        a = dem_array(toward, "hillshade_igor")[8, 8]
        b = dem_array(away, "hillshade_igor")[8, 8]
        assert a > b
        assert dem_array(toward, "hillshade_igor", altitude=10.0)[8, 8] == a

    def test_tiled_matches_local_for_variants(self, spark):
        from gdal_spark.operators.dem import dem_tiles

        rng = np.random.default_rng(11)
        z = rng.standard_normal((32, 32)).cumsum(axis=0).cumsum(axis=1)
        rows = []
        for ty in range(2):
            for tx in range(2):
                sub = z[ty * 16: ty * 16 + 16, tx * 16: tx * 16 + 16]
                rows.append((tx, ty, 16, 16,
                             bytearray(sub.astype(np.float64).tobytes())))
        tiles = spark.createDataFrame(
            rows, "tile_x int, tile_y int, w int, h int, data binary"
        )
        for kind in ("hillshade_combined", "hillshade_multidirectional",
                     "hillshade_igor"):
            out = dem_tiles(tiles, kind, tile_size=16).collect()
            got = np.zeros((32, 32))
            for t in out:
                sub = np.frombuffer(bytes(t.data), dtype=np.float64
                                    ).reshape(16, 16)
                got[t.tile_y * 16: t.tile_y * 16 + 16,
                    t.tile_x * 16: t.tile_x * 16 + 16] = sub
            local = np.nan_to_num(dem_array(z, kind), nan=-9999.0)
            np.testing.assert_allclose(got, local, atol=1e-9, err_msg=kind)


class TestZevenbergenThorneAndPercent:
    """gdaldem -alg ZevenbergenThorne and slope -p."""

    def test_both_algs_exact_on_plane(self):
        import numpy as np

        from gdal_spark.operators.dem import dem_array

        y, x = np.mgrid[0:12, 0:12]
        z = 3.0 * x + 4.0 * y  # gradient magnitude 5
        for alg in ("horn", "zevenbergen_thorne"):
            s = dem_array(z, "slope", xres=1.0, yres=1.0, alg=alg)
            assert np.allclose(
                s[1:-1, 1:-1], np.degrees(np.arctan(5.0)), atol=1e-9
            )
            p = dem_array(z, "slope", alg=alg, slope_format="percent")
            assert np.allclose(p[1:-1, 1:-1], 500.0, atol=1e-9)

    def test_algs_differ_on_curvature(self):
        import numpy as np

        from gdal_spark.operators.dem import dem_array

        rng = np.random.default_rng(2)
        z = rng.normal(size=(16, 16)).cumsum(axis=0).cumsum(axis=1)
        h = dem_array(z, "slope", alg="horn")
        zt = dem_array(z, "slope", alg="zevenbergen_thorne")
        assert not np.allclose(h[1:-1, 1:-1], zt[1:-1, 1:-1])

    def test_percent_is_tan_of_degrees(self):
        import numpy as np

        from gdal_spark.operators.dem import dem_array

        rng = np.random.default_rng(5)
        z = rng.normal(size=(10, 10)) * 4
        d = dem_array(z, "slope")
        p = dem_array(z, "slope", slope_format="percent")
        m = ~np.isnan(d)
        assert np.allclose(p[m], 100.0 * np.tan(np.radians(d[m])), atol=1e-9)

    def test_zt_hillshade_aspect_run(self):
        import numpy as np

        from gdal_spark.operators.dem import dem_array

        rng = np.random.default_rng(6)
        z = rng.normal(size=(10, 10)).cumsum(axis=1)
        hs = dem_array(z, "hillshade", alg="zevenbergen_thorne")
        asp = dem_array(z, "aspect", alg="zevenbergen_thorne")
        inner = hs[1:-1, 1:-1]
        assert np.all((inner >= 1.0) & (inner <= 255.0))
        a = asp[1:-1, 1:-1]
        assert np.nanmax(a) <= 360.0 and np.nanmin(a) >= 0.0

    def test_bad_alg_raises(self):
        import numpy as np
        import pytest

        from gdal_spark.operators.dem import dem_array

        with pytest.raises(ValueError):
            dem_array(np.zeros((5, 5)), "slope", alg="bicubic")
