"""UTM (EPSG:326xx/327xx) transverse Mercator vs independent oracle.

Krueger-series implementation (gdal_spark.proj) validated against the
classical Snyder series — two independent formulations agreeing to
sub-mm — plus exact invariants (central meridian, k0, round trips).
"""

import numpy as np
import pytest

from gdal_spark.operators.warp import geo_transform_points
from gdal_spark.proj import lonlat_to_utm, utm_to_lonlat, utm_zone_params


def snyder_utm(lon, lat, lon0):
    a = 6378137.0
    f = 1 / 298.257223563
    k0 = 0.9996
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    A = np.cos(phi) * lam
    e4, e6 = e2 * e2, e2 ** 3
    M = a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )
    x = k0 * N * (A + (1 - T + C) * A**3 / 6
                  + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A**5 / 120) + 500000
    y = k0 * (M + N * np.tan(phi) * (A * A / 2
              + (5 - T + 9 * C + 4 * C * C) * A**4 / 24
              + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A**6 / 720))
    return x, y


class TestUtm:
    def test_central_meridian_invariants(self):
        e, n = lonlat_to_utm(np.array([3.0]), np.array([0.0]), 32631)
        assert e[0] == pytest.approx(500000.0, abs=1e-6)
        assert n[0] == pytest.approx(0.0, abs=1e-6)

    def test_k0_scale_at_central_meridian(self):
        e1, n1 = lonlat_to_utm(np.array([3.0]), np.array([45.0]), 32631)
        e2_, n2 = lonlat_to_utm(np.array([3.0]), np.array([45.001]), 32631)
        a, f = 6378137.0, 1 / 298.257223563
        ecc2 = f * (2 - f)
        lat_r = np.radians(45.0005)
        M = a * (1 - ecc2) / (1 - ecc2 * np.sin(lat_r) ** 2) ** 1.5
        ds = M * np.radians(0.001)
        assert (n2[0] - n1[0]) / ds == pytest.approx(0.9996, abs=1e-7)

    def test_matches_independent_snyder_series(self):
        cases = [(7.0, 50.0, 32632), (5.9, 49.0, 32632),
                 (0.5, -35.0, 32631), (8.99, 0.01, 32632)]
        for lon, lat, srid in cases:
            lon0, _n0 = utm_zone_params(srid)
            e, n = lonlat_to_utm(np.array([lon]), np.array([lat]), srid)
            xs, ys = snyder_utm(lon, lat, lon0)
            assert abs(e[0] - xs) < 0.002  # 2 mm
            assert abs(n[0] - ys) < 0.002

    def test_round_trip_full_zone(self):
        rng = np.random.default_rng(1)
        lon = rng.uniform(0.5, 5.5, 500)
        lat = rng.uniform(-80, 84, 500)
        e, n = lonlat_to_utm(lon, lat, 32631)
        lon2, lat2 = utm_to_lonlat(e, n, 32631)
        np.testing.assert_allclose(lon2, lon, atol=1e-10)
        np.testing.assert_allclose(lat2, lat, atol=1e-10)

    def test_southern_false_northing(self):
        e, n = lonlat_to_utm(np.array([3.0]), np.array([-10.0]), 32731)
        assert 0 < n[0] < 10000000.0
        lo, la = utm_to_lonlat(e, n, 32731)
        assert lo[0] == pytest.approx(3.0, abs=1e-10)
        assert la[0] == pytest.approx(-10.0, abs=1e-10)

    def test_transform_chain_utm_to_mercator(self):
        # utm -> 3857 composes via 4326
        e, n = lonlat_to_utm(np.array([7.0]), np.array([50.0]), 32632)
        mx, my = geo_transform_points(e, n, 32632, 3857)
        lon, lat = geo_transform_points(mx, my, 3857, 4326)
        assert lon[0] == pytest.approx(7.0, abs=1e-9)
        assert lat[0] == pytest.approx(50.0, abs=1e-9)

    def test_warp_from_utm_image(self, spark):
        """End-to-end: an image georeferenced in UTM warps to 3857."""
        from gdal_spark import codecs as C
        from gdal_spark.operators.warp import warp_images

        arr = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
        # 64x64 px, 100 m pixels, origin at E=480000 N=5520000 zone 32
        gt = (480000.0, 100.0, 0.0, 5520000.0, 0.0, -100.0)
        from gdal_spark.fixtures import footprint_meters

        row = ("u1", bytearray(C.encode_png(arr)), 64, 64, "png", "cap", 0,
               *gt, 32632, 0.0, 0.0, 0.0, 0.0)
        sch = ("image_id string, bytes binary, w int, h int, fmt string, "
               "caption string, phash long, gt0 double, gt1 double, gt2 double, "
               "gt3 double, gt4 double, gt5 double, srid int, minx double, "
               "miny double, maxx double, maxy double")
        df = spark.createDataFrame([row], sch)
        out = warp_images(df, 3857, resampling="bilinear").collect()[0]
        assert out.srid == 3857 and out.caption == "cap"
        # footprint should sit near lon ~8.7E, lat ~49.8N in mercator
        from gdal_spark.grid import MercatorGrid

        merc = MercatorGrid()
        lat, lon = merc.meters_to_latlon(
            (out.minx + out.maxx) / 2, (out.miny + out.maxy) / 2
        )
        assert 8.0 < lon < 9.5 and 49.0 < lat < 50.5


class TestLCC:
    """Lambert Conformal Conic 2SP (EPSG 9802; Snyder PP-1395 pp.107-109)."""

    def test_paris_lambert93(self):
        """Known coordinate: Paris in RGF93/Lambert-93 (EPSG:2154)."""
        from gdal_spark.proj import lonlat_to_lcc

        e, n = lonlat_to_lcc(2.3522, 48.8566, 2154)
        # published Lambert-93 coordinates of central Paris
        assert float(e) == pytest.approx(652469.0, abs=50.0)
        assert float(n) == pytest.approx(6862035.0, abs=50.0)

    def test_roundtrip_all_systems(self):
        from gdal_spark.proj import LCC_PARAMS, lcc_to_lonlat, lonlat_to_lcc

        spans = {2154: (-4, 9, 42, 51), 3978: (-140, -50, 42, 83),
                 3034: (-10, 30, 35, 70)}
        for srid, (lo0, lo1, la0, la1) in spans.items():
            LON, LAT = np.meshgrid(np.linspace(lo0, lo1, 25),
                                   np.linspace(la0, la1, 25))
            E, N = lonlat_to_lcc(LON, LAT, srid)
            lon, lat = lcc_to_lonlat(E, N, srid)
            assert np.abs(lon - LON).max() < 1e-9, srid
            assert np.abs(lat - LAT).max() < 1e-9, srid

    def test_unit_scale_at_standard_parallels(self):
        """The defining property of 2SP conic: true scale along both
        standard parallels, k<1 between them, k>1 outside — checked by
        finite differences against the ellipsoidal parallel radius."""
        from gdal_spark.proj import LCC, LCC_PARAMS

        prm = LCC_PARAMS[2154]
        p = LCC(**prm)
        e2 = p.e**2

        def scale(phi_deg):
            dl = 1e-4
            e1, n1 = p.forward(3.0, phi_deg)
            e2_, n2 = p.forward(3.0 + dl, phi_deg)
            dist = float(np.hypot(e2_ - e1, n2 - n1))
            s = np.sin(np.radians(phi_deg))
            nu = prm["a"] / np.sqrt(1 - e2 * s * s)
            true = np.radians(dl) * nu * np.cos(np.radians(phi_deg))
            return dist / float(true)

        assert scale(44.0) == pytest.approx(1.0, abs=1e-7)
        assert scale(49.0) == pytest.approx(1.0, abs=1e-7)
        assert scale(46.5) < 1.0
        assert scale(42.0) > 1.0 and scale(51.0) > 1.0

    def test_transform_chain_lcc(self):
        """geo_transform_points composes LCC <-> 3857 via 4326."""
        from gdal_spark.operators.warp import geo_transform_points

        x, y = geo_transform_points(
            np.array([2.3522]), np.array([48.8566]), 4326, 2154
        )
        assert float(x[0]) == pytest.approx(652469.0, abs=50.0)
        mx, my = geo_transform_points(x, y, 2154, 3857)
        lon, lat = geo_transform_points(mx, my, 3857, 4326)
        assert float(lon[0]) == pytest.approx(2.3522, abs=1e-6)
        assert float(lat[0]) == pytest.approx(48.8566, abs=1e-6)

class TestAEA:
    """Albers Equal-Area Conic (EPSG 9822; Snyder PP-1395 pp.98-103)."""

    def test_false_origin_maps_to_zero(self):
        from gdal_spark.proj import lonlat_to_aea

        e, n = lonlat_to_aea(-96.0, 23.0, 5070)   # Conus Albers origin
        assert abs(float(e)) < 1e-6 and abs(float(n)) < 1e-6
        e, n = lonlat_to_aea(132.0, 0.0, 3577)    # Australian Albers origin
        assert abs(float(e)) < 1e-6 and abs(float(n)) < 1e-6

    def test_roundtrip_all_systems(self):
        from gdal_spark.proj import aea_to_lonlat, lonlat_to_aea

        spans = {5070: (-125, -66, 24, 50), 3577: (110, 155, -45, -9)}
        for srid, (lo0, lo1, la0, la1) in spans.items():
            LON, LAT = np.meshgrid(np.linspace(lo0, lo1, 25),
                                   np.linspace(la0, la1, 25))
            E, N = lonlat_to_aea(LON, LAT, srid)
            lon, lat = aea_to_lonlat(E, N, srid)
            assert np.abs(lon - LON).max() < 1e-9, srid
            assert np.abs(lat - LAT).max() < 1e-9, srid

    def test_equal_area_property(self):
        """The defining property: the Jacobian determinant of the
        forward map equals the ellipsoidal area element M*N*cos(phi)
        everywhere (not just at the standard parallels) — checked by
        central finite differences on a CONUS grid."""
        from gdal_spark.proj import AEA, AEA_PARAMS

        prm = AEA_PARAMS[5070]
        p = AEA(**prm)
        e2 = p.e2
        a = prm["a"]
        d = 1e-5
        for lon in (-120.0, -96.0, -75.0):
            for lat in (26.0, 37.5, 48.0):
                ex1, nx1 = p.forward(lon - d, lat)
                ex2, nx2 = p.forward(lon + d, lat)
                ey1, ny1 = p.forward(lon, lat - d)
                ey2, ny2 = p.forward(lon, lat + d)
                dd = np.radians(2 * d)
                jac = abs(
                    (ex2 - ex1) * (ny2 - ny1) - (ey2 - ey1) * (nx2 - nx1)
                ) / (dd * dd)
                s = np.sin(np.radians(lat))
                bigm = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
                bign = a / np.sqrt(1 - e2 * s * s)
                true = bigm * bign * np.cos(np.radians(lat))
                assert jac == pytest.approx(true, rel=1e-6), (lon, lat)

    def test_unit_scale_along_standard_parallels(self):
        """k=1 along both standard parallels (29.5N, 45.5N for 5070)."""
        from gdal_spark.proj import AEA, AEA_PARAMS

        prm = AEA_PARAMS[5070]
        p = AEA(**prm)
        e2 = p.e2

        def scale(phi_deg):
            dl = 1e-4
            e1, n1 = p.forward(-96.0, phi_deg)
            e2_, n2 = p.forward(-96.0 + dl, phi_deg)
            dist = float(np.hypot(e2_ - e1, n2 - n1))
            s = np.sin(np.radians(phi_deg))
            nu = prm["a"] / np.sqrt(1 - e2 * s * s)
            true = np.radians(dl) * nu * np.cos(np.radians(phi_deg))
            return dist / float(true)

        assert scale(29.5) == pytest.approx(1.0, abs=1e-7)
        assert scale(45.5) == pytest.approx(1.0, abs=1e-7)
        assert scale(37.5) < 1.0
        assert scale(25.0) > 1.0 and scale(49.0) > 1.0

    def test_transform_chain_aea(self):
        """geo_transform_points composes AEA <-> 3857 via 4326."""
        from gdal_spark.operators.warp import geo_transform_points

        x, y = geo_transform_points(
            np.array([-104.99]), np.array([39.74]), 4326, 5070
        )
        mx, my = geo_transform_points(x, y, 5070, 3857)
        lon, lat = geo_transform_points(mx, my, 3857, 4326)
        assert float(lon[0]) == pytest.approx(-104.99, abs=1e-6)
        assert float(lat[0]) == pytest.approx(39.74, abs=1e-6)


class TestPS:
    """Polar Stereographic variant B (EPSG 9829; Snyder pp.160-162)."""

    def test_epsg_guidance_worked_example(self):
        """EPSG Guidance Note 7-2, method 9829 example (EPSG:3032):
        75S 120E -> E 7255380.79, N 7053389.56."""
        from gdal_spark.proj import lonlat_to_ps

        e, n = lonlat_to_ps(120.0, -75.0, 3032)
        assert float(e) == pytest.approx(7255380.79, abs=0.01)
        assert float(n) == pytest.approx(7053389.56, abs=0.01)

    def test_pole_maps_to_origin(self):
        from gdal_spark.proj import lonlat_to_ps

        for srid, plat in ((3413, 90.0), (3031, -90.0)):
            e, n = lonlat_to_ps(0.0, plat, srid)
            assert float(e) == pytest.approx(0.0, abs=1e-6)
            assert float(n) == pytest.approx(0.0, abs=1e-6)

    def test_roundtrip_all_systems(self):
        from gdal_spark.proj import PS_PARAMS, lonlat_to_ps, ps_to_lonlat

        spans = {3413: (60.1, 89.9), 3031: (-89.9, -60.1),
                 3032: (-89.9, -60.1)}
        for srid, (la0, la1) in spans.items():
            LON, LAT = np.meshgrid(np.linspace(-179.5, 179.5, 25),
                                   np.linspace(la0, la1, 25))
            E, N = lonlat_to_ps(LON, LAT, srid)
            lon, lat = ps_to_lonlat(E, N, srid)
            dl = (lon - LON + 540.0) % 360.0 - 180.0
            assert np.abs(dl).max() < 1e-9, srid
            assert np.abs(lat - LAT).max() < 1e-9, srid

    def test_unit_scale_at_standard_parallel_and_conformality(self):
        """True scale along lat_ts; k>1 poleward of it, k<1 equatorward
        (stereographic scale grows away from the standard parallel
        toward the projection's far side); meridian scale == parallel
        scale everywhere (conformal)."""
        from gdal_spark.proj import PS, PS_PARAMS

        prm = PS_PARAMS[3413]
        p = PS(**prm)
        e2 = p.e**2

        def scales(lon_deg, phi_deg):
            d = 1e-4
            x0, y0 = p.forward(lon_deg, phi_deg)
            xp, yp = p.forward(lon_deg + d, phi_deg)
            xm, ym = p.forward(lon_deg, phi_deg + d)
            s = np.sin(np.radians(phi_deg))
            nu = prm["a"] / np.sqrt(1 - e2 * s * s)
            rho_m = prm["a"] * (1 - e2) / (1 - e2 * s * s) ** 1.5
            k_par = float(np.hypot(xp - x0, yp - y0)) / (
                np.radians(d) * nu * np.cos(np.radians(phi_deg))
            )
            k_mer = float(np.hypot(xm - x0, ym - y0)) / (np.radians(d) * rho_m)
            return k_par, k_mer

        kp, km = scales(10.0, 70.0)
        assert kp == pytest.approx(1.0, abs=1e-6)
        assert km == pytest.approx(1.0, abs=1e-6)
        kp85, km85 = scales(10.0, 85.0)
        kp60, km60 = scales(10.0, 60.0)
        assert kp85 < 1.0 and kp60 > 1.0
        # rel tol bounded by finite-difference truncation, not the math
        assert kp85 == pytest.approx(km85, rel=1e-6)
        assert kp60 == pytest.approx(km60, rel=1e-6)

    def test_transform_chain_ps(self):
        """geo_transform_points composes PS <-> 3857 via 4326 (north),
        and 3031 <-> 3413 cross-pole via 4326."""
        from gdal_spark.operators.warp import geo_transform_points

        x, y = geo_transform_points(
            np.array([-30.0]), np.array([75.0]), 4326, 3413
        )
        lon, lat = geo_transform_points(x, y, 3413, 4326)
        assert float(lon[0]) == pytest.approx(-30.0, abs=1e-9)
        assert float(lat[0]) == pytest.approx(75.0, abs=1e-9)
        mx, my = geo_transform_points(x, y, 3413, 3857)
        lon2, lat2 = geo_transform_points(mx, my, 3857, 4326)
        assert float(lon2[0]) == pytest.approx(-30.0, abs=1e-6)
        assert float(lat2[0]) == pytest.approx(75.0, abs=1e-6)


class TestLAEA:
    """Lambert Azimuthal Equal-Area (EPSG method 9820, Snyder pp. 187-190)."""

    def test_epsg_worked_example(self):
        # EPSG Guidance Note 7-2, method 9820 worked example (ETRS89 LAEA):
        # 50N 5E -> 3962799.45 E, 2999718.85 N
        from gdal_spark.proj import laea_to_lonlat, lonlat_to_laea

        e, n = lonlat_to_laea(np.array([5.0]), np.array([50.0]), 3035)
        assert abs(e[0] - 3962799.45) < 0.02
        assert abs(n[0] - 2999718.85) < 0.02
        lon, lat = laea_to_lonlat(e, n, 3035)
        assert abs(lon[0] - 5.0) < 1e-9 and abs(lat[0] - 50.0) < 1e-9

    def test_false_origin_and_equal_area(self):
        from gdal_spark.proj import LAEA, LAEA_PARAMS

        t = LAEA(**LAEA_PARAMS[3035])
        e, n = t.forward(10.0, 52.0)
        assert abs(float(e) - 4321000.0) < 1e-6
        assert abs(float(n) - 3210000.0) < 1e-6
        # equal-area: the projected area of a small geodetic quad equals
        # its ellipsoidal area (authalic-sphere quad area) to 1e-9 rel
        lon0, lat0, d = 24.0, 44.0, 0.01
        corners = [(lon0, lat0), (lon0 + d, lat0), (lon0 + d, lat0 + d),
                   (lon0, lat0 + d)]
        xs, ys = zip(*[t.forward(np.array([lo]), np.array([la]))
                       for lo, la in corners])
        xs = [float(x[0]) for x in xs]
        ys = [float(y[0]) for y in ys]
        proj_area = 0.5 * abs(sum(
            xs[i] * ys[(i + 1) % 4] - xs[(i + 1) % 4] * ys[i] for i in range(4)
        ))
        # ellipsoidal quad area via the authalic q (same Snyder 3-12)
        q = t._q(np.radians(np.array([lat0, lat0 + d])))
        a = 6378137.0
        ell_area = (a * a / 2.0) * (q[1] - q[0]) * np.radians(d)
        # tolerance bounded by the straight-edge discretization of the
        # 0.01-degree quad, not by the projection (which is exactly
        # equal-area): O(d^2) ~ 5e-9 here
        assert abs(proj_area / ell_area - 1.0) < 1e-7


class TestEqualEarth:
    """Equal Earth (EPSG:8857, method 1078; Šavrič et al. 2018)."""

    def _t(self):
        from gdal_spark.proj import EQEARTH, EQEARTH_PARAMS

        return EQEARTH(**EQEARTH_PARAMS[8857])

    def test_published_projected_bounds(self):
        # epsg.io/EPSG registry projected bounds for 8857:
        # easting ±17243959.06, northing ±8392927.6 (published to cm) —
        # ground truth independent of this implementation
        t = self._t()
        x, y = t.forward(180.0, 0.0)
        assert abs(float(x) - 17243959.06) < 0.01 and abs(float(y)) < 1e-6
        x, y = t.forward(-180.0, 0.0)
        assert abs(float(x) + 17243959.06) < 0.01
        x, y = t.forward(0.0, 90.0)
        assert abs(float(x)) < 1e-6 and abs(float(y) - 8392927.6) < 0.01
        x, y = t.forward(0.0, -90.0)
        assert abs(float(y) + 8392927.6) < 0.01

    def test_round_trip(self):
        t = self._t()
        rng = np.random.Generator(np.random.PCG64(11))
        lon = rng.uniform(-179.9, 179.9, 3000)
        lat = rng.uniform(-89.9, 89.9, 3000)
        e, n = t.forward(lon, lat)
        lon2, lat2 = t.inverse(e, n)
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-6  # authalic fixed point

    def test_equal_area_jacobian(self):
        # the defining property: |d(x,y)/d(lon,lat)| equals the
        # ellipsoidal area element a²(1-e²)cosφ/(1-e²sin²φ)² everywhere
        t = self._t()
        rng = np.random.Generator(np.random.PCG64(12))
        lon = rng.uniform(-170.0, 170.0, 800)
        lat = rng.uniform(-85.0, 85.0, 800)
        h = 1e-5
        xr, yr = t.forward(lon + h, lat)
        xl, yl = t.forward(lon - h, lat)
        xu, yu = t.forward(lon, lat + h)
        xd, yd = t.forward(lon, lat - h)
        J = ((xr - xl) * (yu - yd) - (xu - xd) * (yr - yl)) / (4.0 * h * h)
        J *= (180.0 / np.pi) ** 2
        phi = np.radians(lat)
        elem = (
            t.a**2 * (1.0 - t.e2) * np.cos(phi)
            / (1.0 - t.e2 * np.sin(phi) ** 2) ** 2
        )
        assert np.abs(J / elem - 1.0).max() < 1e-6

    def test_registry_dispatch(self):
        from gdal_spark.proj import get_transformer

        t = get_transformer(8857)
        assert t is not None
        x, y = t.forward(np.array([12.5]), np.array([41.9]))  # Rome-ish
        lon, lat = t.inverse(x, y)
        assert abs(float(lon[0]) - 12.5) < 1e-9
        assert abs(float(lat[0]) - 41.9) < 1e-6


class TestRegistry:
    """Parameter-driven CRS registry: any-params round-trips, custom
    registration, generic TM == UTM module functions."""

    @pytest.mark.parametrize("family,params,pts", [
        ("lcc", dict(a=6378137.0, rf=298.257222101, phi1=33.0, phi2=45.0,
                     phi0=39.0, lon0=-98.0, e0=123456.0, n0=654321.0),
         [(-100.0, 40.0), (-90.5, 33.3), (-104.25, 48.9)]),
        ("aea", dict(a=6378137.0, rf=298.257223563, phi1=-5.0, phi2=-42.0,
                     phi0=-32.0, lon0=-60.0, e0=5000000.0, n0=10000000.0),
         [(-58.0, -20.0), (-70.0, -45.5), (-45.0, -3.25)]),
        ("laea", dict(a=6378137.0, rf=298.257222101, phi0=-15.0, lon0=135.0,
                      e0=0.0, n0=0.0),
         [(120.0, -30.0), (150.0, 5.0), (135.5, -15.5)]),
        ("ps", dict(a=6378137.0, rf=298.257223563, lat_ts=-80.0, lon0=150.0,
                    e0=300000.0, n0=200000.0),
         [(140.0, -85.0), (0.0, -75.0), (-120.0, -88.8)]),
        ("tm", dict(a=6377563.396, rf=299.3249646, lon0=-2.0,
                    k0=0.9996012717, e0=400000.0, n0=-100000.0),
         [(-1.0, 54.5), (-5.2, 50.1), (1.5, 52.0)]),
    ])
    def test_any_params_roundtrip(self, family, params, pts):
        from gdal_spark.proj import _FAMILIES

        t = _FAMILIES[family](**params)
        for lon, lat in pts:
            e, n = t.forward(np.array([lon]), np.array([lat]))
            lo, la = t.inverse(e, n)
            dlon = (lo[0] - lon + 180.0) % 360.0 - 180.0  # wrap-safe
            assert abs(dlon) < 1e-8 and abs(la[0] - lat) < 1e-8

    def test_register_crs_and_warp_dispatch(self):
        from gdal_spark.operators.warp import geo_transform_points
        from gdal_spark.proj import get_transformer, register_crs

        register_crs(990001, "laea", a=6378137.0, rf=298.257222101,
                     phi0=45.0, lon0=-100.0, e0=0.0, n0=0.0)
        t = get_transformer(990001)
        assert t is not None
        # composed pair through 4326 (registered custom <-> UTM)
        x, y = geo_transform_points(
            np.array([0.0]), np.array([0.0]), 990001, 32614)
        lon, lat = geo_transform_points(x, y, 32614, 4326)
        assert abs(lon[0] + 100.0) < 1e-7 and abs(lat[0] - 45.0) < 1e-7
        with pytest.raises(ValueError):
            register_crs(990002, "nope")

    def test_generic_tm_matches_utm_module(self):
        from gdal_spark.proj import get_transformer, lonlat_to_utm, utm_to_lonlat

        lon = np.array([14.2, 9.01, 17.9])
        lat = np.array([48.1, 60.0, -33.5])
        for srid in (32633, 32733):
            t = get_transformer(srid)
            e1, n1 = t.forward(lon, lat)
            e2, n2 = lonlat_to_utm(lon, lat, srid)
            assert np.array_equal(e1, e2) and np.array_equal(n1, n2)
            lo1, la1 = t.inverse(e1, n1)
            lo2, la2 = utm_to_lonlat(e1, n1, srid)
            assert np.array_equal(lo1, lo2) and np.array_equal(la1, la2)


class TestTMLat0:
    """EPSG method 9807 latitude-of-natural-origin (TM lat0): the
    British National Grid parameter set validated against the published
    OS worked example ('A guide to coordinate systems in Great
    Britain': OSGB36 52deg39'27.2531\"N 1deg43'4.5177\"E ->
    E 651409.903 N 313177.270). The TM-class tests exercise PROJECTION
    math only (inputs are OSGB36 lon/lat); the registered 27700
    transformer additionally composes the OSGB36 Helmert datum shift,
    so its geodetic side is WGS84 (tests/test_datum.py)."""

    LAT = 52 + 39 / 60 + 27.2531 / 3600
    LON = 1 + 43 / 60 + 4.5177 / 3600

    def _tm(self):
        from gdal_spark.proj import TM

        return TM(a=6377563.396, rf=299.3249646, lon0=-2.0,
                  k0=0.9996012717, e0=400000.0, n0=-100000.0, lat0=49.0)

    def test_os_worked_example_forward(self):
        e, n = self._tm().forward(self.LON, self.LAT)
        assert abs(float(e) - 651409.903) < 1e-3
        assert abs(float(n) - 313177.270) < 1e-3

    def test_roundtrip(self):
        import numpy as np

        tm = self._tm()
        rng = np.random.default_rng(3)
        lon = rng.uniform(-7.0, 2.0, 200)
        lat = rng.uniform(50.0, 60.0, 200)
        e, n = tm.forward(lon, lat)
        lo, la = tm.inverse(e, n)
        assert np.allclose(lo, lon, atol=1e-9)
        assert np.allclose(la, lat, atol=1e-9)

    def test_lat0_zero_unchanged(self):
        # lat0=0 must reproduce the plain UTM-style TM exactly
        from gdal_spark.proj import TM

        a = TM(a=6378137.0, rf=298.257223563, lon0=15.0)
        b = TM(a=6378137.0, rf=298.257223563, lon0=15.0, lat0=0.0)
        ea, na = a.forward(16.0, 45.0)
        eb, nb = b.forward(16.0, 45.0)
        assert float(ea) == float(eb) and float(na) == float(nb)

    def test_register_crs_with_lat0(self):
        # the registered 27700 transformer is datum-aware: feeding it the
        # WGS84 equivalent of the OSGB36 worked-example point must land on
        # the published grid coordinates (shift + projection compose)
        from gdal_spark.proj import DATUM_TABLE, get_transformer, register_crs

        register_crs(27700, "tm", a=6377563.396, rf=299.3249646,
                     lon0=-2.0, k0=0.9996012717, e0=400000.0,
                     n0=-100000.0, lat0=49.0)
        lon_w, lat_w = DATUM_TABLE[27700].to_wgs84(self.LON, self.LAT)
        t = get_transformer(27700)
        e, n = t.forward(lon_w, lat_w)
        assert abs(float(e) - 651409.903) < 1e-3
        assert abs(float(n) - 313177.270) < 1e-3


class TestNZTM:
    """EPSG:2193 (NZTM2000) from the default registry — GRS80 TM with
    FE 1.6M / FN 10M, validated against an independent parameterized
    Snyder series."""

    def _snyder_tm(self, lon, lat, lon0, a, rf, k0, fe, fn):
        f = 1.0 / rf
        e2 = f * (2 - f)
        ep2 = e2 / (1 - e2)
        phi = np.radians(lat)
        lam = np.radians(lon - lon0)
        N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        T = np.tan(phi) ** 2
        C = ep2 * np.cos(phi) ** 2
        A = np.cos(phi) * lam
        e4, e6 = e2 * e2, e2 ** 3
        M = a * (
            (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
            - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
            + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
            - (35 * e6 / 3072) * np.sin(6 * phi)
        )
        x = k0 * N * (A + (1 - T + C) * A**3 / 6
                      + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A**5 / 120) + fe
        y = k0 * (M + N * np.tan(phi) * (A * A / 2
                  + (5 - T + 9 * C + 4 * C * C) * A**4 / 24
                  + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A**6 / 720)) + fn
        return x, y

    def test_matches_snyder_over_nz(self):
        from gdal_spark.proj import get_transformer

        t = get_transformer(2193)
        rng = np.random.default_rng(12)
        args = (173.0, 6378137.0, 298.257222101, 0.9996, 1600000.0, 10000000.0)
        # within +-3.5 deg of the central meridian (UTM-zone width, where
        # the truncated Snyder series is itself sub-mm) the two agree
        lon = rng.uniform(169.5, 176.5, 200)
        lat = rng.uniform(-47.5, -34.0, 200)
        e, n = t.forward(lon, lat)
        es, ns = self._snyder_tm(lon, lat, *args)
        assert np.max(np.abs(e - es)) < 1e-3
        assert np.max(np.abs(n - ns)) < 1e-3
        # across the full NZTM extent (+-7 deg) Snyder's OWN A^5/A^6
        # truncation grows to cm; Krueger order-6 stays inside it
        lon = rng.uniform(166.0, 179.9, 200)
        e, n = t.forward(lon, lat)
        es, ns = self._snyder_tm(lon, lat, *args)
        assert np.max(np.abs(e - es)) < 0.05
        assert np.max(np.abs(n - ns)) < 0.05

    def test_roundtrip_and_origin(self):
        from gdal_spark.proj import get_transformer

        t = get_transformer(2193)
        e, n = t.forward(173.0, 0.0)
        assert abs(float(e) - 1600000.0) < 1e-6
        assert abs(float(n) - 10000000.0) < 1e-6
        rng = np.random.default_rng(13)
        lon = rng.uniform(166.0, 179.0, 100)
        lat = rng.uniform(-47.5, -34.0, 100)
        lo, la = t.inverse(*t.forward(lon, lat))
        assert np.allclose(lo, lon, atol=1e-9)
        assert np.allclose(la, lat, atol=1e-9)

    def test_wellington_plausible(self):
        # Wellington (~174.78 E, 41.29 S) lands in the published NZTM
        # coordinate neighbourhood (E ~1.75e6, N ~5.43e6)
        from gdal_spark.proj import get_transformer

        e, n = get_transformer(2193).forward(174.78, -41.29)
        assert 1.70e6 < float(e) < 1.80e6
        assert 5.40e6 < float(n) < 5.46e6
