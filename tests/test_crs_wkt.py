"""WKT1 CRS import + export: parsed parameter sets must reproduce the
built-in registry transformers exactly, and exported PROJCS strings
must re-import to the identical transformer (the exportToWkt /
importFromWkt round trip)."""

import numpy as np
import pytest

from gdal_spark.crs_wkt import (
    export_wkt,
    parse_wkt_crs,
    register_crs_from_wkt,
)
from gdal_spark.proj import get_transformer

WKT_32633 = """PROJCS["WGS 84 / UTM zone 33N",
    GEOGCS["WGS 84", DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["latitude_of_origin",0],
    PARAMETER["central_meridian",15],
    PARAMETER["scale_factor",0.9996],
    PARAMETER["false_easting",500000],
    PARAMETER["false_northing",0],
    UNIT["metre",1]]"""

WKT_2154 = """PROJCS["RGF93 v1 / Lambert-93",
    GEOGCS["RGF93 v1", DATUM["RGF93",
        SPHEROID["GRS 1980",6378137,298.257222101]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Lambert_Conformal_Conic_2SP"],
    PARAMETER["latitude_of_origin",46.5],
    PARAMETER["central_meridian",3],
    PARAMETER["standard_parallel_1",49],
    PARAMETER["standard_parallel_2",44],
    PARAMETER["false_easting",700000],
    PARAMETER["false_northing",6600000],
    UNIT["metre",1]]"""

WKT_5070 = """PROJCS["NAD83 / Conus Albers",
    GEOGCS["NAD83", DATUM["North_American_Datum_1983",
        SPHEROID["GRS 1980",6378137,298.257222101]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Albers_Conic_Equal_Area"],
    PARAMETER["latitude_of_center",23],
    PARAMETER["longitude_of_center",-96],
    PARAMETER["standard_parallel_1",29.5],
    PARAMETER["standard_parallel_2",45.5],
    PARAMETER["false_easting",0],
    PARAMETER["false_northing",0],
    UNIT["metre",1]]"""

WKT_3035 = """PROJCS["ETRS89-extended / LAEA Europe",
    GEOGCS["ETRS89", DATUM["European_Terrestrial_Reference_System_1989",
        SPHEROID["GRS 1980",6378137,298.257222101]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Lambert_Azimuthal_Equal_Area"],
    PARAMETER["latitude_of_center",52],
    PARAMETER["longitude_of_center",10],
    PARAMETER["false_easting",4321000],
    PARAMETER["false_northing",3210000],
    UNIT["metre",1]]"""

WKT_3413 = """PROJCS["WGS 84 / NSIDC Sea Ice Polar Stereographic North",
    GEOGCS["WGS 84", DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],
        PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
    PROJECTION["Polar_Stereographic"],
    PARAMETER["latitude_of_origin",70],
    PARAMETER["central_meridian",-45],
    PARAMETER["false_easting",0],
    PARAMETER["false_northing",0],
    UNIT["metre",1]]"""


class TestParseWkt:
    @pytest.mark.parametrize(
        "wkt,builtin,points",
        [
            (WKT_32633, 32633, [(14.0, 48.0), (16.5, 61.0)]),
            (WKT_2154, 2154, [(3.0, 46.5), (-1.5, 43.2), (7.8, 49.9)]),
            (WKT_5070, 5070, [(-96.0, 23.0), (-120.0, 49.0), (-75.0, 25.0)]),
            (WKT_3035, 3035, [(10.0, 52.0), (-9.0, 38.0), (30.0, 60.0)]),
            (WKT_3413, 3413, [(-45.0, 70.0), (10.0, 80.0), (-100.0, 65.0)]),
        ],
    )
    def test_matches_builtin_transformer(self, wkt, builtin, points):
        family, params = parse_wkt_crs(wkt)
        register_crs_from_wkt(900000 + builtin, wkt)
        t_wkt = get_transformer(900000 + builtin)
        t_ref = get_transformer(builtin)
        lon = np.array([p[0] for p in points])
        lat = np.array([p[1] for p in points])
        ew, nw = t_wkt.forward(lon, lat)
        er, nr = t_ref.forward(lon, lat)
        assert np.allclose(ew, er, atol=1e-9)
        assert np.allclose(nw, nr, atol=1e-9)

    def test_tm_lat0_wkt(self):
        # British National Grid projection (OSGB36 datum caveat applies)
        wkt = """PROJCS["OSGB36 / British National Grid",
            GEOGCS["OSGB36", DATUM["OSGB_1936",
                SPHEROID["Airy 1830",6377563.396,299.3249646]],
                PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
            PROJECTION["Transverse_Mercator"],
            PARAMETER["latitude_of_origin",49],
            PARAMETER["central_meridian",-2],
            PARAMETER["scale_factor",0.9996012717],
            PARAMETER["false_easting",400000],
            PARAMETER["false_northing",-100000],
            UNIT["metre",1]]"""
        family, params = parse_wkt_crs(wkt)
        assert family == "tm" and params["lat0"] == 49.0
        register_crs_from_wkt(927700, wkt)
        t = get_transformer(927700)
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        e, n = t.forward(lon, lat)
        assert abs(float(e) - 651409.903) < 1e-3
        assert abs(float(n) - 313177.270) < 1e-3

    def test_rejects_unknown_method_and_units(self):
        bad_method = WKT_32633.replace("Transverse_Mercator", "Robinson")
        with pytest.raises(ValueError, match="unsupported projection"):
            parse_wkt_crs(bad_method)
        bad_unit = WKT_32633.replace('UNIT["metre",1]', 'UNIT["US survey foot",0.3048]')
        with pytest.raises(ValueError, match="UNIT"):
            parse_wkt_crs(bad_unit)
        with pytest.raises(ValueError, match="PROJCS"):
            parse_wkt_crs('GEOGCS["WGS 84"]')

    def test_missing_parameter(self):
        wkt = WKT_2154.replace('PARAMETER["standard_parallel_2",44],', "")
        with pytest.raises(ValueError, match="phi2"):
            parse_wkt_crs(wkt)


# family-appropriate probe points for round-trip transformer equality
_PROBES = {
    32633: [(14.0, 48.0), (16.5, 61.0)],
    32719: [(-70.0, -30.0), (-68.0, -45.0)],
    2154: [(3.0, 46.5), (-1.5, 43.2), (7.8, 49.9)],
    5070: [(-96.0, 23.0), (-120.0, 49.0)],
    3413: [(-45.0, 70.0), (10.0, 80.0)],
    3031: [(0.0, -71.0), (100.0, -80.0)],
    3035: [(10.0, 52.0), (-9.0, 38.0)],
    2193: [(173.0, -41.0), (176.0, -38.0)],
    8857: [(0.0, 0.0), (120.0, 45.0), (-60.0, -30.0)],
}


class TestExportWkt:
    @pytest.mark.parametrize("srid", sorted(_PROBES))
    def test_export_reimport_round_trip(self, srid):
        wkt = export_wkt(srid)
        family, params = parse_wkt_crs(wkt)
        register_crs_from_wkt(910000 + srid, wkt)
        t_rt = get_transformer(910000 + srid)
        t_ref = get_transformer(srid)
        lon = np.array([p[0] for p in _PROBES[srid]])
        lat = np.array([p[1] for p in _PROBES[srid]])
        er, nr = t_ref.forward(lon, lat)
        ew, nw = t_rt.forward(lon, lat)
        assert np.allclose(ew, er, atol=1e-9)
        assert np.allclose(nw, nr, atol=1e-9)

    def test_wkt_shape_and_names(self):
        wkt = export_wkt(32633)
        assert wkt.startswith('PROJCS["EPSG:32633"')
        assert 'PROJECTION["Transverse_Mercator"]' in wkt
        assert 'PARAMETER["central_meridian",15]' in wkt
        assert 'SPHEROID["WGS 84",6378137,298.257223563]' in wkt
        wkt = export_wkt(2154, name="Lambert-93")
        assert 'PROJCS["Lambert-93"' in wkt
        assert 'SPHEROID["GRS 1980"' in wkt
        assert 'PARAMETER["standard_parallel_1",44]' in wkt
        assert 'PARAMETER["standard_parallel_2",49]' in wkt

    def test_unknown_srid_rejected(self):
        with pytest.raises(ValueError, match="not a registered"):
            export_wkt(4326)
        with pytest.raises(ValueError, match="not a registered"):
            export_wkt(99999)

    def test_eqearth_wkt_round_trip(self):
        wkt = export_wkt(8857)
        assert 'PROJECTION["Equal_Earth"]' in wkt
        family, params = parse_wkt_crs(wkt)
        assert family == "eqearth" and params["lon0"] == 0.0
