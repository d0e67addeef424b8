"""WKT1 CRS import — the OGRSpatialReference::importFromWkt workflow
(ogr/ogrspatialreference.cpp) for the projection families this engine
implements: a PROJCS[...] string (the form data catalogs and sidecar
files carry) parses into the registry's (family, params) shape, so
``register_crs_from_wkt(srid, wkt)`` makes any supported parameter set
usable by warp/footprint/vector reprojection without hand-copying
parameters.

Scope (documented, not a full OGC 01-009 implementation):
- ellipsoid from SPHEROID[name, a, 1/f];
- PROJECTION methods: Transverse_Mercator,
  Lambert_Conformal_Conic_2SP, Albers_Conic_Equal_Area,
  Polar_Stereographic, Lambert_Azimuthal_Equal_Area;
- PARAMETER names per the GDAL WKT1 conventions (SRS_PP_*);
- degree-based GEOGCS and metre-based projected UNIT assumed (the
  overwhelmingly common case; anything else raises rather than
  silently misprojecting);
- a ``TOWGS84[dx,dy,dz[,rx,ry,rz,ds]]`` clause (the WKT1 carrier for
  the EPSG position-vector Helmert parameters) registers a datum shift
  via proj.register_datum, so the imported CRS converses in WGS84
  lon/lat like every registry entry; without the clause the GEOGCS
  datum is assumed WGS84-class, exactly like the registry's own
  non-shifted entries.
"""

from __future__ import annotations

import re

from .proj import register_crs, register_datum

_METHOD_FAMILY = {
    "transverse_mercator": "tm",
    "lambert_conformal_conic_2sp": "lcc",
    "albers_conic_equal_area": "aea",
    "polar_stereographic": "ps",
    "lambert_azimuthal_equal_area": "laea",
    "equal_earth": "eqearth",
}

# WKT1 PARAMETER name -> engine kwarg, per family
_PARAM_MAP = {
    "tm": {
        "central_meridian": "lon0",
        "scale_factor": "k0",
        "false_easting": "e0",
        "false_northing": "n0",
        "latitude_of_origin": "lat0",
    },
    "lcc": {
        "standard_parallel_1": "phi1",
        "standard_parallel_2": "phi2",
        "latitude_of_origin": "phi0",
        "central_meridian": "lon0",
        "false_easting": "e0",
        "false_northing": "n0",
    },
    "aea": {
        "standard_parallel_1": "phi1",
        "standard_parallel_2": "phi2",
        "latitude_of_center": "phi0",
        "latitude_of_origin": "phi0",
        "longitude_of_center": "lon0",
        "central_meridian": "lon0",
        "false_easting": "e0",
        "false_northing": "n0",
    },
    "ps": {
        "latitude_of_origin": "lat_ts",
        "standard_parallel_1": "lat_ts",
        "central_meridian": "lon0",
        "straight_vertical_longitude_from_pole": "lon0",
        "false_easting": "e0",
        "false_northing": "n0",
    },
    "laea": {
        "latitude_of_center": "phi0",
        "latitude_of_origin": "phi0",
        "longitude_of_center": "lon0",
        "central_meridian": "lon0",
        "false_easting": "e0",
        "false_northing": "n0",
    },
    "eqearth": {
        "longitude_of_center": "lon0",
        "central_meridian": "lon0",
        "false_easting": "e0",
        "false_northing": "n0",
    },
}

# kwargs the family constructors REQUIRE (no engine default)
_REQUIRED = {
    "tm": ("lon0",),
    "lcc": ("phi1", "phi2", "phi0", "lon0", "e0", "n0"),
    "aea": ("phi1", "phi2", "phi0", "lon0", "e0", "n0"),
    "ps": ("lat_ts", "lon0", "e0", "n0"),
    "laea": ("phi0", "lon0", "e0", "n0"),
    "eqearth": ("lon0",),
}
_DEFAULTS = {
    "lcc": {"e0": 0.0, "n0": 0.0},
    "aea": {"e0": 0.0, "n0": 0.0},
    "ps": {"e0": 0.0, "n0": 0.0},
    "laea": {"e0": 0.0, "n0": 0.0},
    "eqearth": {"e0": 0.0, "n0": 0.0},
}


class _Node:
    __slots__ = ("keyword", "values", "children")

    def __init__(self, keyword):
        self.keyword = keyword
        self.values: list = []
        self.children: list[_Node] = []

    def find(self, keyword: str):
        kw = keyword.upper()
        for c in self.children:
            if c.keyword == kw:
                return c
        for c in self.children:
            got = c.find(kw)
            if got is not None:
                return got
        return None

    def find_all(self, keyword: str):
        kw = keyword.upper()
        out = []
        for c in self.children:
            if c.keyword == kw:
                out.append(c)
            out.extend(c.find_all(kw))
        return out


_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|[A-Za-z_][A-Za-z0-9_]*|[-+0-9.eE]+|[\[\],()]')


def _parse_node(wkt: str) -> _Node:
    toks = _TOKEN.findall(wkt)
    pos = 0

    def parse() -> _Node:
        nonlocal pos
        kw = toks[pos]
        pos += 1
        node = _Node(kw.upper())
        if pos < len(toks) and toks[pos] in "[(":
            pos += 1
            while True:
                t = toks[pos]
                if t in "])":
                    pos += 1
                    break
                if t == ",":
                    pos += 1
                    continue
                if t.startswith('"'):
                    node.values.append(t[1:-1])
                    pos += 1
                elif re.fullmatch(r"[-+0-9.eE]+", t):
                    node.values.append(float(t))
                    pos += 1
                else:
                    node.children.append(parse())
        return node

    root = parse()
    return root


def parse_wkt_crs(wkt: str) -> tuple[str, dict]:
    """PROJCS WKT1 -> (family, params) in the registry's shape."""
    root = _parse_node(wkt)
    if root.keyword != "PROJCS":
        raise ValueError(f"expected PROJCS, got {root.keyword}")
    sph = root.find("SPHEROID")
    if sph is None or len(sph.values) < 3:
        raise ValueError("no SPHEROID[name, a, 1/f] found")
    a, rf = float(sph.values[1]), float(sph.values[2])
    proj = root.find("PROJECTION")
    if proj is None or not proj.values:
        raise ValueError("no PROJECTION[...] found")
    method = str(proj.values[0]).lower()
    family = _METHOD_FAMILY.get(method)
    if family is None:
        raise ValueError(
            f"unsupported projection method {proj.values[0]!r}; "
            f"supported: {sorted(_METHOD_FAMILY)}"
        )
    # units: reject non-degree GEOGCS / non-metre projected units rather
    # than silently misprojecting
    units = root.find_all("UNIT")
    for u in units:
        name = str(u.values[0]).lower() if u.values else ""
        if name and name not in (
            "degree", "metre", "meter", "degrees", "metres", "meters"
        ):
            raise ValueError(f"unsupported UNIT {u.values[0]!r}")
    pmap = _PARAM_MAP[family]
    params: dict = {"a": a, "rf": rf}
    params.update(_DEFAULTS.get(family, {}))
    for p in root.find_all("PARAMETER"):
        if len(p.values) < 2:
            continue
        name = str(p.values[0]).lower()
        if name in pmap:
            params[pmap[name]] = float(p.values[1])
    missing = [k for k in _REQUIRED[family] if k not in params]
    if missing:
        raise ValueError(f"WKT lacks required parameters {missing} for {family}")
    return family, params


def parse_wkt_towgs84(wkt: str):
    """The TOWGS84[...] clause (3- or 7-parameter position-vector
    Helmert, EPSG 9603/9606 — ogrspatialreference.cpp SetTOWGS84
    analog) as a float tuple, or None when absent / all-zero."""
    node = _parse_node(wkt).find("TOWGS84")
    if node is None:
        return None
    vals = tuple(float(v) for v in node.values)
    if len(vals) not in (3, 7):
        raise ValueError(f"TOWGS84 needs 3 or 7 values, got {len(vals)}")
    if not any(vals):
        return None
    return vals


def register_crs_from_wkt(srid: int, wkt: str) -> None:
    """importFromWkt + registry registration in one step: after this,
    ``srid`` resolves through proj.get_transformer and every
    registry-dispatched operator (warp, footprint, reprojection). A
    TOWGS84 clause additionally registers the datum shift, so the
    transformer's geodetic side is WGS84 regardless of the WKT datum."""
    family, params = parse_wkt_crs(wkt)
    register_crs(srid, family, **params)
    towgs84 = parse_wkt_towgs84(wkt)
    if towgs84 is not None:
        register_datum(srid, params["a"], params["rf"], towgs84)


# ---------------------------------------------------------------------------
# WKT1 export — the OGRSpatialReference::exportToWkt counterpart
# ---------------------------------------------------------------------------

_FAMILY_METHOD = {
    "tm": "Transverse_Mercator",
    "lcc": "Lambert_Conformal_Conic_2SP",
    "aea": "Albers_Conic_Equal_Area",
    "ps": "Polar_Stereographic",
    "laea": "Lambert_Azimuthal_Equal_Area",
    "eqearth": "Equal_Earth",
}

# family kwarg -> (canonical WKT1 PARAMETER name, default when absent)
_EXPORT_PARAMS = {
    "tm": [("lat0", "latitude_of_origin", 0.0), ("lon0", "central_meridian", None),
           ("k0", "scale_factor", 0.9996), ("e0", "false_easting", 500000.0),
           ("n0", "false_northing", 0.0)],
    "lcc": [("phi1", "standard_parallel_1", None), ("phi2", "standard_parallel_2", None),
            ("phi0", "latitude_of_origin", None), ("lon0", "central_meridian", None),
            ("e0", "false_easting", 0.0), ("n0", "false_northing", 0.0)],
    "aea": [("phi1", "standard_parallel_1", None), ("phi2", "standard_parallel_2", None),
            ("phi0", "latitude_of_center", None), ("lon0", "longitude_of_center", None),
            ("e0", "false_easting", 0.0), ("n0", "false_northing", 0.0)],
    "ps": [("lat_ts", "latitude_of_origin", None), ("lon0", "central_meridian", None),
           ("e0", "false_easting", 0.0), ("n0", "false_northing", 0.0)],
    "laea": [("phi0", "latitude_of_center", None), ("lon0", "longitude_of_center", None),
             ("e0", "false_easting", 0.0), ("n0", "false_northing", 0.0)],
    "eqearth": [("lon0", "central_meridian", None), ("e0", "false_easting", 0.0),
                ("n0", "false_northing", 0.0)],
}

_ELLIPSOIDS = [
    # (name, datum name, a, 1/f) — matched by parameter value
    ("WGS 84", "WGS_1984", 6378137.0, 298.257223563),
    ("GRS 1980", "Unknown_based_on_GRS80_ellipsoid", 6378137.0, 298.257222101),
    ("Airy 1830", "Unknown_based_on_Airy_ellipsoid", 6377563.396, 299.3249646),
]


def _num(v: float) -> str:
    """Trailing-zero-free decimal, the GDAL WKT1 number style."""
    s = f"{float(v):.10f}".rstrip("0").rstrip(".")
    return s if s not in ("", "-0") else "0"


def crs_to_wkt(family: str, params: dict, name: str = "unnamed",
               towgs84=None) -> str:
    """(family, params) in the registry's shape -> PROJCS WKT1 string
    using the GDAL SRS_PP_* parameter-name conventions — the exact form
    ``parse_wkt_crs`` consumes, so export/import round-trips by
    construction (tests additionally pin transformer equality).
    ``towgs84`` (3 or 7 floats) emits the TOWGS84 clause inside DATUM,
    carrying the Helmert shift through the round-trip."""
    if family not in _FAMILY_METHOD:
        raise ValueError(f"unknown family {family!r}")
    a, rf = float(params["a"]), float(params["rf"])
    ell_name, datum = "unnamed ellipsoid", "unnamed_datum"
    for en, dn, ea, erf in _ELLIPSOIDS:
        if abs(a - ea) < 1e-6 and abs(rf - erf) < 1e-9:
            ell_name, datum = en, dn
            break
    sph = f'            SPHEROID["{ell_name}",{_num(a)},{_num(rf)}]'
    if towgs84 is not None:
        tow = ",".join(_num(v) for v in towgs84)
        sph += f',\n            TOWGS84[{tow}]'
    lines = [
        f'PROJCS["{name}",',
        f'    GEOGCS["{ell_name}",',
        f'        DATUM["{datum}",',
        sph + '],',
        '        PRIMEM["Greenwich",0],',
        '        UNIT["degree",0.0174532925199433]],',
        f'    PROJECTION["{_FAMILY_METHOD[family]}"],',
    ]
    for kwarg, wkt_name, default in _EXPORT_PARAMS[family]:
        v = params.get(kwarg, default)
        if v is None:
            raise ValueError(f"family {family!r} params lack {kwarg!r}")
        lines.append(f'    PARAMETER["{wkt_name}",{_num(v)}],')
    lines.append('    UNIT["metre",1]]')
    return "\n".join(lines)


def export_wkt(srid: int, name: str | None = None) -> str:
    """PROJCS WKT1 of a registered (or implicit-UTM) srid — the
    exportToWkt workflow. Raises for unknown/geographic srids (4326 and
    3857 have no PROJCS form in this engine's registry)."""
    from .proj import (
        CRS_TABLE, DATUM_TABLE, _E0, _K0, _WGS84_RF, _A, is_utm,
        utm_zone_params,
    )

    srid = int(srid)
    if srid in CRS_TABLE:
        family, params = CRS_TABLE[srid]
    elif is_utm(srid):
        lon0, n0 = utm_zone_params(srid)
        family = "tm"
        params = dict(a=_A, rf=_WGS84_RF, lon0=lon0, k0=_K0, e0=_E0,
                      n0=n0, lat0=0.0)
    else:
        raise ValueError(f"srid {srid} is not a registered projected CRS")
    shift = DATUM_TABLE.get(srid)
    wkt = crs_to_wkt(family, params, name=name or f"EPSG:{srid}",
                     towgs84=shift.towgs84 if shift is not None else None)
    # close with the outermost AUTHORITY node (the GDAL exportToWkt
    # shape) so downstream consumers (netCDF spatial_ref, GeoParquet)
    # can recover the EPSG code without a registry lookup
    return wkt[:-1] + f',\n    AUTHORITY["EPSG","{srid}"]]'
