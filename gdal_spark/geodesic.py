"""Geodesic (ellipsoidal) distance and length on WGS84.

The reference computes geodesic length/area through GeographicLib
(ogr/ogrgeometry.cpp OGR_G_GeodesicLength / GeodesicArea, GDAL >= 3.9,
backed by Karney 2013). This engine implements the classical Vincenty
(1975) inverse formula — a public-domain recurrence accurate to ~0.5 mm
on WGS84 — vectorized over numpy arrays, with a FIXED iteration count so
the DuckDB oracle can replay the identical recurrence unrolled in SQL.

Known Vincenty caveat (documented in every implementation): the lambda
iteration converges slowly or not at all for NEARLY ANTIPODAL pairs
(separation within ~0.5° of 180°). With the fixed 12 iterations the
result there may be off; GDAL/GeographicLib's Karney algorithm does not
have this failure mode. Callers with antipodal workloads should treat
results beyond 179.5° separation as approximate.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)

VINCENTY_ITERS = 12


def vincenty_inverse(lon1, lat1, lon2, lat2, iters: int = VINCENTY_ITERS):
    """Geodesic distance in meters between (lon1, lat1) and (lon2, lat2)
    in degrees, vectorized. Fixed ``iters`` lambda iterations (Vincenty
    converges in <6 for non-antipodal pairs; no early exit so the SQL
    twin matches operation-for-operation)."""
    a, f, b = WGS84_A, WGS84_F, WGS84_B
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)

    U1 = np.arctan((1.0 - f) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - f) * np.tan(np.radians(lat2)))
    L = np.radians(lon2 - lon1)
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L
    sin_sig = np.zeros_like(L)
    cos_sig = np.ones_like(L)
    sig = np.zeros_like(L)
    cos_sq_alpha = np.ones_like(L)
    cos2sm = np.zeros_like(L)
    for _ in range(iters):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sig = np.sqrt(
            (cosU2 * sin_lam) ** 2
            + (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam) ** 2
        )
        cos_sig = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sig = np.arctan2(sin_sig, cos_sig)
        # coincident points: sin_sig == 0; keep sin_alpha 0 (distance 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            sin_alpha = np.where(
                sin_sig == 0.0, 0.0, cosU1 * cosU2 * sin_lam / sin_sig
            )
        cos_sq_alpha = 1.0 - sin_alpha * sin_alpha
        # equatorial line: cos_sq_alpha == 0 -> cos2sm := 0 (Vincenty's note)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos2sm = np.where(
                cos_sq_alpha == 0.0,
                0.0,
                cos_sig - 2.0 * sinU1 * sinU2 / np.where(
                    cos_sq_alpha == 0.0, 1.0, cos_sq_alpha
                ),
            )
        C = f / 16.0 * cos_sq_alpha * (4.0 + f * (4.0 - 3.0 * cos_sq_alpha))
        lam = L + (1.0 - C) * f * sin_alpha * (
            sig
            + C
            * sin_sig
            * (cos2sm + C * cos_sig * (-1.0 + 2.0 * cos2sm * cos2sm))
        )

    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq))
    )
    B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    d_sig = B * sin_sig * (
        cos2sm
        + B
        / 4.0
        * (
            cos_sig * (-1.0 + 2.0 * cos2sm * cos2sm)
            - B
            / 6.0
            * cos2sm
            * (-3.0 + 4.0 * sin_sig * sin_sig)
            * (-3.0 + 4.0 * cos2sm * cos2sm)
        )
    )
    return b * A * (sig - d_sig)


def geodesic_line_length(coords: np.ndarray, iters: int = VINCENTY_ITERS) -> float:
    """Sum of geodesic segment lengths along a (n, 2) lon/lat polyline —
    the OGR_G_GeodesicLength analog (one vectorized call over all
    segments, not a per-segment loop)."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return 0.0
    d = vincenty_inverse(
        coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1], iters
    )
    return float(np.sum(d))


def geometry_geodesic_length(g) -> float:
    """Geodesic length of a geometry's linework in meters (coordinates
    are lon/lat degrees): linestrings sum their chains, polygons their
    ring perimeters (matching OGR_G_GeodesicLength's per-part recursion,
    ogr/ogrgeometry.cpp)."""
    from . import geom as _geom

    if g.kind in (_geom.WKB_LINESTRING, _geom.WKB_MULTILINESTRING):
        parts = g.parts if g.kind == _geom.WKB_MULTILINESTRING else [g.parts[0]]
        return float(sum(geodesic_line_length(np.asarray(p)) for p in parts))
    total = 0.0
    for rings in g.polygons():
        for ring in rings:
            total += geodesic_line_length(np.asarray(ring))
    return total
