"""DEM analysis: hillshade / slope / aspect / TRI / TPI / roughness.

Reference: apps/gdaldem_lib.cpp (4,381 LoC) — Horn's 3x3 stencil
(GDALHillshade / GDALSlope defaults), azimuth/altitude lighting,
Riley TRI, TPI as center-minus-neighbour-mean, roughness as the 3x3
range. These were declared out of the v1 SURVEY scope; they are included
as bonus coverage because they compose directly from the engine's halo
machinery.

Semantics:
- dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * xres)   [Horn weights]
- dz/dy = ((g + 2h + i) - (a + 2b + c)) / (8 * yres)
- slope_deg = atan(z_factor * hypot(dz/dx, dz/dy)) * 180/pi
- aspect_deg: compass-style azimuth of steepest descent
  (atan2(dz/dy, -dz/dx) mapped to [0, 360), flat -> nodata)
- hillshade = 255 * (cos(zen)cos(slope) +
  sin(zen)sin(slope)cos(az - aspect)) clamped to [1, 255]
- TRI (Riley) = sqrt(sum over 8 neighbours (z_n - z_c)^2)
- TPI = z_c - mean(8 neighbours); roughness = max - min of the 3x3

Pixels whose 3x3 window leaves the data are nodata (NaN). The tiled
operator exchanges 1-px halo strips so interior tile borders are exact;
raster borders stay nodata, matching gdaldem's default edge handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs
from ..checksum import gdal_checksum

KINDS = (
    "hillshade", "slope", "aspect", "tri", "tpi", "roughness",
    "hillshade_combined", "hillshade_multidirectional", "hillshade_igor",
)


def dem_array(
    band: np.ndarray,
    kind: str,
    xres: float = 1.0,
    yres: float = 1.0,
    z_factor: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    alg: str = "horn",
    slope_format: str = "degree",
) -> np.ndarray:
    """One DEM product over one array; 1-px border (and any NaN window)
    is NaN.

    ``alg``: 'horn' (default, the gdaldem default) or
    'zevenbergen_thorne' (gdaldem -alg ZevenbergenThorne,
    apps/gdaldem_lib.cpp GradientAlg::ZEVENBERGEN_THORNE): the gradient
    comes from the 4 cross neighbours over 2*res instead of Horn's
    weighted 8-neighbour stencil — exact on planes like Horn, less
    smoothing on curvature. Applies to hillshade/slope/aspect.
    ``slope_format``: 'degree' (default) or 'percent' (gdaldem slope -p,
    100 * rise/run)."""
    z = np.asarray(band, dtype=np.float64)
    h, w = z.shape
    out = np.full((h, w), np.nan)
    if h < 3 or w < 3:
        return out
    a = z[:-2, :-2]; b = z[:-2, 1:-1]; c = z[:-2, 2:]
    d = z[1:-1, :-2]; e = z[1:-1, 1:-1]; f = z[1:-1, 2:]
    g = z[2:, :-2]; hh = z[2:, 1:-1]; i = z[2:, 2:]
    if alg not in ("horn", "zevenbergen_thorne"):
        raise ValueError(f"unknown gradient alg {alg!r}")
    if kind in ("hillshade", "slope", "aspect"):
        if alg == "zevenbergen_thorne":
            dzdx = (f - d) / (2.0 * xres)
            dzdy = (hh - b) / (2.0 * yres)
        else:
            dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * xres)
            dzdy = ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * yres)
        if kind == "slope":
            rise = z_factor * np.hypot(dzdx, dzdy)
            if slope_format == "percent":
                out[1:-1, 1:-1] = 100.0 * rise
            else:
                out[1:-1, 1:-1] = np.degrees(np.arctan(rise))
        elif kind == "aspect":
            asp = np.degrees(np.arctan2(dzdy, -dzdx))
            asp = np.where(asp < 0, 90.0 - asp, np.where(asp > 90.0, 360.0 - asp + 90.0, 90.0 - asp))
            flat = (dzdx == 0) & (dzdy == 0)
            out[1:-1, 1:-1] = np.where(flat, np.nan, asp)
        else:
            zen = np.radians(90.0 - altitude)
            az = np.radians(azimuth)
            slope = np.arctan(z_factor * np.hypot(dzdx, dzdy))
            aspect = np.arctan2(dzdy, -dzdx)
            shade = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(
                az - np.pi / 2.0 + aspect
            )
            out[1:-1, 1:-1] = np.clip(np.round(254.0 * shade) + 1.0, 1.0, 255.0)
    elif kind in (
        "hillshade_combined", "hillshade_multidirectional", "hillshade_igor"
    ):
        # gdaldem hillshade -combined / -multidirectional / -igor
        # semantics (apps/gdaldem_lib.cpp:1137-1166, 1234-1297, 940-997).
        # Work in the reference's gradient convention for a north-up
        # raster (nsres < 0): X = (west-east)/xres, Y = (south-north)/
        # nsres, with the Horn /8 folded into zf = z_factor/8.
        X = ((a + 2 * d + g) - (c + 2 * f + i)) / xres
        Y = ((g + 2 * hh + i) - (a + 2 * b + c)) / (-yres)
        zf = z_factor / 8.0
        sin_alt = np.sin(np.radians(altitude))
        cos_alt = np.cos(np.radians(altitude))
        az = np.radians(azimuth)
        xx_plus_yy = X * X + Y * Y
        if kind == "hillshade_combined":
            # standard shade cosine, then 1 - acos(shade)*atan(slope)
            # * 4/pi^2 (oblique+slope blend), <=0 collapsing to 1
            slope_sq = zf * zf * xx_plus_yy
            shade = (
                sin_alt
                - (Y * np.cos(az) - X * np.sin(az)) * cos_alt * zf
            ) / np.sqrt(1.0 + slope_sq)
            cang = 1.0 - np.arccos(np.clip(shade, -1.0, 1.0)) * np.arctan(
                np.sqrt(slope_sq)
            ) * (4.0 / np.pi**2)
            out[1:-1, 1:-1] = np.round(
                np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
            )
        elif kind == "hillshade_multidirectional":
            # USGS OF 92-422: shades from az 225/270/315/360 weighted by
            # sin^2(aspect - az); azimuth parameter is ignored
            cz = cos_alt * zf
            c225 = np.cos(np.radians(225.0)) * cz
            v225 = np.maximum(0.0, sin_alt + (X - Y) * c225)
            v270 = np.maximum(0.0, sin_alt - X * cz)
            v315 = np.maximum(0.0, sin_alt + (X + Y) * c225)
            v360 = np.maximum(0.0, sin_alt - Y * cz)
            w225 = 0.5 * xx_plus_yy - X * Y
            w270 = X * X
            w315 = xx_plus_yy - w225
            w360 = Y * Y
            with np.errstate(invalid="ignore", divide="ignore"):
                cang = (
                    (w225 * v225 + w270 * v270 + w315 * v315 + w360 * v360)
                    / xx_plus_yy
                    / np.sqrt(1.0 + zf * zf * xx_plus_yy)
                )
            flat = xx_plus_yy == 0.0
            out[1:-1, 1:-1] = np.round(
                np.where(flat, 1.0 + 254.0 * sin_alt, 1.0 + 127.0 * cang)
            )
        else:  # hillshade_igor
            # slope strength x aspect alignment with the light azimuth;
            # aspect from UNSCALED Horn sums (reference quirk), altitude
            # parameter is ignored
            slope_deg = np.degrees(np.arctan(np.sqrt(xx_plus_yy) * zf))
            dx_raw = (c + 2 * f + i) - (a + 2 * d + g)
            dy_raw = (g + 2 * hh + i) - (a + 2 * b + c)
            aspect = np.arctan2(dy_raw, -dx_raw)
            two_pi = 2.0 * np.pi
            target = np.pi * 1.5 - az
            diff = np.abs(aspect % two_pi - target % two_pi)
            diff = np.where(diff > np.pi, two_pi - diff, diff)
            shadow = 1.0 - (slope_deg / 90.0) * (1.0 - diff / np.pi)
            out[1:-1, 1:-1] = np.round(255.0 * shadow)
    elif kind == "tri":
        out[1:-1, 1:-1] = np.sqrt(
            (a - e) ** 2 + (b - e) ** 2 + (c - e) ** 2 + (d - e) ** 2
            + (f - e) ** 2 + (g - e) ** 2 + (hh - e) ** 2 + (i - e) ** 2
        )
    elif kind == "tpi":
        out[1:-1, 1:-1] = e - (a + b + c + d + f + g + hh + i) / 8.0
    elif kind == "roughness":
        stack = np.stack([a, b, c, d, e, f, g, hh, i])
        out[1:-1, 1:-1] = stack.max(axis=0) - stack.min(axis=0)
    else:
        raise ValueError(f"unknown DEM product {kind!r}")
    return out


def dem_images(
    images: DataFrame,
    kind: str,
    z_factor: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    alg: str = "horn",
    slope_format: str = "degree",
) -> DataFrame:
    """Per-image DEM product (narrow stage): band 0 with the image's own
    pixel size from the geotransform."""

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                out = dem_array(
                    arr.astype(np.float64), kind,
                    xres=abs(float(r.gt1)), yres=abs(float(r.gt5)),
                    z_factor=z_factor, azimuth=azimuth, altitude=altitude,
                    alg=alg, slope_format=slope_format,
                )
                filled = np.nan_to_num(out, nan=-9999.0)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(out.shape[1]), "h": int(out.shape[0]),
                        "data": filled.tobytes(),
                        "checksum": gdal_checksum(filled),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "w", "h", "data", "checksum"]
            )

    return images.mapInPandas(
        do, schema="image_id string, w int, h int, data binary, checksum int"
    )


def dem_tiles(
    tiles_df: DataFrame,
    kind: str,
    xres: float = 1.0,
    yres: float = 1.0,
    z_factor: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    tile_size: int = 256,
) -> DataFrame:
    """Distributed DEM product over the tiled layout with a 1-px halo
    exchange — interior tile borders are exact, raster borders nodata."""
    src = tiles_df.select("tile_x", "tile_y", "w", "h", "data")

    def export(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=np.float64).reshape(r.h, r.w)
                strips = {
                    (-1, 0): arr[:, 0], (1, 0): arr[:, -1],
                    (0, -1): arr[0, :], (0, 1): arr[-1, :],
                    (-1, -1): arr[0, 0:1], (1, -1): arr[0, -1:],
                    (-1, 1): arr[-1, 0:1], (1, 1): arr[-1, -1:],
                }
                for (dx, dy), v in strips.items():
                    rows.append(
                        {
                            "tile_x": int(r.tile_x) + dx,
                            "tile_y": int(r.tile_y) + dy,
                            "src_dx": -dx, "src_dy": -dy,
                            "vals": np.ascontiguousarray(v, dtype=np.float64).tobytes(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["tile_x", "tile_y", "src_dx", "src_dy", "vals"]
            )

    halos = src.mapInPandas(
        export,
        schema="tile_x int, tile_y int, src_dx int, src_dy int, vals binary",
    )

    out_schema = "tile_x int, tile_y int, w int, h int, data binary, checksum int"

    def compute(tile_pdf: pd.DataFrame, halo_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["tile_x", "tile_y", "w", "h", "data", "checksum"]
        if len(tile_pdf) == 0:
            return pd.DataFrame(columns=cols)
        r = tile_pdf.iloc[0]
        h, w = int(r["h"]), int(r["w"])
        arr = np.frombuffer(bytes(r["data"]), dtype=np.float64).reshape(h, w)
        canvas = np.full((h + 2, w + 2), np.nan)
        canvas[1:-1, 1:-1] = arr
        for n in halo_pdf.itertuples(index=False):
            v = np.frombuffer(bytes(n.vals), dtype=np.float64)
            dx, dy = int(n.src_dx), int(n.src_dy)
            # the neighbour at (dx, dy) relative to THIS tile sent the
            # strip of its side facing us
            if dx == -1 and dy == 0:
                canvas[1 : 1 + len(v), 0] = v
            elif dx == 1 and dy == 0:
                canvas[1 : 1 + len(v), w + 1] = v
            elif dx == 0 and dy == -1:
                canvas[0, 1 : 1 + len(v)] = v
            elif dx == 0 and dy == 1:
                canvas[h + 1, 1 : 1 + len(v)] = v
            elif dx == -1 and dy == -1:
                canvas[0, 0] = v[0]
            elif dx == 1 and dy == -1:
                canvas[0, w + 1] = v[0]
            elif dx == -1 and dy == 1:
                canvas[h + 1, 0] = v[0]
            elif dx == 1 and dy == 1:
                canvas[h + 1, w + 1] = v[0]
        out = dem_array(canvas, kind, xres, yres, z_factor, azimuth, altitude)[
            1 : 1 + h, 1 : 1 + w
        ]
        filled = np.nan_to_num(out, nan=-9999.0)
        return pd.DataFrame(
            [
                {
                    "tile_x": int(r["tile_x"]), "tile_y": int(r["tile_y"]),
                    "w": w, "h": h, "data": filled.tobytes(),
                    "checksum": gdal_checksum(filled),
                }
            ],
            columns=cols,
        )

    return (
        src.groupBy("tile_x", "tile_y")
        .cogroup(halos.groupBy("tile_x", "tile_y"))
        .applyInPandas(compute, schema=out_schema)
    )


# ---------------------------------------------------------------------------
# color-relief (gdaldem color-relief, apps/gdaldem_lib.cpp ColorAssociation)
# ---------------------------------------------------------------------------


def color_relief_array(band: np.ndarray, ramp) -> np.ndarray:
    """Map elevations to RGB through a color ramp with linear
    interpolation between entries (gdaldem color-relief default
    COLOR_SELECTION_INTERPOLATE). ``ramp`` is a sequence of
    (elevation, r, g, b) sorted by elevation; values outside the ramp
    clamp to the end colors; NaN maps to (0,0,0)."""
    ramp = sorted((float(e), int(r), int(g), int(b)) for e, r, g, b in ramp)
    if not ramp:
        raise ValueError("empty color ramp")
    z = np.asarray(band, dtype=np.float64)
    xs = np.array([e for e, *_ in ramp])
    out = np.zeros(z.shape + (3,), dtype=np.uint8)
    nan = np.isnan(z)
    zc = np.where(nan, xs[0], z)
    for ch in range(3):
        ys = np.array([c[1 + ch] for c in ramp], dtype=np.float64)
        v = np.interp(zc, xs, ys)  # clamps outside the ramp
        out[:, :, ch] = np.where(nan, 0, np.clip(np.round(v), 0, 255)).astype(
            np.uint8
        )
    return out


def color_relief_images(images: DataFrame, ramp) -> DataFrame:
    """Per-image color-relief: band 0 -> RGB via the broadcast ramp."""
    ramp = [tuple(r) for r in ramp]

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                rgb = color_relief_array(arr.astype(np.float64), ramp)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(rgb.shape[1]), "h": int(rgb.shape[0]),
                        "bytes": codecs.encode_png(rgb),
                        "checksum": int(
                            sum(gdal_checksum(rgb[:, :, c].astype(np.float64))
                                for c in range(3)) % 65536
                        ),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "w", "h", "bytes", "checksum"]
            )

    return images.mapInPandas(
        do, schema="image_id string, w int, h int, bytes binary, checksum int"
    )
