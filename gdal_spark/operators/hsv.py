"""hsv_merge analog: drape an RGB color raster over a greyscale
intensity raster (typically a gdaldem hillshade) by swapping the V
channel in HSV space.

Reference: swig/python/gdal-utils/osgeo_utils/samples/hsv_merge.py —
``rgb_to_hsv`` (h, s in [0, 1], v in [0, 255]; hue sector arithmetic
bc-gc / 2+rc-bc / 4+gc-rc then mod 1), v := greyscale band,
``hsv_to_rgb`` (sector interpolation via p/q/t). Re-expressed with
np.where instead of np.choose; identical arithmetic.

Spark shape: a 1:1 image-id equi-join (color row + intensity row) and
ONE Arrow pass — bytes cross the shuffle once per pair, the conversion
is vectorized numpy. Same scale posture as pansharpen_images.

Also exposes ``gdal_minmax_location`` semantics
(samples/gdal_minmax_location.py): per band, the min/max value and the
pixel + georeferenced coordinates of their FIRST occurrence in scan
order — a narrow shuffle-free per-image statistic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gdal_spark import codecs


def rgb_to_hsv(rgb: np.ndarray):
    """(h, w, 3) float/uint8 -> (h, s, v) arrays; h, s in [0,1], v in
    [0,255] (hsv_merge.py:13-62 arithmetic)."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    maxc = np.maximum(r, np.maximum(g, b))
    minc = np.minimum(r, np.minimum(g, b))
    v = maxc
    diff = np.where(minc == maxc, 1.0, maxc - minc)
    s = (maxc - minc) / np.maximum(1.0, maxc)
    rc = (maxc - r) / diff
    gc = (maxc - g) / diff
    bc = (maxc - b) / diff
    h = np.zeros_like(r)
    h = np.where(maxc == b, 4.0 + gc - rc, h)
    h = np.where(maxc == g, 2.0 + rc - bc, h)
    h = np.where(maxc == r, bc - gc, h)
    h = np.mod(h / 6.0, 1.0)
    return h, s, v


def hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Inverse conversion (hsv_merge.py:72-91): sector index i = int(6h),
    fractional f, p/q/t interpolants; uint8 output."""
    i = (h * 6.0).astype(np.int64)
    f = (h * 6.0) - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    r = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    # clip before the cast: v > 255 (e.g. a 16-bit intensity raster)
    # must saturate, not wrap modulo 256
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def hsv_merge_array(rgb: np.ndarray, grey: np.ndarray) -> np.ndarray:
    """Replace V with the greyscale band (both uint8 ranges). A 1-band
    color input is expanded to RGB first (s = 0, so the result is just
    the intensity raster — graceful where the reference CLI errors)."""
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, axis=2)
    elif rgb.shape[2] < 3:
        rgb = np.repeat(rgb[:, :, :1], 3, axis=2)
    h, s, _v = rgb_to_hsv(rgb[:, :, :3])
    g = grey if grey.ndim == 2 else grey[:, :, 0]
    if g.shape != h.shape:
        raise ValueError(
            f"color {h.shape} and intensity {g.shape} rasters differ in "
            "size (the reference CLI refuses mismatched inputs too)"
        )
    return hsv_to_rgb(h, s, g.astype(np.float64))


def hsv_merge_images(
    color_df: DataFrame,
    grey_df: DataFrame,
    out_fmt: str = "png",
) -> DataFrame:
    """1:1 image-id join (color + intensity), one vectorized Arrow pass;
    emits merged bytes + per-band-1 GDAL checksum."""
    from gdal_spark.checksum import gdal_checksum

    c = color_df.select(
        "image_id", F.col("bytes").alias("c_bytes"),
        F.col("fmt").alias("c_fmt"),
    )
    g = grey_df.select(
        F.col("image_id").alias("g_id"), F.col("bytes").alias("g_bytes"),
        F.col("fmt").alias("g_fmt"),
    )
    joined = c.join(g, c["image_id"] == g["g_id"], "inner").drop("g_id")

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rgb = codecs.decode_image(bytes(r.c_bytes), r.c_fmt)
                grey = codecs.decode_image(bytes(r.g_bytes), r.g_fmt)
                try:
                    out = hsv_merge_array(rgb, grey)
                except ValueError as ex:
                    raise ValueError(f"image {r.image_id}: {ex}") from ex
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": codecs.encode_image(out, out_fmt),
                        "w": out.shape[1], "h": out.shape[0],
                        "checksum": int(gdal_checksum(out[:, :, 0])),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "checksum"]
            )

    return joined.mapInPandas(
        do,
        schema="image_id string, bytes binary, w int, h int, checksum long",
    )


# ---------------------------------------------------------------------------
# gdal_minmax_location
# ---------------------------------------------------------------------------


def minmax_location_array(band: np.ndarray, gt) -> dict:
    """Min/max value + first-occurrence pixel and geo location
    (samples/gdal_minmax_location.py semantics; geo = pixel CENTER)."""
    band = np.asarray(band)
    if band.dtype.kind == "f" and np.isnan(band).any():
        # skip NaN (nodata) pixels like the reference; argmin/argmax
        # would otherwise both land on the first NaN
        if np.isnan(band).all():
            flat_min = flat_max = 0
        else:
            flat_min = int(np.nanargmin(band))
            flat_max = int(np.nanargmax(band))
    else:
        flat_min = int(band.argmin())
        flat_max = int(band.argmax())
    h, w = band.shape
    out = {}
    for tag, flat, val in (
        ("min", flat_min, band.ravel()[flat_min]),
        ("max", flat_max, band.ravel()[flat_max]),
    ):
        py, px = divmod(flat, w)
        gx = gt[0] + (px + 0.5) * gt[1] + (py + 0.5) * gt[2]
        gy = gt[3] + (px + 0.5) * gt[4] + (py + 0.5) * gt[5]
        out[f"{tag}_val"] = float(val)
        out[f"{tag}_px"] = int(px)
        out[f"{tag}_py"] = int(py)
        out[f"{tag}_x"] = float(gx)
        out[f"{tag}_y"] = float(gy)
    return out


def minmax_location_images(images: DataFrame) -> DataFrame:
    """Per image (band 1): min/max + locations. Shuffle-free."""
    cols = ["image_id", "bytes", "fmt",
            "gt0", "gt1", "gt2", "gt3", "gt4", "gt5"]
    out_cols = [
        "image_id",
        "min_val", "min_px", "min_py", "min_x", "min_y",
        "max_val", "max_px", "max_py", "max_x", "max_y",
    ]

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                band = arr if arr.ndim == 2 else arr[:, :, 0]
                gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
                rec = minmax_location_array(band, gt)
                rec["image_id"] = r.image_id
                rows.append(rec)
            yield pd.DataFrame(rows, columns=out_cols)

    return images.select(*cols).mapInPandas(
        do,
        schema=(
            "image_id string, min_val double, min_px int, min_py int, "
            "min_x double, min_y double, max_val double, max_px int, "
            "max_py int, max_x double, max_y double"
        ),
    )
