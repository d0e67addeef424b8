"""Pansharpen: weighted-Brovey fusion of a high-res panchromatic band
with lower-res multispectral bands.

Reference: alg/gdalpansharpen.cpp (GDALPansharpenOperation, weighted
Brovey): pseudo-pan = sum(w_i * ms_i) over the upsampled multispectral
bands; ratio = pan / pseudo-pan; out_i = ms_i * ratio (clamped to the
output range). MS bands are resampled to the pan grid first (bilinear,
the reference default). Declared out of the v1 SURVEY scope; included as
bonus coverage — the kernel is a pure numpy expression and the operator
a 1:1 image-id join (narrow after the join; bytes cross once per pair).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codecs
from ..resample import resize


def pansharpen_array(
    pan: np.ndarray,
    ms: np.ndarray,
    weights=None,
    resampling: str = "bilinear",
) -> np.ndarray:
    """Weighted-Brovey sharpen: pan (H, W) + ms (h, w, c) -> (H, W, c)
    float64. Zero pseudo-pan pixels pass the upsampled MS through."""
    pan = np.asarray(pan, dtype=np.float64)
    if pan.ndim == 3:
        pan = pan[:, :, 0]
    ms = np.asarray(ms, dtype=np.float64)
    if ms.ndim == 2:
        ms = ms[:, :, None]
    c = ms.shape[2]
    if weights is None:
        weights = [1.0 / c] * c
    w = np.asarray(weights, dtype=np.float64)
    up = resize(ms, pan.shape[0], pan.shape[1], resampling)
    if up.ndim == 2:
        up = up[:, :, None]
    pseudo = (up * w[None, None, :]).sum(axis=2)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(pseudo > 0, pan / pseudo, 1.0)
    return up * ratio[:, :, None]


def pansharpen_images(
    pan_df: DataFrame,
    ms_df: DataFrame,
    weights=None,
    resampling: str = "bilinear",
    out_fmt: str = "png",
) -> DataFrame:
    """1:1 join on image_id (pan row + multispectral row), sharpen each
    pair in a vectorized pass. Output keeps the pan grid + georef."""
    pan = pan_df.select(
        "image_id", F.col("bytes").alias("pan_bytes"), F.col("fmt").alias("pan_fmt"),
        "w", "h", "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "srid",
        "minx", "miny", "maxx", "maxy",
    )
    ms = ms_df.select(
        F.col("image_id").alias("ms_id"),
        F.col("bytes").alias("ms_bytes"), F.col("fmt").alias("ms_fmt"),
    )
    joined = pan.join(ms, pan["image_id"] == ms["ms_id"], "inner").drop("ms_id")

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
        "gt5 double, srid int, minx double, miny double, maxx double, "
        "maxy double, checksum int"
    )

    def do(batches):
        from ..checksum import gdal_checksum

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                p = codecs.decode_image(bytes(r.pan_bytes), r.pan_fmt)
                m = codecs.decode_image(bytes(r.ms_bytes), r.ms_fmt)
                out = pansharpen_array(p, m, weights, resampling)
                arr = np.clip(np.round(out), 0, 255).astype(np.uint8)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": codecs.encode_image(arr, out_fmt),
                        "w": int(arr.shape[1]), "h": int(arr.shape[0]),
                        "fmt": out_fmt,
                        "gt0": r.gt0, "gt1": r.gt1, "gt2": r.gt2,
                        "gt3": r.gt3, "gt4": r.gt4, "gt5": r.gt5,
                        "srid": int(r.srid),
                        "minx": r.minx, "miny": r.miny,
                        "maxx": r.maxx, "maxy": r.maxy,
                        "checksum": gdal_checksum(arr[:, :, 0].astype(np.float64)),
                    }
                )
            yield pd.DataFrame(rows)

    return joined.mapInPandas(do, schema=schema)
