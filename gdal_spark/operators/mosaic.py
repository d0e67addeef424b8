"""gdalbuildvrt analog: place N same-CRS rasters onto one common grid.

Reference: apps/gdalbuildvrt_lib.cpp (~2.5k LoC) — union extent over all
sources, target resolution highest|lowest|average|user, north-up only
(no rotated sources), later sources paint over earlier ones where their
data is valid. The reference emits a lazy VRT; at engine scale a mosaic
READ is a tile compose, so the operator materializes composed output
tiles directly (the same stance tile.compose_tiles takes for the
mercator pyramid).

Distributed shape:
1. ONE metadata aggregation (extent/resolution over the georef columns,
   never pixels) -> target grid; the driver holds a single row.
2. Per-image fragment cut: the covered output-tile range is Column math;
   one mapInPandas decodes each source ONCE and resamples it into each
   overlapped output tile via the same-CRS warp_array (affine -> affine,
   exact mapping; source alpha resampled through the same transform like
   tile._cut_one). Only (ts, ts) PNG fragments leave the stage.
3. groupBy(tx, ty) compose — the tile-key shuffle IS the mosaic; sources
   paint in image_id order (buildvrt paints in command-line order;
   image_id is the deterministic distributed equivalent) where valid.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .. import codecs
from ..checksum import image_checksums
from .tile import _decode_rgb_alpha
from .warp import warp_array

MOSAIC_FRAGMENT_SCHEMA = (
    "tx long, ty long, image_id string, px binary, alpha binary, c int, "
    "tw int, th int"
)

MOSAIC_TILE_SCHEMA = (
    "tx long, ty long, w int, h int, png binary, checksum int, "
    "checksums array<int>, n_src int, src_ids array<string>, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, gt5 double"
)


def mosaic_grid(images: DataFrame, resolution: str = "highest",
                target_res: tuple[float, float] | None = None):
    """Target grid (gt, W, H, srid) from ONE metadata aggregation —
    the gdalbuildvrt extent/resolution scan (apps/gdalbuildvrt_lib.cpp
    analyses sources the same way, without reading pixels).

    ``resolution``: 'highest' (finest pixel, the default), 'lowest',
    'average', or 'user' with ``target_res=(rx, ry)``."""
    if resolution == "user":
        if target_res is None:
            raise ValueError("resolution='user' needs target_res=(rx, ry)")
    elif resolution not in ("highest", "lowest", "average"):
        raise ValueError(f"unknown resolution rule {resolution!r}")
    agg = images.select(
        F.min("gt0").alias("minx"),
        F.max(F.col("gt0") + F.col("w") * F.col("gt1")).alias("maxx"),
        F.max("gt3").alias("maxy"),
        F.min(F.col("gt3") + F.col("h") * F.col("gt5")).alias("miny"),
        F.min("gt1").alias("rx_hi"),
        F.max("gt1").alias("rx_lo"),
        F.avg("gt1").alias("rx_av"),
        F.min(-F.col("gt5")).alias("ry_hi"),
        F.max(-F.col("gt5")).alias("ry_lo"),
        F.avg(-F.col("gt5")).alias("ry_av"),
        F.count_distinct("srid").alias("n_srid"),
        F.first("srid").alias("srid"),
        F.max(F.abs("gt2") + F.abs("gt4")).alias("rot"),
        F.min("gt1").alias("gt1_min"),
        F.max("gt5").alias("gt5_max"),
    ).collect()[0]
    if agg.minx is None:
        raise ValueError("mosaic over zero source images")
    if agg.n_srid != 1:
        # buildvrt parity: "gdalbuildvrt does not support heterogeneous
        # projection" — reproject with warp_images first
        raise ValueError(f"mosaic sources span {agg.n_srid} CRS; warp first")
    if agg.rot != 0.0:
        raise ValueError("mosaic requires north-up sources (gt2 == gt4 == 0)")
    if agg.gt1_min <= 0.0 or agg.gt5_max >= 0.0:
        raise ValueError("mosaic requires gt1 > 0 and gt5 < 0 sources")
    if resolution == "user":
        rx, ry = float(target_res[0]), float(target_res[1])
    elif resolution == "highest":
        rx, ry = float(agg.rx_hi), float(agg.ry_hi)
    elif resolution == "lowest":
        rx, ry = float(agg.rx_lo), float(agg.ry_lo)
    else:
        rx, ry = float(agg.rx_av), float(agg.ry_av)
    # round the raster size OUT so the union extent is covered
    # (buildvrt rounds the same way, then keeps the origin fixed)
    W = max(1, int(math.ceil((agg.maxx - agg.minx) / rx - 1e-9)))
    H = max(1, int(math.ceil((agg.maxy - agg.miny) / ry - 1e-9)))
    gt = (float(agg.minx), rx, 0.0, float(agg.maxy), 0.0, -ry)
    return gt, W, H, int(agg.srid)


def build_mosaic(
    images: DataFrame,
    resolution: str = "highest",
    target_res: tuple[float, float] | None = None,
    tile_size: int = 512,
    resampling: str = "near",
    on_error: str = "fail",
) -> DataFrame:
    """Compose all source images onto the common grid; returns one row
    per non-empty output tile with its own geotransform, composed RGBA
    PNG and GDAL checksums. Edge tiles are clipped to the raster size
    (tw/th < tile_size), like retile.

    ``on_error='skip'`` drops sources whose bytes fail to decode instead
    of aborting the mosaic (the warp_images convention; default 'fail'
    matches gdalbuildvrt)."""
    import pandas as pd

    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")

    gt, W, H, srid = mosaic_grid(images, resolution, target_res)
    ts = int(tile_size)
    ntx = (W + ts - 1) // ts
    nty = (H + ts - 1) // ts
    minx, rx = gt[0], gt[1]
    maxy, ry = gt[3], -gt[5]

    # covered output-tile range per image: pure Column math
    x0 = F.col("gt0")
    x1 = F.col("gt0") + F.col("w") * F.col("gt1")
    y1 = F.col("gt3")
    y0 = F.col("gt3") + F.col("h") * F.col("gt5")
    eps = 1e-9
    txmin = F.greatest(F.lit(0), F.floor((x0 - minx) / (ts * rx) + eps)).cast("long")
    txmax = F.least(F.lit(ntx - 1), F.floor((x1 - minx) / (ts * rx) - eps)).cast("long")
    tymin = F.greatest(F.lit(0), F.floor((maxy - y1) / (ts * ry) + eps)).cast("long")
    tymax = F.least(F.lit(nty - 1), F.floor((maxy - y0) / (ts * ry) - eps)).cast("long")
    ranged = (
        images.withColumn("txmin", txmin)
        .withColumn("txmax", txmax)
        .withColumn("tymin", tymin)
        .withColumn("tymax", tymax)
        .where((F.col("txmax") >= F.col("txmin")) & (F.col("tymax") >= F.col("tymin")))
    )

    def cut(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    arr, alpha_src = _decode_rgb_alpha(bytes(r.bytes), r.fmt)
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                src_gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
                for tx in range(int(r.txmin), int(r.txmax) + 1):
                    for ty in range(int(r.tymin), int(r.tymax) + 1):
                        tw = min(ts, W - tx * ts)
                        th = min(ts, H - ty * ts)
                        dst_gt = (
                            minx + tx * ts * rx, rx, 0.0,
                            maxy - ty * ts * ry, 0.0, -ry,
                        )
                        o, cov = warp_array(
                            arr, src_gt, int(r.srid), (th, tw), dst_gt,
                            int(r.srid), resampling,
                        )
                        tile = np.clip(np.round(o), 0, 255).astype(np.uint8)
                        if tile.ndim == 2:
                            tile = tile[:, :, None]
                        a_out, _ = warp_array(
                            alpha_src.astype(np.float64), src_gt, int(r.srid),
                            (th, tw), dst_gt, int(r.srid), resampling,
                        )
                        a2 = np.atleast_3d(a_out)[:, :, 0]
                        alpha = np.where(
                            (cov > 0) & (a2 >= 127.5), 255, 0
                        ).astype(np.uint8)
                        if not alpha.any():
                            continue
                        out.append(
                            {
                                "tx": int(tx),
                                "ty": int(ty),
                                "image_id": r.image_id,
                                "px": codecs.encode_png(tile, level=1),
                                "alpha": b""
                                if alpha.min() == 255
                                else codecs.encode_png(alpha, level=1),
                                "c": int(tile.shape[2]),
                                "tw": int(tw),
                                "th": int(th),
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "tx", "ty", "image_id", "px", "alpha", "c", "tw", "th",
                ],
            )

    frags = ranged.mapInPandas(cut, schema=MOSAIC_FRAGMENT_SCHEMA)

    def compose(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tx"].iloc[0])
        ty = int(pdf["ty"].iloc[0])
        tw = int(pdf["tw"].iloc[0])
        th = int(pdf["th"].iloc[0])
        c = int(pdf["c"].max())
        pdf = pdf.sort_values("image_id")
        buf = np.zeros((th, tw, c), dtype=np.uint8)
        alpha = np.zeros((th, tw), dtype=np.uint8)
        src_ids = []
        for r in pdf.itertuples(index=False):
            tile = codecs.decode_png(bytes(r.px))
            if tile.ndim == 2:
                tile = tile[:, :, None]
            if tile.shape[2] < c:
                tile = np.repeat(tile[:, :, :1], c, axis=2)
            ab = bytes(r.alpha)
            if len(ab) == 0:
                buf[:, :, :] = tile
                alpha[:, :] = 255
            else:
                fa = codecs.decode_png(ab)
                if fa.ndim == 3:
                    fa = fa[:, :, 0]
                m = fa > 0
                buf[m] = tile[m]
                alpha[m] = 255
            src_ids.append(r.image_id)
        rgba = np.dstack([buf, alpha])
        sums = image_checksums(rgba)
        return pd.DataFrame(
            [
                {
                    "tx": tx,
                    "ty": ty,
                    "w": tw,
                    "h": th,
                    "png": codecs.encode_png(rgba, level=3),
                    "checksum": sums[0],
                    "checksums": sums,
                    "n_src": len(src_ids),
                    "src_ids": src_ids,
                    "gt0": minx + tx * ts * rx,
                    "gt1": rx,
                    "gt2": 0.0,
                    "gt3": maxy - ty * ts * ry,
                    "gt4": 0.0,
                    "gt5": -ry,
                }
            ]
        )

    return frags.groupBy("tx", "ty").applyInPandas(
        compose, schema=MOSAIC_TILE_SCHEMA
    )
