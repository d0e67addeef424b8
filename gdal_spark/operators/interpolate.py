"""InterpolateAtPoint — sample raster values at vector point locations:
the raster side of the raster↔vector join.

Reference: alg/gdal_interpolateatpoint.cpp:165-440 — sample one band at a
fractional pixel coordinate with near/bilinear/cubic, degrading bilinear
to nearest at raster edges (lines 200-202; our samplers implement the
same rule, tests in test_resample_warp).

Spark shape (scale-safe): phase 1 joins points against the image
*metadata only* (footprint envelope columns — broadcast-able, a few
hundred bytes per image), so the joined rows carry (pid, x, y, image_id)
and nothing else. Phase 2 is a COGROUP on image_id: the matched points
group meets the image row (bytes) in the same task, so each image's
payload crosses the shuffle exactly ONCE — never duplicated per point —
and is decoded once per task, with all its points sampled in one
vectorized call.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codecs
from ..resample import SAMPLERS
from .warp import apply_gt, geo_transform_points, invert_gt

OUT_SCHEMA = "pid long, image_id string, band int, value double, valid boolean"


def _point_image_pairs(points, images, point_key, x, y, point_srid):
    """Shared phase 1: broadcast metadata-only envelope join -> (pairs,
    payload). Pairs carry (pid, _px, _py, _img) and nothing else; payload
    carries each image's bytes exactly once."""
    pts = points.select(
        F.col(point_key).alias("pid"), F.col(x).alias("_px"), F.col(y).alias("_py")
    )
    # the phase-1 envelope predicate compares against footprint columns
    # that are ALWAYS EPSG:3857 meters (fixtures.footprint_meters
    # contract) — convert 4326 point coords to meters FOR THE JOIN
    # (column math, no UDF); phase 2 keeps the original coords and does
    # its own per-image CRS chain
    if point_srid == 4326:
        from ..grid import col_lonlat_to_meters

        jx, jy = col_lonlat_to_meters(F.col("_px"), F.col("_py"))
        pts = pts.withColumn("_jx", jx).withColumn("_jy", jy)
    elif point_srid == 3857:
        pts = pts.withColumn("_jx", F.col("_px")).withColumn(
            "_jy", F.col("_py")
        )
    else:
        raise ValueError(f"unsupported point_srid {point_srid}")
    # rename the key on the metadata side: pairs and payload both derive
    # from `images`, and Spark's ambiguous-self-join check rejects the
    # cogroup if the two lineages share the attribute
    meta = images.select(
        F.col("image_id").alias("_img"), "minx", "miny", "maxx", "maxy"
    )
    cond = (
        (F.col("_jx") >= F.col("minx"))
        & (F.col("_jx") <= F.col("maxx"))
        & (F.col("_jy") >= F.col("miny"))
        & (F.col("_jy") <= F.col("maxy"))
    )
    pairs = pts.join(F.broadcast(meta), cond, "inner").select(
        "pid", "_px", "_py", "_img"
    )
    payload = images.select(
        "image_id", "bytes", "fmt", "w", "h",
        "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "srid",
    )
    # only images some point actually hit ship their bytes into the
    # cogroup — points clustered in one city against a continent-scale
    # catalog must not shuffle every image's payload to a task that
    # immediately returns empty. The semi-join keys on image_id, the
    # same key the cogroup exchanges on, so no extra shuffle of payload.
    payload = payload.join(
        pairs.select(F.col("_img").alias("image_id")).distinct(),
        "image_id",
        "left_semi",
    )
    return pairs, payload


def interpolate_at_points(
    points: DataFrame,
    images: DataFrame,
    resampling: str = "bilinear",
    point_key: str = "pid",
    x: str = "x",
    y: str = "y",
    point_srid: int = 3857,
) -> DataFrame:
    """For each (point, image-with-footprint-containing-it) pair, the
    sampled value of every band at the point. Points are in mercator
    meters (or 4326 with point_srid=4326); per-image CRS conversion uses
    the closed-form transforms."""
    pairs, payload = _point_image_pairs(
        points, images, point_key, x, y, point_srid
    )
    sampler = SAMPLERS[resampling]

    def sample_cogroup(pts_pdf: pd.DataFrame, img_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["pid", "image_id", "band", "value", "valid"]
        if len(pts_pdf) == 0 or len(img_pdf) == 0:
            return pd.DataFrame(columns=cols)
        r0 = img_pdf.iloc[0]
        arr = codecs.decode_image(bytes(r0["bytes"]), r0["fmt"])
        if arr.ndim == 2:
            arr = arr[:, :, None]
        gt = tuple(float(r0[f"gt{i}"]) for i in range(6))
        inv = invert_gt(gt)
        gx = pts_pdf["_px"].to_numpy(dtype=float)
        gy = pts_pdf["_py"].to_numpy(dtype=float)
        sx, sy = geo_transform_points(gx, gy, point_srid, int(r0["srid"]))
        ppx, ppy = apply_gt(inv, sx, sy)
        pids = pts_pdf["pid"].to_numpy()
        frames = []
        for b in range(arr.shape[2]):
            vals, valid = sampler(arr[:, :, b].astype(np.float64), ppx, ppy)
            frames.append(
                pd.DataFrame(
                    {
                        "pid": pids.astype(np.int64),
                        "image_id": r0["image_id"],
                        "band": b,
                        "value": np.asarray(vals, dtype=np.float64),
                        "valid": np.asarray(valid, dtype=bool),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)[cols]

    return (
        pairs.groupBy("_img")
        .cogroup(payload.groupBy("image_id"))
        .applyInPandas(sample_cogroup, schema=OUT_SCHEMA)
    )


LOC_SCHEMA = (
    "pid long, image_id string, pixel long, line long, band int, "
    "value double, valid boolean"
)


def location_info(
    points: DataFrame,
    images: DataFrame,
    point_key: str = "pid",
    x: str = "x",
    y: str = "y",
    point_srid: int = 3857,
) -> DataFrame:
    """gdallocationinfo analog (apps/gdallocationinfo_bin.cpp semantics,
    -geoloc mode): for each (point, containing image) pair, the integer
    (pixel, line) the point falls in — floor of the inverse-geotransform
    coordinate, GDAL's truncation — and every band's RAW value at that
    cell (no interpolation; ``valid`` is false for points whose cell
    rounds outside the raster, the "location off this file" report).

    Same two-phase scale shape as :func:`interpolate_at_points`: the
    envelope join touches image METADATA only, the cogroup moves each
    image's bytes across the shuffle exactly once, all of an image's
    points resolve in one vectorized indexing pass.
    """
    pairs, payload = _point_image_pairs(
        points, images, point_key, x, y, point_srid
    )

    def locate_cogroup(pts_pdf: pd.DataFrame, img_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["pid", "image_id", "pixel", "line", "band", "value", "valid"]
        if len(pts_pdf) == 0 or len(img_pdf) == 0:
            return pd.DataFrame(columns=cols)
        r0 = img_pdf.iloc[0]
        arr = codecs.decode_image(bytes(r0["bytes"]), r0["fmt"])
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w = arr.shape[:2]
        gt = tuple(float(r0[f"gt{i}"]) for i in range(6))
        inv = invert_gt(gt)
        gx = pts_pdf["_px"].to_numpy(dtype=float)
        gy = pts_pdf["_py"].to_numpy(dtype=float)
        sx, sy = geo_transform_points(gx, gy, point_srid, int(r0["srid"]))
        ppx, ppy = apply_gt(inv, sx, sy)
        px = np.floor(ppx).astype(np.int64)
        py = np.floor(ppy).astype(np.int64)
        valid = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        cx = np.clip(px, 0, w - 1)
        cy = np.clip(py, 0, h - 1)
        pids = pts_pdf["pid"].to_numpy().astype(np.int64)
        frames = []
        for b in range(arr.shape[2]):
            vals = arr[cy, cx, b].astype(np.float64)
            vals[~valid] = np.nan
            frames.append(
                pd.DataFrame(
                    {
                        "pid": pids,
                        "image_id": r0["image_id"],
                        "pixel": px,
                        "line": py,
                        "band": b,
                        "value": vals,
                        "valid": valid,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)[cols]

    return (
        pairs.groupBy("_img")
        .cogroup(payload.groupBy("image_id"))
        .applyInPandas(locate_cogroup, schema=LOC_SCHEMA)
    )
