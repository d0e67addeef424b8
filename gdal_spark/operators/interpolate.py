"""InterpolateAtPoint — sample raster values at vector point locations:
the raster side of the raster↔vector join.

Reference: alg/gdal_interpolateatpoint.cpp:165-440 — sample one band at a
fractional pixel coordinate with near/bilinear/cubic, degrading bilinear
to nearest at raster edges (lines 200-202; our samplers implement the
same rule, tests in test_resample_warp).

Spark shape: phase 1 is an envelope containment join (point in image
footprint — plain Catalyst predicates over minx..maxy, broadcast on the
smaller side); phase 2 groups the joined rows by image so each image is
decoded ONCE per task and all its points are sampled in one vectorized
call (applyInPandas over image_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codecs
from ..resample import SAMPLERS
from .warp import apply_gt, geo_transform_points, invert_gt

OUT_SCHEMA = "pid long, image_id string, band int, value double, valid boolean"


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
    pts = points.select(
        F.col(point_key).alias("pid"), F.col(x).alias("_px"), F.col(y).alias("_py")
    )
    cond = (
        (F.col("_px") >= F.col("minx"))
        & (F.col("_px") <= F.col("maxx"))
        & (F.col("_py") >= F.col("miny"))
        & (F.col("_py") <= F.col("maxy"))
    )
    joined = pts.join(
        F.broadcast(
            images.select(
                "image_id", "bytes", "fmt", "w", "h",
                "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "srid",
                "minx", "miny", "maxx", "maxy",
            )
        ),
        cond,
        "inner",
    )
    sampler = SAMPLERS[resampling]

    def sample_group(pdf: pd.DataFrame) -> pd.DataFrame:
        r0 = pdf.iloc[0]
        arr = codecs.decode_image(bytes(r0["bytes"]), r0["fmt"])
        if arr.ndim == 2:
            arr = arr[:, :, None]
        gt = tuple(float(r0[f"gt{i}"]) for i in range(6))
        inv = invert_gt(gt)
        gx = pdf["_px"].to_numpy(dtype=float)
        gy = pdf["_py"].to_numpy(dtype=float)
        # point CRS -> image CRS
        sx, sy = geo_transform_points(gx, gy, point_srid, int(r0["srid"]))
        ppx, ppy = apply_gt(inv, sx, sy)
        rows = []
        for b in range(arr.shape[2]):
            vals, valid = sampler(arr[:, :, b].astype(np.float64), ppx, ppy)
            for pid, v, ok in zip(pdf["pid"], np.asarray(vals, dtype=float), valid):
                rows.append(
                    {
                        "pid": int(pid),
                        "image_id": r0["image_id"],
                        "band": b,
                        "value": float(v),
                        "valid": bool(ok),
                    }
                )
        return pd.DataFrame(rows, columns=["pid", "image_id", "band", "value", "valid"])

    return joined.groupBy("image_id").applyInPandas(sample_group, schema=OUT_SCHEMA)
