"""gdalmove analog: re-project a raster's georeferencing WITHOUT
touching pixels.

Reference: swig/python/gdal-utils/osgeo_utils/gdalmove.py ``move()`` —
transform the four corners + center of the image to the target SRS, fit
a new geotransform from UL / UR / LL (exact at those three points by
construction), and report the residual georeferencing error at the
center and lower-right both in target-SRS units and in pixels (via the
inverted new geotransform, gdal.InvGeoTransform).

Spark shape: the whole operation is per-row column math over (gt0..gt5,
w, h, srid) — no pixel bytes are read, so moving the georeferencing of
10^12 images is a single narrow mapInPandas projection with NO shuffle
at all.  The kernel is fully vectorized numpy; rows are grouped by
source srid inside each Arrow batch so ``geo_transform_points`` runs
once per (src, dst) pair per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# pixel/line sample points, in the reference's order:
# Upper Left, Lower Left, Upper Right, Lower Right, Center
_UL, _LL, _UR, _LR, _C = range(5)


def inv_geotransform(gt: np.ndarray) -> np.ndarray:
    """Vectorized gdal.InvGeoTransform for an (n, 6) array of forward
    transforms (alg/gdaltransformer.cpp GDALInvGeoTransform semantics;
    singular transforms yield NaN rows rather than a failure flag)."""
    gt = np.asarray(gt, dtype=np.float64)
    det = gt[:, 1] * gt[:, 5] - gt[:, 2] * gt[:, 4]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_det = 1.0 / det
        out = np.empty_like(gt)
        out[:, 1] = gt[:, 5] * inv_det
        out[:, 4] = -gt[:, 4] * inv_det
        out[:, 2] = -gt[:, 2] * inv_det
        out[:, 5] = gt[:, 1] * inv_det
        out[:, 0] = (gt[:, 2] * gt[:, 3] - gt[:, 0] * gt[:, 5]) * inv_det
        out[:, 3] = (-gt[:, 1] * gt[:, 3] + gt[:, 0] * gt[:, 4]) * inv_det
    return out


def _apply_gt(gt: np.ndarray, px: np.ndarray, py: np.ndarray):
    """(n,6) gt applied to (n,k) pixel/line points -> geo x,y (n,k)."""
    x = gt[:, 0:1] + px * gt[:, 1:2] + py * gt[:, 2:3]
    y = gt[:, 3:4] + px * gt[:, 4:5] + py * gt[:, 5:6]
    return x, y


def move_georeference_arrays(
    gt: np.ndarray,
    w: np.ndarray,
    h: np.ndarray,
    src_srid: int,
    dst_srid: int,
) -> dict:
    """Local kernel over (n, 6) geotransforms: returns the refit
    target-SRS geotransform plus max |error| across the five reference
    sample points, in geo units and in pixels."""
    from .warp import geo_transform_points

    gt = np.asarray(gt, dtype=np.float64).reshape(-1, 6)
    w = np.asarray(w, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    n = gt.shape[0]

    # (n, 5) pixel/line sample points
    px = np.stack([np.zeros(n), np.zeros(n), w, w, w / 2.0], axis=1)
    py = np.stack([np.zeros(n), h, np.zeros(n), h, h / 2.0], axis=1)

    sx, sy = _apply_gt(gt, px, py)
    tx, ty = geo_transform_points(sx.ravel(), sy.ravel(), src_srid, dst_srid)
    tx = tx.reshape(n, 5)
    ty = ty.reshape(n, 5)

    new_gt = np.empty((n, 6))
    new_gt[:, 0] = tx[:, _UL]
    new_gt[:, 1] = (tx[:, _UR] - tx[:, _UL]) / w
    new_gt[:, 2] = (tx[:, _LL] - tx[:, _UL]) / h
    new_gt[:, 3] = ty[:, _UL]
    new_gt[:, 4] = (ty[:, _UR] - ty[:, _UL]) / w
    new_gt[:, 5] = (ty[:, _LL] - ty[:, _UL]) / h

    # error at the five points: refit transform vs the true reprojection
    nx, ny = _apply_gt(new_gt, px, py)
    err_geo = np.maximum(
        np.abs(nx - tx).max(axis=1), np.abs(ny - ty).max(axis=1)
    )

    inv = inv_geotransform(new_gt)
    bx, by = _apply_gt(inv, tx, ty)
    err_px = np.maximum(
        np.abs(bx - px).max(axis=1), np.abs(by - py).max(axis=1)
    )
    return {"new_gt": new_gt, "err_geo": err_geo, "err_px": err_px}


def move_georeference(
    df: DataFrame,
    dst_srid: int,
    id_col: str = "image_id",
) -> DataFrame:
    """Distributed gdalmove over an image table carrying (gt0..gt5, w,
    h, srid) columns: emits the target-SRS geotransform + residuals.
    Narrow projection, no shuffle, no pixel IO."""
    cols = [id_col, "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "w", "h",
            "srid"]

    schema = (
        f"{id_col} string, ngt0 double, ngt1 double, ngt2 double, "
        "ngt3 double, ngt4 double, ngt5 double, "
        "err_geo double, err_px double"
    )

    def run(batches):
        for pdf in batches:
            out_frames = []
            gt = pdf[["gt0", "gt1", "gt2", "gt3", "gt4", "gt5"]].to_numpy(
                dtype=np.float64
            )
            for srid in np.unique(pdf["srid"].to_numpy()):
                m = (pdf["srid"] == srid).to_numpy()
                r = move_georeference_arrays(
                    gt[m],
                    pdf["w"].to_numpy()[m],
                    pdf["h"].to_numpy()[m],
                    int(srid),
                    dst_srid,
                )
                frame = {id_col: pdf[id_col].to_numpy()[m]}
                for j in range(6):
                    frame[f"ngt{j}"] = r["new_gt"][:, j]
                frame["err_geo"] = r["err_geo"]
                frame["err_px"] = r["err_px"]
                out_frames.append(pd.DataFrame(frame))
            yield pd.concat(out_frames) if out_frames else pd.DataFrame(
                columns=[c.split(" ")[0] for c in schema.split(", ")]
            )

    return df.select(*cols).mapInPandas(run, schema=schema)


def edit_georeference(
    images: DataFrame,
    gt: tuple | None = None,
    srid: int | None = None,
    ullr: tuple | None = None,
) -> DataFrame:
    """gdal_edit.py analog (swig/python/gdal-utils/osgeo_utils/
    gdal_edit.py): ASSIGN georeferencing in place — pure Column
    assignments, zero shuffle, pixels untouched.

    - ``gt``: six-term geotransform (-a_gt equivalent; same for all rows)
    - ``srid``: authority code (-a_srs)
    - ``ullr``: (ulx, uly, lrx, lry) — -a_ullr: north-up geotransform
      derived from the corner box and each image's own w/h.
    """
    from pyspark.sql import functions as F

    out = images
    if gt is not None and ullr is not None:
        raise ValueError("pass gt or ullr, not both (gdal_edit parity)")
    if gt is not None:
        for i, v in enumerate(gt):
            out = out.withColumn(f"gt{i}", F.lit(float(v)))
    if ullr is not None:
        ulx, uly, lrx, lry = (float(v) for v in ullr)
        out = (
            out.withColumn("gt0", F.lit(ulx))
            .withColumn("gt1", (F.lit(lrx - ulx)) / F.col("w"))
            .withColumn("gt2", F.lit(0.0))
            .withColumn("gt3", F.lit(uly))
            .withColumn("gt4", F.lit(0.0))
            .withColumn("gt5", (F.lit(lry - uly)) / F.col("h"))
        )
    if srid is not None:
        out = out.withColumn("srid", F.lit(int(srid)))
    return out


def create_images(
    spark,
    n: int,
    w: int,
    h: int,
    bands: int = 1,
    burn: float | tuple = 0.0,
    gt: tuple = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
    srid: int = 3857,
    fmt: str = "png",
    id_prefix: str = "created",
    partitions: int | None = None,
) -> DataFrame:
    """gdal_create analog (apps/gdal_create.cpp): N blank/constant
    rasters as image rows — distributed generation (one mapInPandas over
    a range; no driver-side pixels), each image offset by its own height
    so the set tiles vertically (a usable canvas grid)."""
    from .. import codecs

    burn_vals = tuple(burn) if isinstance(burn, (tuple, list)) else (float(burn),) * bands
    if len(burn_vals) != bands:
        raise ValueError(f"{len(burn_vals)} burn values for {bands} bands")

    def gen(batches):
        arr = np.full((h, w, bands), 0, dtype=np.uint8)
        for b, v in enumerate(burn_vals):
            arr[:, :, b] = np.uint8(np.clip(v, 0, 255))
        a2 = arr[:, :, 0] if bands == 1 else arr
        buf = codecs.encode_image(a2, fmt)
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rows.append(
                    {
                        "image_id": f"{id_prefix}-{i:06d}",
                        "bytes": buf,
                        "w": w, "h": h, "fmt": fmt,
                        "caption": "", "phash": 0,
                        "gt0": gt[0], "gt1": gt[1], "gt2": gt[2],
                        "gt3": gt[3] + i * h * gt[5], "gt4": gt[4],
                        "gt5": gt[5], "srid": srid,
                    }
                )
            yield pd.DataFrame(rows)

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, gt0 double, gt1 double, gt2 double, "
        "gt3 double, gt4 double, gt5 double, srid int"
    )
    parts = partitions or max(2, n // 4096)
    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=schema)
