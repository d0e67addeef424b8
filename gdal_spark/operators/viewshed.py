"""Viewshed: visibility mask from an observer over an elevation raster.

Reference: alg/viewshed/ (GDALViewshedGenerate, Wang et al. reference
planes) and alg/los.cpp (line of sight). This engine computes the
classic sampled line-of-sight form: a target cell is VISIBLE iff no
point on the sight line from the observer subtends a greater-or-equal
elevation angle before it. Rays to every border cell are marched in
lockstep (one (n_rays, n_steps) bilinear sample + a running
maximum-angle accumulate along each ray), so the whole viewshed is a
handful of vectorized numpy ops — the sampling analog of the
reference's per-ring reference-plane sweep, with the same monotone
max-angle recurrence.

Semantics (matching GDALViewshedGenerate defaults):
- observer at pixel (ox, oy), height oz ABOVE the surface there
- optional target height tz above each target cell
- optional max_distance (pixels); cells beyond it are out-of-range
- output: uint8 mask — 255 visible, 0 hidden (GDAL VV/IV defaults)

Spark shape: per image (narrow mapInPandas); the observer is a
per-image parameter column or a constant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs
from ..checksum import gdal_checksum
from ..resample import sample_bilinear


def viewshed_array(
    dem: np.ndarray,
    ox: float,
    oy: float,
    oz: float = 2.0,
    tz: float = 0.0,
    max_distance: float | None = None,
    samples_per_cell: float = 1.0,
) -> np.ndarray:
    """Visibility mask (uint8, 255 visible) of one elevation array."""
    z = np.asarray(dem, dtype=np.float64)
    h, w = z.shape
    obs_z = float(
        sample_bilinear(z, np.array([ox + 0.5]), np.array([oy + 0.5]))[0][0]
    ) + oz

    # rays to every border cell center
    bx = np.concatenate(
        [np.arange(w), np.arange(w), np.zeros(h), np.full(h, w - 1.0)]
    )
    by = np.concatenate(
        [np.zeros(w), np.full(w, h - 1.0), np.arange(h), np.arange(h)]
    )
    dx = bx - ox
    dy = by - oy
    ray_len = np.hypot(dx, dy)
    ray_len = np.maximum(ray_len, 1e-9)
    n_steps = int(np.ceil(ray_len.max() * samples_per_cell)) + 1
    t = np.linspace(0.0, 1.0, n_steps)[None, :]  # (1, S)
    px = ox + dx[:, None] * t  # (R, S)
    py = oy + dy[:, None] * t
    elev, _ok = sample_bilinear(z, px + 0.5, py + 0.5)
    dist = ray_len[:, None] * t
    with np.errstate(divide="ignore", invalid="ignore"):
        # angle of the TERRAIN along the ray (blocks the view); the
        # observer's own zero-distance sample can never block (-inf)
        blk = np.where(dist > 0, (elev - obs_z) / dist, -np.inf)
        # angle of the TARGET point (terrain + target height); the
        # observer's own cell is trivially visible (+inf)
        tgt = np.where(dist > 0, (elev + tz - obs_z) / dist, np.inf)
    run_max = np.maximum.accumulate(blk, axis=1)
    prior_max = np.concatenate(
        [np.full((blk.shape[0], 1), -np.inf), run_max[:, :-1]], axis=1
    )
    vis = tgt >= prior_max
    if max_distance is not None:
        vis &= dist <= max_distance

    # scatter ray samples back to cells (nearest cell per sample; later
    # samples overwrite, but visibility per cell is the OR of passes)
    out = np.zeros((h, w), dtype=np.uint8)
    cx = np.clip(np.round(px).astype(np.int64), 0, w - 1).ravel()
    cy = np.clip(np.round(py).astype(np.int64), 0, h - 1).ravel()
    v = vis.ravel()
    vis_mask = np.zeros((h, w), dtype=bool)
    np.logical_or.at(vis_mask, (cy[v], cx[v]), True)
    covered = np.zeros((h, w), dtype=bool)
    np.logical_or.at(covered, (cy, cx), True)
    out[vis_mask] = 255
    # cells never crossed by a ray sample (shouldn't happen with
    # samples_per_cell >= 1, but guard): fall back to direct LOS = hidden
    out[~covered] = 0
    if max_distance is not None:
        yy, xx = np.mgrid[0:h, 0:w]
        out[np.hypot(xx - ox, yy - oy) > max_distance] = 0
    out[int(round(oy)), int(round(ox))] = 255
    return out


def viewshed_images(
    images: DataFrame,
    ox: float,
    oy: float,
    oz: float = 2.0,
    tz: float = 0.0,
    max_distance: float | None = None,
) -> DataFrame:
    """Per-image viewshed from a fixed pixel-space observer (narrow
    stage); band 0 is the elevation."""

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                out = viewshed_array(
                    arr.astype(np.float64), ox, oy, oz, tz, max_distance
                )
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(out.shape[1]), "h": int(out.shape[0]),
                        "data": out.tobytes(),
                        "visible_frac": float((out == 255).mean()),
                        "checksum": gdal_checksum(out.astype(np.float64)),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "w", "h", "data", "visible_frac", "checksum"],
            )

    return images.mapInPandas(
        do,
        schema="image_id string, w int, h int, data binary, visible_frac double, checksum int",
    )
