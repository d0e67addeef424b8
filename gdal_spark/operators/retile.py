"""gdal_retile analog: cut each source raster into a regular grid of
WxH tiles in SOURCE pixel space (optionally overlapping), plus
power-of-two pyramid levels.

Reference: swig/python/gdal-utils/osgeo_utils/gdal_retile.py —
``tile_info`` (grid shape: offsets step by ``tileWidth - overlap``;
edge tiles are CLIPPED to the raster, never padded; tile indices are
1-based), ``createTile`` (georeference of each tile derives from the
source geotransform at the pixel offset), ``buildPyramid`` (each level
halves the resolution of the previous one).

Spark shape: one ``mapInPandas`` pass — each image is decoded ONCE,
every level is produced by the exact-edge-weight average reducer from
the same decoded array, and all tiles of all levels are sliced and
emitted from that single pass. No shuffle at all: retiling 10^12
images is embarrassingly parallel over the source rows, and the
output is already partitioned by source image for downstream sinks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum

OUT_SCHEMA = (
    "image_id string, level int, tx int, ty int, w int, h int, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
    "gt5 double, data binary, checksum long"
)

_COLS = [f.split(" ")[0] for f in OUT_SCHEMA.split(", ")]


def retile_counts(xsize: int, ysize: int, tile_w: int, tile_h: int,
                  overlap: int = 0) -> tuple[int, int]:
    """tile_info's grid shape (gdal_retile.py:84-103), exact formula."""
    if overlap >= min(tile_w, tile_h):
        raise ValueError(
            f"overlap ({overlap}) must be smaller than the tile size "
            f"({tile_w}x{tile_h})"
        )
    count_x = 1
    if xsize > tile_w:
        count_x += (xsize - tile_w + (tile_w - overlap) - 1) // (
            tile_w - overlap
        )
    count_y = 1
    if ysize > tile_h:
        count_y += (ysize - tile_h + (tile_h - overlap) - 1) // (
            tile_h - overlap
        )
    return count_x, count_y


def _level_arrays(arr: np.ndarray, levels: int):
    """Yield (level, array, scale) — level 0 is the source; each next
    level halves resolution with the exact-edge-weight average reducer
    (buildPyramid semantics for a single-source mosaic)."""
    from gdal_spark.resample import resize_average

    yield 0, arr, 1
    cur = arr
    src_dtype = np.asarray(arr).dtype
    for lv in range(1, levels + 1):
        h, w = cur.shape[:2]
        nh, nw = max(1, (h + 1) // 2), max(1, (w + 1) // 2)
        down = resize_average(cur, nh, nw)
        # preserve the SOURCE dtype at every level (no silent uint8
        # squash of uint16/float rasters): integer dtypes round and
        # clip to their own range, float dtypes keep the averages
        if np.issubdtype(src_dtype, np.integer):
            info = np.iinfo(src_dtype)
            cur = np.clip(np.round(down), info.min, info.max).astype(
                src_dtype
            )
        else:
            cur = down.astype(src_dtype)
        yield lv, cur, 2 ** lv


def retile_array(arr: np.ndarray, gt, tile_w: int, tile_h: int,
                 overlap: int = 0, levels: int = 0) -> list[dict]:
    """Local kernel: all tiles of all levels for one decoded raster.
    Tile georefs follow createTile (gdal_retile.py:405-430): offset in
    LEVEL pixel space times the level's scaled geotransform."""
    out = []
    for lv, a, scale in _level_arrays(arr, levels):
        h, w = a.shape[:2]
        lgt = (gt[0], gt[1] * scale, gt[2] * scale,
               gt[3], gt[4] * scale, gt[5] * scale)
        cx, cy = retile_counts(w, h, tile_w, tile_h, overlap)
        step_x, step_y = tile_w - overlap, tile_h - overlap
        for ty in range(1, cy + 1):
            for tx in range(1, cx + 1):
                ox = (tx - 1) * step_x
                oy = (ty - 1) * step_y
                tw = min(tile_w, w - ox)
                th = min(tile_h, h - oy)
                sub = np.ascontiguousarray(a[oy:oy + th, ox:ox + tw])
                band = sub if sub.ndim == 2 else sub[:, :, 0]
                out.append(
                    {
                        "level": lv, "tx": tx, "ty": ty, "w": tw, "h": th,
                        "gt0": lgt[0] + ox * lgt[1] + oy * lgt[2],
                        "gt1": lgt[1], "gt2": lgt[2],
                        "gt3": lgt[3] + ox * lgt[4] + oy * lgt[5],
                        "gt4": lgt[4], "gt5": lgt[5],
                        "data": sub,
                        "checksum": gdal_checksum(band),
                    }
                )
    return out


def retile_images(
    df: DataFrame,
    tile_w: int = 256,
    tile_h: int = 256,
    overlap: int = 0,
    levels: int = 0,
    out_fmt: str = "png",
) -> DataFrame:
    """Distributed retile over an image table (image_id, bytes, fmt,
    gt0..gt5): decode once, slice every tile of every pyramid level,
    re-encode in ``out_fmt``. Shuffle-free."""
    cols = ["image_id", "bytes", "fmt", "gt0", "gt1", "gt2", "gt3",
            "gt4", "gt5"]

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
                for t in retile_array(arr, gt, tile_w, tile_h,
                                      overlap, levels):
                    t["image_id"] = r.image_id
                    t["data"] = codecs.encode_image(t.pop("data"), out_fmt)
                    rows.append(t)
            yield pd.DataFrame(rows, columns=_COLS)

    return df.select(*cols).mapInPandas(run, schema=OUT_SCHEMA)
