"""Translate: subset / scale / resize / band-select — the engine's
gdal_translate.

Semantics from apps/gdal_translate_lib.cpp (3,501 LoC):
- ``-srcwin xoff yoff xsize ysize``: pixel window, clamped against the
  raster with partially-outside windows padded invalid
  (FixSrcDstWindow, gdal_translate_lib.cpp:331-399).
- ``-projwin ulx uly lrx lry``: geo window -> pixel window with the
  floor(x + 0.001) rounding of gdal_translate_lib.cpp:889-896.
- ``-outsize``: resample to a new size (any kernel from resample.py).
- ``-scale src_min src_max dst_min dst_max [-exponent e]``: linear or
  power-law stretch (gdal_translate_lib.cpp scale logic).
- ``-ot``: output dtype cast with clipping.
- band select / reorder.

The kernel is `translate_array`; `translate_images` is the mapInPandas
DataFrame operator (narrow stage, no shuffle).
"""

from __future__ import annotations

import numpy as np

from .. import codecs
from ..fixtures import footprint_meters


def projwin_to_srcwin(gt, ulx, uly, lrx, lry):
    """Geo window -> (xoff, yoff, xsize, ysize) with the reference's
    floor(+0.001) rounding (apps/gdal_translate_lib.cpp:889-896)."""
    xoff = int(np.floor((ulx - gt[0]) / gt[1] + 0.001))
    yoff = int(np.floor((uly - gt[3]) / gt[5] + 0.001))
    xsize = int(np.floor((lrx - ulx) / gt[1] + 0.5))
    ysize = int(np.floor((lry - uly) / gt[5] + 0.5))
    return xoff, yoff, xsize, ysize


def translate_array(
    src: np.ndarray,
    srcwin=None,
    outsize=None,
    bands=None,
    scale=None,
    exponent: float | None = None,
    out_dtype=None,
    resampling: str = "near",
):
    """Apply the translate pipeline to one decoded array.

    srcwin may extend past the raster edge: out-of-raster area is 0-filled
    (FixSrcDstWindow pads rather than errors when partially outside).
    """
    src = np.asarray(src)
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, c = src.shape

    if bands is not None:
        src = src[:, :, list(bands)]
        c = src.shape[2]

    if srcwin is not None:
        xoff, yoff, xsize, ysize = (int(v) for v in srcwin)
        out = np.zeros((ysize, xsize, c), dtype=src.dtype)
        sx0, sy0 = max(0, xoff), max(0, yoff)
        sx1, sy1 = min(w, xoff + xsize), min(h, yoff + ysize)
        if sx1 > sx0 and sy1 > sy0:
            out[sy0 - yoff : sy1 - yoff, sx0 - xoff : sx1 - xoff] = src[
                sy0:sy1, sx0:sx1
            ]
        src = out

    if outsize is not None:
        ow, oh = outsize
        from ..resample import resize

        src = resize(src, oh, ow, resampling)

    arr = src.astype(np.float64)
    if scale is not None:
        smin, smax, dmin, dmax = (float(v) for v in scale)
        if exponent is None:
            # linear: dst = (src - smin) / (smax - smin) * (dmax - dmin) + dmin
            ratio = (dmax - dmin) / (smax - smin) if smax != smin else 0.0
            arr = (arr - smin) * ratio + dmin
        else:
            frac = np.clip((arr - smin) / (smax - smin), 0.0, 1.0)
            arr = dmin + np.power(frac, exponent) * (dmax - dmin)

    dt = np.dtype(out_dtype) if out_dtype is not None else src.dtype
    if dt.kind in "ui":
        info = np.iinfo(dt)
        arr = np.clip(np.round(arr), info.min, info.max)
    arr = arr.astype(dt)
    return arr[:, :, 0] if arr.shape[2] == 1 else arr


def xyz_array(arr: np.ndarray, gt, stride: int = 1, bands=None,
              skip_value=None):
    """gdal2xyz kernel: one decoded raster -> pixel-center point rows.

    Returns (px, py, x, y, band, value) numpy columns. Pixel centers per
    the reference (swig/python/gdal-utils/osgeo_utils/gdal2xyz.py):
    x = gt0 + (col + 0.5) * gt1 + (row + 0.5) * gt2 (same for y).
    `stride` subsamples every stride-th pixel in both axes;
    `skip_value` drops rows whose value equals it (-skipnodata).
    """
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    bsel = list(range(c)) if bands is None else list(bands)
    cols = np.arange(0, w, stride)
    rows = np.arange(0, h, stride)
    C, R = np.meshgrid(cols, rows)
    C, R = C.ravel(), R.ravel()
    x = gt[0] + (C + 0.5) * gt[1] + (R + 0.5) * gt[2]
    y = gt[3] + (C + 0.5) * gt[4] + (R + 0.5) * gt[5]
    px = np.tile(C, len(bsel))
    py = np.tile(R, len(bsel))
    xs = np.tile(x, len(bsel))
    ys = np.tile(y, len(bsel))
    bs = np.repeat(np.array(bsel, dtype=np.int32), len(C))
    vs = np.concatenate([arr[R, C, b].astype(np.float64) for b in bsel])
    if skip_value is not None:
        keep = vs != float(skip_value)
        px, py, xs, ys, bs, vs = (a[keep] for a in (px, py, xs, ys, bs, vs))
    return px, py, xs, ys, bs, vs


XYZ_SCHEMA = (
    "image_id string, px int, py int, x double, y double, "
    "band int, value double"
)


def raster_to_xyz(images, stride: int = 1, bands=None, skip_value=None):
    """DataFrame operator: raster table -> pixel-center point table
    (the engine's gdal2xyz). Narrow stage (mapInPandas, no shuffle);
    output feeds the point-side operators (IDW/kNN/rasterize round
    trips). Row count is w*h*n_bands/stride^2 per image — at 100 TB
    keep stride>1 or filter downstream so the scan stays the cost."""
    import pandas as pd

    def do(batches):
        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
                px, py, xs, ys, bs, vs = xyz_array(
                    arr, gt, stride=stride, bands=bands,
                    skip_value=skip_value,
                )
                frames.append(pd.DataFrame({
                    "image_id": r.image_id,
                    "px": px.astype("int32"), "py": py.astype("int32"),
                    "x": xs, "y": ys,
                    "band": bs, "value": vs,
                }))
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(
                    columns=["image_id", "px", "py", "x", "y", "band",
                             "value"]
                )
            )

    return images.mapInPandas(do, schema=XYZ_SCHEMA)


def translate_images(
    images,
    srcwin=None,
    projwin=None,
    outsize=None,
    bands=None,
    scale=None,
    exponent=None,
    resampling: str = "near",
    out_fmt: str | None = None,
):
    """DataFrame operator: run the translate pipeline on every image row.

    Geotransform is updated for the window/resize exactly like the
    reference (offset by window origin, scale pixel size by in/out ratio).
    Caption + phash pass through. Narrow stage (mapInPandas, no shuffle).
    """
    import pandas as pd

    from .warp import IMAGE_OUT_SCHEMA

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                src = codecs.decode_image(bytes(r.bytes), r.fmt)
                gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
                win = srcwin
                if projwin is not None:
                    win = projwin_to_srcwin(gt, *projwin)
                arr = translate_array(
                    src,
                    srcwin=win,
                    outsize=outsize,
                    bands=bands,
                    scale=scale,
                    exponent=exponent,
                    out_dtype=np.uint8,
                    resampling=resampling,
                )
                oh, ow = arr.shape[:2]
                # new geotransform: shift origin to window, rescale pixels
                xoff, yoff = (win[0], win[1]) if win is not None else (0, 0)
                wsx = win[2] if win is not None else r.w
                wsy = win[3] if win is not None else r.h
                ngt0 = gt[0] + xoff * gt[1] + yoff * gt[2]
                ngt3 = gt[3] + xoff * gt[4] + yoff * gt[5]
                # gdal_translate scales the ROTATION terms too
                # (gdal_translate_lib.cpp adfGeoTransform[2] *= ysize/oh,
                # [4] *= xsize/ow) — skipping them skews rotated rasters
                ngt = (
                    ngt0,
                    gt[1] * (wsx / ow),
                    gt[2] * (wsy / oh),
                    ngt3,
                    gt[4] * (wsx / ow),
                    gt[5] * (wsy / oh),
                )
                fmt = out_fmt or r.fmt
                if fmt == "jpg" and arr.ndim == 3 and arr.shape[2] == 4:
                    arr = arr[:, :, :3]
                buf = codecs.encode_image(arr, fmt)
                minx, miny, maxx, maxy = footprint_meters(ngt, ow, oh, r.srid)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": buf,
                        "w": ow,
                        "h": oh,
                        "fmt": fmt,
                        "caption": r.caption,
                        "phash": r.phash,
                        "gt0": ngt[0],
                        "gt1": ngt[1],
                        "gt2": ngt[2],
                        "gt3": ngt[3],
                        "gt4": ngt[4],
                        "gt5": ngt[5],
                        "srid": r.srid,
                        "minx": minx,
                        "miny": miny,
                        "maxx": maxx,
                        "maxy": maxy,
                    }
                )
            yield pd.DataFrame(rows)

    return images.mapInPandas(do, schema=IMAGE_OUT_SCHEMA)
