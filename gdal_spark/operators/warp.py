"""Warp: reproject + resample, the engine's gdalwarp.

Reference lifecycle (SURVEY.md §3.2): GDALWarpOperation chunks the output,
and per chunk evaluates the inverse transformer chain dst pixel -> dst geo
-> src geo -> src pixel (alg/gdaltransformer.cpp:3044-3145), then runs a
resampling kernel (alg/gdalwarpkernel.cpp). Spark mapping: one output
region (a tile, or a whole small output raster) = one task; the transformer
chain is closed-form vectorized numpy, evaluated EXACTLY by default.
GDAL's approximate transformer (gdalwarp -et 0.125,
apps/gdalwarp_lib.cpp:1568-1575; alg/gdaltransformer.cpp
GDALApproxTransform) is available as ``approx_error=`` — an error-bounded
control-lattice interpolation (_approx_grid_transform) that cuts the
per-pixel transcendental cost ~step^2/2-fold for the expensive CRS
families (UTM/LCC/AEA inverse series), the lever that matters when the
transform chain, not IO, dominates a 100-TB warp.

`warp_array` is the kernel; `warp_images` is the DataFrame operator
(mapInPandas, Arrow batches, no per-row Python).
"""

from __future__ import annotations

import math

import numpy as np

from .. import codecs
from ..grid import MercatorGrid
from ..resample import SAMPLERS, WINDOW_KERNELS, resize, sample_window_reduce

_MERC = MercatorGrid()

MAX_LAT = 85.05112878


def geo_transform_points(x, y, src_srid: int, dst_srid: int):
    """Closed-form coordinate transform between EPSG:4326, EPSG:3857,
    the UTM zones EPSG:326xx/327xx (Krueger-series transverse Mercator,
    gdal_spark.proj — sub-mm vs the independent Snyder series) and the
    Lambert Conformal Conic systems in proj.LCC_PARAMS (2154/3978/3034)
    and the Albers Equal-Area systems in proj.AEA_PARAMS (5070/3577).

    Replaces OGRCreateCoordinateTransformation (ogr/ogrct.cpp:1003-1032)
    for the CRS the engine supports; vectorized. Pairs not involving
    4326 compose through it. Dispatch is data-driven: any srid in
    proj.CRS_TABLE (UTM zones implicit; arbitrary parameter sets via
    proj.register_crs) resolves to its family transformer.
    """
    from ..proj import get_transformer

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if src_srid == dst_srid:
        return x, y
    if src_srid == 4326 and dst_srid == 3857:
        lat = np.clip(y, -MAX_LAT, MAX_LAT)
        mx, my = _MERC.latlon_to_meters(lat, x)
        return mx, my
    if src_srid == 3857 and dst_srid == 4326:
        lat, lon = _MERC.meters_to_latlon(x, y)
        return lon, lat
    t_src = get_transformer(src_srid) if src_srid != 4326 else None
    t_dst = get_transformer(dst_srid) if dst_srid != 4326 else None
    if src_srid == 4326 and t_dst is not None:
        return t_dst.forward(x, y)
    if t_src is not None and dst_srid == 4326:
        return t_src.inverse(x, y)
    if (t_src is not None or src_srid == 3857) and (
        t_dst is not None or dst_srid == 3857
    ):
        # compose via 4326
        lon, lat = geo_transform_points(x, y, src_srid, 4326)
        return geo_transform_points(lon, lat, 4326, dst_srid)
    raise ValueError(f"unsupported srid pair {src_srid}->{dst_srid}")


def invert_gt(gt):
    """Invert a 6-term geotransform (gcore/gdaldataset.cpp GDALInvGeoTransform
    semantics, general 2x2 affine)."""
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0:
        raise ValueError("non-invertible geotransform")
    inv1 = gt[5] / det
    inv2 = -gt[2] / det
    inv4 = -gt[4] / det
    inv5 = gt[1] / det
    inv0 = -(inv1 * gt[0] + inv2 * gt[3])
    inv3 = -(inv4 * gt[0] + inv5 * gt[3])
    return (inv0, inv1, inv2, inv3, inv4, inv5)


def apply_gt(gt, px, py):
    """Pixel/line -> geo  (gcore/gdaldataset.cpp:1357-1392)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return gt[0] + px * gt[1] + py * gt[2], gt[3] + px * gt[4] + py * gt[5]


def _approx_grid_transform(fn, xv, yv, max_err: float, step: int = 8):
    """Approximate ``fn`` (an exact vectorized (X, Y) -> (SX, SY) point
    transform) over the rectangular grid meshgrid(xv, yv) — the engine's
    GDALApproxTransformer (alg/gdaltransformer.cpp GDALApproxTransform;
    gdalwarp -et, default threshold 0.125 px, apps/gdalwarp_lib.cpp:1568):

    - evaluate ``fn`` exactly on a control lattice every ``step`` grid
      points (plus the last row/column),
    - bilinear-interpolate every other grid point from its lattice cell,
    - VALIDATE each cell at its center: if the exact transform there
      deviates from the interpolated value by more than ``max_err``
      (hypot, in output units — source pixels for the warp chain), every
      grid point of that cell is recomputed exactly.

    GDAL subdivides failing scanline segments recursively; recomputing the
    failing cell exactly gives the same guarantee (error <= max_err at
    every validated midpoint, exact values where validation fails) in two
    fixed vectorized passes instead of a recursion. Discontinuities (the
    mercator-domain pushes in warp_array's to_src_px) blow up the midpoint
    check and land in the exact path automatically. Exact evaluations:
    ~2/step^2 of the grid (at step=8: ~3%)."""
    xv = np.asarray(xv, dtype=np.float64)
    yv = np.asarray(yv, dtype=np.float64)
    nx, ny = len(xv), len(yv)
    if step < 2 or nx <= step or ny <= step:
        return fn(*np.meshgrid(xv, yv))
    ix = np.unique(np.r_[np.arange(0, nx, step), nx - 1])
    iy = np.unique(np.r_[np.arange(0, ny, step), ny - 1])
    CX, CY = fn(*np.meshgrid(xv[ix], yv[iy]))

    # per-point cell index + interpolation fraction along each axis
    jx = np.clip(np.searchsorted(ix, np.arange(nx), side="right") - 1, 0, len(ix) - 2)
    jy = np.clip(np.searchsorted(iy, np.arange(ny), side="right") - 1, 0, len(iy) - 2)
    tx = (xv - xv[ix[jx]]) / (xv[ix[jx + 1]] - xv[ix[jx]])
    ty = (yv - yv[iy[jy]]) / (yv[iy[jy + 1]] - yv[iy[jy]])
    TX, TY = np.meshgrid(tx, ty)

    def bilin(C):
        c00 = C[np.ix_(jy, jx)]
        c01 = C[np.ix_(jy, jx + 1)]
        c10 = C[np.ix_(jy + 1, jx)]
        c11 = C[np.ix_(jy + 1, jx + 1)]
        return (1 - TY) * ((1 - TX) * c00 + TX * c01) + TY * (
            (1 - TX) * c10 + TX * c11
        )

    SX, SY = bilin(CX), bilin(CY)

    # midpoint validation per lattice cell
    mxv = 0.5 * (xv[ix[:-1]] + xv[ix[1:]])
    myv = 0.5 * (yv[iy[:-1]] + yv[iy[1:]])
    EX, EY = fn(*np.meshgrid(mxv, myv))
    AX = 0.25 * (CX[:-1, :-1] + CX[:-1, 1:] + CX[1:, :-1] + CX[1:, 1:])
    AY = 0.25 * (CY[:-1, :-1] + CY[:-1, 1:] + CY[1:, :-1] + CY[1:, 1:])
    with np.errstate(invalid="ignore", over="ignore"):
        err = np.hypot(EX - AX, EY - AY)
    bad = ~(err <= max_err)  # NaN/inf midpoints are bad too
    if bad.any():
        bad_px = bad[np.ix_(jy, jx)]
        X, Y = np.meshgrid(xv, yv)
        ex, ey = fn(X[bad_px], Y[bad_px])
        SX[bad_px] = ex
        SY[bad_px] = ey
    return SX, SY


def warp_array(
    src: np.ndarray,
    src_gt,
    src_srid: int,
    dst_shape,
    dst_gt,
    dst_srid: int,
    resampling: str = "near",
    approx_error: float | None = None,
    approx_step: int = 8,
    src_nodata: float | None = None,
):
    """Warp one raster into a destination grid.

    Returns (out, alpha) where out has shape (dst_h, dst_w[, c]) float64 and
    alpha is a uint8 (dst_h, dst_w) validity mask (255 where the source
    covered the destination pixel) — the masker role of
    alg/gdalwarper.h:85-129.

    ``src_nodata`` is gdalwarp -srcnodata with UNIFIED_SRC_NODATA (the
    gdalwarp default): a source pixel whose bands ALL equal the value is
    invalid. The nodata mask is resampled through the SAME kernel and
    thresholded at majority (the density-mask shape _cut_one uses for
    source alpha). Deviation note: for the window-statistic kernels
    (average/sum/...) GDAL EXCLUDES nodata pixels from the statistic;
    this path instead masks destination pixels whose source window is
    majority-nodata — exact for fully-valid and fully-nodata windows,
    approximate on the boundary fringe.
    """
    dst_h, dst_w = dst_shape
    inv = invert_gt(src_gt)

    def to_src_px(ppx, ppy):
        gx, gy = apply_gt(dst_gt, ppx, ppy)
        sx, sy = geo_transform_points(gx, gy, dst_srid, src_srid)
        rx, ry = apply_gt(inv, sx, sy)
        if src_srid == 3857 and dst_srid != 3857:
            # destination points above the mercator domain (|lat| >
            # 85.051...) have NO source: without this they clip onto the
            # source's edge row and smear it across the polar area —
            # GDAL's transformer fails those points and the masker
            # writes nodata, so push them far out of bounds instead
            lat = (
                gy
                if dst_srid == 4326
                else geo_transform_points(gx, gy, dst_srid, 4326)[1]
            )
            oob = np.abs(lat) > MAX_LAT
            if np.any(oob):
                rx = np.where(oob, -1e18, rx)
                ry = np.where(oob, -1e18, ry)
        return rx, ry

    def eval_grid(xv, yv):
        """Transform the meshgrid of 1-D coordinate vectors — exactly, or
        through the error-bounded approximate transformer (gdalwarp -et)
        when ``approx_error`` is set."""
        if approx_error is not None:
            return _approx_grid_transform(
                to_src_px, xv, yv, approx_error, approx_step
            )
        return to_src_px(*np.meshgrid(xv, yv))

    if resampling in WINDOW_KERNELS:
        # window kernels (GRA_Average..GRA_RMS): per-dest-pixel source
        # box from the 4 transformed pixel corners (exact by default; the
        # approximate transformer bounds the corner error by approx_error)
        pe_x = np.arange(dst_w + 1, dtype=np.float64)
        pe_y = np.arange(dst_h + 1, dtype=np.float64)
        cx, cy = eval_grid(pe_x, pe_y)
        corners_x = np.stack(
            [cx[:-1, :-1], cx[:-1, 1:], cx[1:, :-1], cx[1:, 1:]], axis=-1
        )
        corners_y = np.stack(
            [cy[:-1, :-1], cy[:-1, 1:], cy[1:, :-1], cy[1:, 1:]], axis=-1
        )
        out, valid = sample_window_reduce(
            src,
            corners_x.min(axis=-1), corners_y.min(axis=-1),
            corners_x.max(axis=-1), corners_y.max(axis=-1),
            resampling,
        )
    else:
        # dst pixel centers -> src pixel through the transform chain
        px = np.arange(dst_w, dtype=np.float64) + 0.5
        py = np.arange(dst_h, dtype=np.float64) + 0.5
        spx, spy = eval_grid(px, py)
        sampler = SAMPLERS[resampling]
        out, valid = sampler(src, spx, spy)
    out = np.nan_to_num(out, nan=0.0)
    alpha = np.where(valid, 255, 0).astype(np.uint8)
    if out.ndim == 3:
        out = np.where(valid[:, :, None], out, 0)
    else:
        out = np.where(valid, out, 0)
    if src_nodata is not None:
        nd = (
            (src == src_nodata)
            if np.asarray(src).ndim == 2
            else np.all(np.asarray(src) == src_nodata, axis=2)
        )
        if nd.any():
            # density mask: point kernels resample the mask with their
            # own kernel; window statistics use AVERAGE (the valid
            # FRACTION — 'sum'/'min'/'mode' of a 0/255 mask would give
            # nonsense majorities), matching GDAL's density-mask shape
            mask_resampling = (
                "average" if resampling in WINDOW_KERNELS else resampling
            )
            a_out, _ = warp_array(
                np.where(nd, 0.0, 255.0), src_gt, src_srid, dst_shape,
                dst_gt, dst_srid, mask_resampling,
                approx_error=approx_error, approx_step=approx_step,
            )
            keep = np.atleast_3d(a_out)[:, :, 0] >= 127.5
            alpha = np.where(keep, alpha, 0).astype(np.uint8)
            out = np.where(keep[:, :, None] if out.ndim == 3 else keep, out, 0)
    return out, alpha


def suggested_output_grid(
    src_gt,
    src_srid: int,
    w: int,
    h: int,
    dst_srid: int,
    target_res: tuple[float, float] | None = None,
    tap: bool = False,
):
    """Output grid (gt, w, h) preserving approximate resolution.

    Simplified GDALSuggestedWarpOutput2 (alg/gdaltransformer.cpp:296-851):
    transform a border sample grid of the source, take the bounding box,
    and pick a square pixel size that keeps the diagonal pixel count.

    ``target_res=(xres, yres)`` is gdalwarp -tr (explicit output pixel
    size); ``tap=True`` is gdalwarp -tap (target aligned pixels,
    apps/gdalwarp_lib.cpp): the extent is snapped OUTWARD to multiples of
    the resolution so warps of adjacent sources land on one shared global
    grid — the option that makes independently-warped tiles of a 100-TB
    mosaic line up without resampling seams. GDAL requires -tr with -tap;
    so does this."""
    n = 21
    bx = np.concatenate(
        [
            np.linspace(0, w, n),
            np.linspace(0, w, n),
            np.zeros(n),
            np.full(n, float(w)),
        ]
    )
    by = np.concatenate(
        [np.zeros(n), np.full(n, float(h)), np.linspace(0, h, n), np.linspace(0, h, n)]
    )
    gx, gy = apply_gt(src_gt, bx, by)
    tx, ty = geo_transform_points(gx, gy, src_srid, dst_srid)
    minx, maxx = float(tx.min()), float(tx.max())
    miny, maxy = float(ty.min()), float(ty.max())
    if target_res is not None:
        px, py = float(target_res[0]), float(abs(target_res[1]))
        if tap:
            minx = math.floor(minx / px) * px
            maxx = math.ceil(maxx / px) * px
            miny = math.floor(miny / py) * py
            maxy = math.ceil(maxy / py) * py
        out_w = max(1, int(round((maxx - minx) / px)))
        out_h = max(1, int(round((maxy - miny) / py)))
        # -tr fixes the pixel size exactly; the extent (already snapped
        # under -tap) grows to the pixel count, as gdalwarp does
        gt = (minx, px, 0.0, maxy, 0.0, -py)
        return gt, out_w, out_h
    if tap:
        raise ValueError("tap=True requires target_res (gdalwarp -tap needs -tr)")
    diag_px = np.hypot(w, h)
    pixel = float(np.hypot(maxx - minx, maxy - miny) / diag_px)
    out_w = max(1, int(round((maxx - minx) / pixel)))
    out_h = max(1, int(round((maxy - miny) / pixel)))
    gt = (minx, (maxx - minx) / out_w, 0.0, maxy, 0.0, -(maxy - miny) / out_h)
    return gt, out_w, out_h


IMAGE_OUT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
    "gt5 double, srid int, minx double, miny double, maxx double, maxy double"
)


def warp_images(
    images,
    dst_srid: int,
    resampling: str = "near",
    out_fmt: str | None = None,
    cutline_wkb: bytes | None = None,
    approx_error: float | None = None,
    target_res: tuple[float, float] | None = None,
    tap: bool = False,
    src_nodata: float | None = None,
    on_error: str = "fail",
):
    """DataFrame operator: reproject every image row to ``dst_srid``.

    One row in -> one row out; caption/phash pass through untouched
    (per-row invariant). Runs as mapInPandas so each Arrow batch decodes,
    warps and re-encodes vectorized; no shuffle at all — Catalyst keeps
    this a single narrow stage, which is exactly the per-chunk parallelism
    of ChunkAndWarpImage (alg/gdalwarpoperation.cpp:1019) with executors
    in place of chunk threads.

    ``cutline_wkb``: optional (multi)polygon in DESTINATION CRS
    coordinates (gdalwarp -cutline semantics, apps/gdalwarp_lib.cpp
    cutline -> validity-mask path): output pixels whose centers fall
    outside the cutline are zeroed. The geometry ships in the task
    closure; the per-image mask is the engine's own scanline fill.

    ``approx_error``: gdalwarp -et — max transform-approximation error in
    SOURCE pixels (GDAL's default is 0.125); None (default) evaluates the
    transform chain exactly at every pixel.

    ``on_error``: 'fail' (default — gdalwarp parity: a corrupt source
    aborts) or 'skip' — a row whose bytes fail to DECODE is dropped so
    one truncated blob among 10^12 cannot kill the job (the multimodal
    data-cleaning convention); processing errors after a successful
    decode still raise (they indicate bugs, not data corruption).
    """
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    import pandas as pd

    from ..fixtures import footprint_meters

    cut_polys = None
    if cutline_wkb is not None:
        from .. import geom as _geom

        cut_polys = _geom.parse_wkb(bytes(cutline_wkb)).polygons()

    def do(batches):
        from .rasterize import fill_spans

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    src = codecs.decode_image(bytes(r.bytes), r.fmt)
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
                dst_gt, out_w, out_h = suggested_output_grid(
                    gt, r.srid, r.w, r.h, dst_srid,
                    target_res=target_res, tap=tap,
                )
                out, alpha = warp_array(
                    src, gt, r.srid, (out_h, out_w), dst_gt, dst_srid,
                    resampling, approx_error=approx_error,
                    src_nodata=src_nodata,
                )
                arr = np.clip(np.round(out), 0, 255).astype(np.uint8)
                if cut_polys is not None:
                    inv = invert_gt(dst_gt)
                    rings_px = [
                        np.stack(apply_gt(inv, rg[:, 0], rg[:, 1]), axis=1)
                        for poly in cut_polys
                        for rg in poly
                    ]
                    inside = fill_spans(rings_px, out_h, out_w)
                    arr = np.where(
                        inside[:, :, None] if arr.ndim == 3 else inside, arr, 0
                    )
                fmt = out_fmt or r.fmt
                if fmt == "jpg" and arr.ndim == 3 and arr.shape[2] == 4:
                    arr = arr[:, :, :3]
                buf = codecs.encode_image(arr, fmt)
                minx, miny, maxx, maxy = footprint_meters(dst_gt, out_w, out_h, dst_srid)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": buf,
                        "w": out_w,
                        "h": out_h,
                        "fmt": fmt,
                        "caption": r.caption,
                        "phash": r.phash,
                        "gt0": dst_gt[0],
                        "gt1": dst_gt[1],
                        "gt2": dst_gt[2],
                        "gt3": dst_gt[3],
                        "gt4": dst_gt[4],
                        "gt5": dst_gt[5],
                        "srid": dst_srid,
                        "minx": minx,
                        "miny": miny,
                        "maxx": maxx,
                        "maxy": maxy,
                    }
                )
            yield pd.DataFrame(rows)

    return images.mapInPandas(do, schema=IMAGE_OUT_SCHEMA)
