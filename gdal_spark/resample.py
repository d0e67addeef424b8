"""Resampling kernels, pure numpy — the engine's GDALWarpKernel.

The reference dispatches specialized kernels by (algorithm x dtype x mask)
in alg/gdalwarpkernel.cpp:1202-1318; here the "dispatch" is numpy ufunc
vectorization over whole tiles. Implemented algorithms (GRA_* names from
alg/gdalwarper.h:36-69):

- near          : pick nearest source pixel
- bilinear      : 2x2 weighted (GWKBilinear*)
- cubic         : 4x4 Catmull-Rom (GWKCubic*, coefficients from
                  gdalwarpkernel.cpp CubicConvolution, A=-0.5)
- lanczos       : 6x6 windowed sinc, radius 3 (GWKLanczosSinc*)
- average       : area-weighted box with exact fractional edge weights,
                  matching gcore/overview.cpp:1144-1825
                  (GDALResampleChunk32R_Average; left/right edge weights at
                  overview.cpp:1204-1214)
- mode          : most frequent value, first-seen tie-break
                  (GRA_Mode; tie strategy alg/gdalwarper.h:133-139 default)

All kernels operate on (h, w) or (h, w, c) float64/any-dtype arrays and an
optional validity mask; out-of-range source coordinates degrade gracefully
(bilinear/cubic fall back to nearest at edges, mirroring
alg/gdal_interpolateatpoint.cpp:200-202).
"""

from __future__ import annotations

import numpy as np


def _as3d(arr: np.ndarray) -> tuple[np.ndarray, bool]:
    if arr.ndim == 2:
        return arr[:, :, None], True
    return arr, False


# ---------------------------------------------------------------------------
# sampling at fractional source coordinates (the warp inner loop)
# ---------------------------------------------------------------------------


def sample_nearest(src: np.ndarray, xs: np.ndarray, ys: np.ndarray):
    """Sample src at fractional pixel coords (xs, ys); coords are in GDAL
    pixel space (0,0 = upper-left corner of upper-left pixel, so the pixel
    index is floor(coord)). Returns (values, valid)."""
    src3, squeeze = _as3d(np.asarray(src))
    h, w, c = src3.shape
    xi = np.floor(xs).astype(np.int64)
    yi = np.floor(ys).astype(np.int64)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = np.clip(xi, 0, w - 1)
    yi = np.clip(yi, 0, h - 1)
    out = src3[yi, xi]
    if squeeze:
        out = out[..., 0]
    return out, valid


def sample_bilinear(src: np.ndarray, xs: np.ndarray, ys: np.ndarray):
    """2x2 bilinear at pixel *centers* (center of pixel (i,j) is at
    (j+0.5, i+0.5)); degrades to nearest where the 2x2 stencil would leave
    the raster (alg/gdal_interpolateatpoint.cpp:200-202)."""
    src3, squeeze = _as3d(np.asarray(src, dtype=np.float64))
    h, w, c = src3.shape
    gx = np.asarray(xs, dtype=np.float64) - 0.5
    gy = np.asarray(ys, dtype=np.float64) - 0.5
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    fx = (gx - x0)[..., None]
    fy = (gy - y0)[..., None]
    interior = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    v00 = src3[y0c, x0c]
    v01 = src3[y0c, x0c + 1]
    v10 = src3[y0c + 1, x0c]
    v11 = src3[y0c + 1, x0c + 1]
    bil = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    near, valid = sample_nearest(src3, xs, ys)
    out = np.where(interior[..., None], bil, near.astype(np.float64))
    if squeeze:
        out = out[..., 0]
    return out, valid


def _cubic_weights(f: np.ndarray) -> np.ndarray:
    """Catmull-Rom (A=-0.5) weights for offsets -1..2 given fraction f.

    Same polynomial as GWKCubicComputeWeights (alg/gdalwarpkernel.cpp)."""
    a = -0.5
    f = np.asarray(f, dtype=np.float64)
    w = np.empty(f.shape + (4,), dtype=np.float64)
    for i, d in enumerate((-1.0, 0.0, 1.0, 2.0)):
        x = np.abs(f - d)
        w[..., i] = np.where(
            x <= 1.0,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2.0, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )
    return w


def _bspline_weights(f: np.ndarray) -> np.ndarray:
    """Cubic B-spline weights for offsets -1..2 (GRA_CubicSpline,
    GWKBSpline in alg/gdalwarpkernel.cpp): smoothing kernel
    w(x) = (1/6)[(2-|x|)^3 - 4(1-|x|)^3]_+ ."""
    f = np.asarray(f, dtype=np.float64)
    w = np.empty(f.shape + (4,), dtype=np.float64)
    for i, d in enumerate((-1.0, 0.0, 1.0, 2.0)):
        x = np.abs(f - d)
        t2 = np.clip(2.0 - x, 0.0, None) ** 3
        t1 = np.clip(1.0 - x, 0.0, None) ** 3
        w[..., i] = (t2 - 4.0 * t1) / 6.0
    return w


def _lanczos_weights(f: np.ndarray, radius: int = 3) -> np.ndarray:
    """Lanczos-windowed sinc weights for offsets (1-radius)..radius."""
    f = np.asarray(f, dtype=np.float64)
    offs = np.arange(1 - radius, radius + 1, dtype=np.float64)
    x = f[..., None] - offs
    with np.errstate(divide="ignore", invalid="ignore"):
        w = (
            radius
            * np.sin(np.pi * x)
            * np.sin(np.pi * x / radius)
            / (np.pi**2 * x**2)
        )
    w = np.where(np.abs(x) < 1e-12, 1.0, w)
    w = np.where(np.abs(x) >= radius, 0.0, w)
    return w / w.sum(axis=-1, keepdims=True)


def _separable_sample(src3, xs, ys, weight_fn, taps: int):
    h, w, c = src3.shape
    gx = np.asarray(xs, dtype=np.float64) - 0.5
    gy = np.asarray(ys, dtype=np.float64) - 0.5
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    wx = weight_fn(gx - x0)  # (..., taps)
    wy = weight_fn(gy - y0)
    lo = taps // 2 - 1
    acc = np.zeros(gx.shape + (c,), dtype=np.float64)
    for iy in range(taps):
        yy = np.clip(y0 + (iy - lo), 0, h - 1)
        row_acc = np.zeros_like(acc)
        for ix in range(taps):
            xx = np.clip(x0 + (ix - lo), 0, w - 1)
            row_acc += src3[yy, xx] * wx[..., ix][..., None]
        acc += row_acc * wy[..., iy][..., None]
    return acc


def sample_cubic(src, xs, ys):
    src3, squeeze = _as3d(np.asarray(src, dtype=np.float64))
    out = _separable_sample(src3, xs, ys, _cubic_weights, 4)
    _, valid = sample_nearest(src3, xs, ys)
    if squeeze:
        out = out[..., 0]
    return out, valid


def sample_lanczos(src, xs, ys):
    src3, squeeze = _as3d(np.asarray(src, dtype=np.float64))
    out = _separable_sample(src3, xs, ys, _lanczos_weights, 6)
    _, valid = sample_nearest(src3, xs, ys)
    if squeeze:
        out = out[..., 0]
    return out, valid


def sample_cubicspline(src, xs, ys):
    src3, squeeze = _as3d(np.asarray(src, dtype=np.float64))
    out = _separable_sample(src3, xs, ys, _bspline_weights, 4)
    _, valid = sample_nearest(src3, xs, ys)
    if squeeze:
        out = out[..., 0]
    return out, valid


SAMPLERS = {
    "near": sample_nearest,
    "bilinear": sample_bilinear,
    "cubic": sample_cubic,
    "cubicspline": sample_cubicspline,
    "lanczos": sample_lanczos,
}


# ---------------------------------------------------------------------------
# window-reduce kernels (GRA_Average .. GRA_RMS, alg/gdalwarper.h:36-69)
# ---------------------------------------------------------------------------

WINDOW_KERNELS = ("average", "sum", "min", "max", "med", "q1", "q3", "rms", "mode")

_MAX_GATHER = 64  # window cap for the gather path (memory = ndest*W^2)


def _mode_reduce(vals: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Most frequent value along the last axis (masked); ties break to
    the smallest value (our documented deterministic equivalent of the
    reference's first-occurrence strategy, alg/gdalwarper.h:133-139)."""
    big = np.inf
    v = np.where(mask, vals, big)
    s = np.sort(v, axis=-1)
    best_val = s[..., 0].copy()
    best_run = np.ones(s.shape[:-1], dtype=np.int64)
    run = np.ones(s.shape[:-1], dtype=np.int64)
    for k in range(1, s.shape[-1]):
        same = (s[..., k] == s[..., k - 1]) & np.isfinite(s[..., k])
        run = np.where(same, run + 1, 1)
        better = (run > best_run) & np.isfinite(s[..., k])
        best_run = np.where(better, run, best_run)
        best_val = np.where(better, s[..., k], best_val)
    return np.where(np.isfinite(best_val), best_val, np.nan)


def sample_window_reduce(src, bx0, by0, bx1, by1, kind: str):
    """Reduce all source pixels whose CENTERS fall in the per-dest-pixel
    box [bx0,bx1) x [by0,by1) (GDAL pixel coords) with the ``kind``
    statistic — the GWKAverageOrMode family (alg/gdalwarpkernel.cpp
    GRA_Average/Sum/Min/Max/Med/Q1/Q3/RMS/Mode). Boxes with no source
    center degrade to the nearest pixel (upsampling), like the point
    kernels degrade at edges. Returns (values, valid).

    Approximation note: windows wider than ``_MAX_GATHER`` (64) pixels per
    axis are sampled on a uniform stride covering the full box; statistics
    are then computed on the strided subsample. For ``kind='sum'`` the
    subsample total is rescaled by ``stride_x*stride_y`` — an unbiased
    ESTIMATE of the exact full-window total GDAL computes, not the exact
    value. At downsample factors <= 64x per axis (every tile-pyramid /
    overview level in this engine) the path is exact."""
    src3, squeeze = _as3d(np.asarray(src, dtype=np.float64))
    h, w, c = src3.shape
    bx0 = np.asarray(bx0, dtype=np.float64)
    by0 = np.asarray(by0, dtype=np.float64)
    bx1 = np.asarray(bx1, dtype=np.float64)
    by1 = np.asarray(by1, dtype=np.float64)
    # first source center >= box start: center j+0.5 >= bx0 -> j >= bx0-0.5
    jx0 = np.ceil(bx0 - 0.5).astype(np.int64)
    jy0 = np.ceil(by0 - 0.5).astype(np.int64)
    # windows wider than the gather cap cover the FULL box with a
    # uniform stride (previously they truncated to the top-left corner,
    # silently biasing med/min/max/mode at extreme downsample factors);
    # stats on the strided subsample are an unbiased approximation and
    # `sum` is rescaled by the sampling fraction below
    need_x = int(max(1, np.ceil((bx1 - bx0).max() + 1)))
    need_y = int(max(1, np.ceil((by1 - by0).max() + 1)))
    stride_x = max(1, int(np.ceil(need_x / _MAX_GATHER)))
    stride_y = max(1, int(np.ceil(need_y / _MAX_GATHER)))
    sx = int(np.ceil(need_x / stride_x))
    sy = int(np.ceil(need_y / stride_y))
    ox = np.arange(sx, dtype=np.int64) * stride_x
    oy = np.arange(sy, dtype=np.int64) * stride_y
    gx = jx0[..., None, None] + ox[None, :]            # (..., 1, sx) broadcast
    gy = jy0[..., None, None] + oy[:, None]            # (..., sy, 1)
    gxc = np.clip(gx, 0, w - 1)
    gyc = np.clip(gy, 0, h - 1)
    cen_x = gx + 0.5
    cen_y = gy + 0.5
    mask = (
        (gx >= 0) & (gx < w) & (gy >= 0) & (gy < h)
        & (cen_x >= bx0[..., None, None]) & (cen_x < bx1[..., None, None])
        & (cen_y >= by0[..., None, None]) & (cen_y < by1[..., None, None])
    )
    vals = src3[gyc, gxc]                               # (..., sy, sx, c)
    flat_mask = mask.reshape(mask.shape[:-2] + (sy * sx,))
    flat_vals = vals.reshape(mask.shape[:-2] + (sy * sx, c))
    out = np.empty(flat_mask.shape[:-1] + (c,), dtype=np.float64)
    m3 = flat_mask[..., :, None]
    n = flat_mask.sum(axis=-1)[..., None].astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        if kind == "average":
            out = np.where(m3, flat_vals, 0.0).sum(axis=-2) / n
        elif kind == "sum":
            # strided windows see 1/(stride_x*stride_y) of the pixels —
            # rescale so the sum estimates the full-window total
            out = np.where(m3, flat_vals, 0.0).sum(axis=-2) * float(
                stride_x * stride_y
            )
        elif kind == "min":
            out = np.where(m3, flat_vals, np.inf).min(axis=-2)
            out = np.where(np.isfinite(out), out, np.nan)
        elif kind == "max":
            out = np.where(m3, flat_vals, -np.inf).max(axis=-2)
            out = np.where(np.isfinite(out), out, np.nan)
        elif kind == "rms":
            out = np.sqrt(np.where(m3, flat_vals**2, 0.0).sum(axis=-2) / n)
        elif kind in ("med", "q1", "q3"):
            q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[kind]
            masked = np.where(m3, flat_vals, np.nan)
            out = np.nanquantile(masked, q, axis=-2)
        elif kind == "mode":
            res = np.empty(flat_mask.shape[:-1] + (c,), dtype=np.float64)
            for ci in range(c):
                res[..., ci] = _mode_reduce(flat_vals[..., ci], flat_mask)
            out = res
        else:
            raise ValueError(f"unknown window kernel {kind!r}")
    # empty windows (upsampling): nearest-pixel fallback at the box center
    empty = n[..., 0] == 0
    if empty.any():
        cxp = 0.5 * (bx0 + bx1)
        cyp = 0.5 * (by0 + by1)
        near, _ = sample_nearest(src3, cxp, cyp)
        out = np.where(empty[..., None], near, out)
    # valid where the box center lands inside the raster
    _, valid = sample_nearest(
        src3, 0.5 * (bx0 + bx1), 0.5 * (by0 + by1)
    )
    if squeeze:
        out = out[..., 0]
    return out, valid


# ---------------------------------------------------------------------------
# whole-array rescale (translate -outsize / overview build)
# ---------------------------------------------------------------------------


def resize_average(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-weighted box downsample with exact fractional edge weights.

    Re-derivation of gcore/overview.cpp:1144-1825 (Average): each output
    pixel integrates the source box [x*sx, (x+1)*sx) x [y*sy, (y+1)*sy);
    partial source pixels at the box edges get fractional weight
    (overview.cpp:1204-1214 PrecomputedXValue left/right weights). For
    integral factors this is the plain NxN mean. Works for upsampling too
    (boxes smaller than one pixel -> the covering pixel's value).
    """
    src3, squeeze = _as3d(np.asarray(src, dtype=np.float64))
    h, w, c = src3.shape

    def axis_weights(n_src: int, n_out: int):
        # cumulative sums along one axis: integral image trick per axis
        edges = np.arange(n_out + 1, dtype=np.float64) * (n_src / n_out)
        return edges

    # integral image over both axes: S[i, j] = sum of src[:i, :j]
    integ = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    np.cumsum(src3, axis=0, out=integ[1:, 1:]) if False else None
    integ[1:, 1:] = src3.cumsum(axis=0).cumsum(axis=1)

    ye = axis_weights(h, out_h)
    xe = axis_weights(w, out_w)

    def box_sum_1d(cum, e0, e1):
        """Integrate a cumsum-interpolated axis between fractional edges."""
        # linear interpolation of the integral image along one axis
        i0 = np.clip(np.floor(e0).astype(np.int64), 0, cum.shape[0] - 1)
        i1 = np.clip(np.floor(e1).astype(np.int64), 0, cum.shape[0] - 1)
        f0 = e0 - i0
        f1 = e1 - i1
        a = cum[i0] + (cum[np.minimum(i0 + 1, cum.shape[0] - 1)] - cum[i0]) * f0[:, None, None]
        b = cum[i1] + (cum[np.minimum(i1 + 1, cum.shape[0] - 1)] - cum[i1]) * f1[:, None, None]
        return b - a

    # integrate rows first: R[yo] = integral over y in [ye[yo], ye[yo+1])
    row = box_sum_1d(integ, ye[:-1], ye[1:])  # (out_h, w+1, c)
    row = np.transpose(row, (1, 0, 2))  # (w+1, out_h, c)
    box = box_sum_1d(row, xe[:-1], xe[1:])  # (out_w, out_h, c)
    box = np.transpose(box, (1, 0, 2))
    area = (ye[1:] - ye[:-1])[:, None, None] * (xe[1:] - xe[:-1])[None, :, None]
    out = box / area
    if squeeze:
        out = out[..., 0]
    return out


def resize(src: np.ndarray, out_h: int, out_w: int, resampling: str = "near") -> np.ndarray:
    """Rescale a full array to (out_h, out_w). Pixel-center sampling for
    point kernels; exact area integration for 'average'; center-in-box
    window reduce for the other GRA_* statistics kernels."""
    src = np.asarray(src)
    h = src.shape[0]
    w = src.shape[1]
    if out_h == h and out_w == w and resampling != "average":
        return src.astype(np.float64) if src.dtype.kind == "f" else src.copy()
    if resampling == "average":
        return resize_average(src, out_h, out_w)
    if resampling in WINDOW_KERNELS:
        xe = np.arange(out_w + 1, dtype=np.float64) * (w / out_w)
        ye = np.arange(out_h + 1, dtype=np.float64) * (h / out_h)
        bx0, by0 = np.meshgrid(xe[:-1], ye[:-1])
        bx1, by1 = np.meshgrid(xe[1:], ye[1:])
        out, _ = sample_window_reduce(src, bx0, by0, bx1, by1, resampling)
        return np.nan_to_num(out, nan=0.0)
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w)
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h)
    gx, gy = np.meshgrid(xs, ys)
    sampler = SAMPLERS[resampling]
    out, _ = sampler(src, gx, gy)
    return out


def resize_mode(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Mode (most frequent) downsample for integral factors; ties break to
    the smallest value (deterministic; GDAL default tie strategy is
    first-occurrence, alg/gdalwarper.h:133-139 — for our synthetic uint8
    data smallest-value is the stable equivalent we document and test)."""
    src3, squeeze = _as3d(np.asarray(src))
    h, w, c = src3.shape
    fy, fx = h // out_h, w // out_w
    crop = src3[: out_h * fy, : out_w * fx]
    blocks = crop.reshape(out_h, fy, out_w, fx, c).transpose(0, 2, 4, 1, 3).reshape(
        out_h, out_w, c, fy * fx
    )
    s = np.sort(blocks, axis=-1)
    best_val = s[..., 0].copy()
    best_run = np.ones(s.shape[:-1], dtype=np.int64)
    run = np.ones(s.shape[:-1], dtype=np.int64)
    for k in range(1, s.shape[-1]):
        same = s[..., k] == s[..., k - 1]
        run = np.where(same, run + 1, 1)
        better = run > best_run
        best_run = np.where(better, run, best_run)
        best_val = np.where(better, s[..., k], best_val)
    out = best_val
    if squeeze:
        out = out[..., 0]
    return out
