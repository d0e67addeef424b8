"""GCP polynomial georeferencing — the gdalwarp-with-GCPs path.

Reference semantics: alg/gdal_crs.cpp (GDALCreateGCPTransformer) fits a
least-squares bivariate polynomial of order 1, 2 or 3 between pixel/line
and georeferenced space, in both directions, on mean-centered
coordinates for conditioning; order n uses the full (n+1)(n+2)/2-term
basis {x^i y^j : i+j <= n} and needs >= that many GCPs (3/6/10). This
implementation re-derives the fit with numpy lstsq (SVD) rather than
the reference's hand-rolled normal-equation solver — same minimizer,
better conditioning.

Scale shape: a GCP set is tiny (tens of points, fit on the driver or
inside the UDF per image); applying the transform is vectorized numpy
over pixel blocks inside mapInPandas — the usual narrow decode stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs

MIN_GCPS = {1: 3, 2: 6, 3: 10}


def _basis(x, y, order: int) -> np.ndarray:
    """Columns x^i*y^j for i+j <= order, in (j, i) lexicographic order.
    Order fixes coefficient identity; both fit and apply share it."""
    x = np.asarray(x, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    cols = [
        (x**i) * (y**j)
        for j in range(order + 1)
        for i in range(order + 1 - j)
    ]
    return np.stack(cols, axis=1)


class GCPTransform:
    """Bidirectional polynomial transform fitted from ground control
    points [(pixel, line, geo_x, geo_y), ...]."""

    def __init__(self, gcps, order: int = 1):
        if order not in MIN_GCPS:
            raise ValueError("order must be 1, 2 or 3")
        g = np.asarray(gcps, dtype=np.float64)
        if g.ndim != 2 or g.shape[1] != 4:
            raise ValueError("gcps must be (n, 4): pixel, line, gx, gy")
        need = MIN_GCPS[order]
        if len(g) < need:
            raise ValueError(
                f"order {order} needs >= {need} GCPs, got {len(g)}"
            )
        self.order = order
        # mean-center each space before fitting (gdal_crs.cpp does the
        # same); the offsets are folded back at apply time
        self._mp = g[:, 0:2].mean(axis=0)
        self._mg = g[:, 2:4].mean(axis=0)
        P = _basis(g[:, 0] - self._mp[0], g[:, 1] - self._mp[1], order)
        G = _basis(g[:, 2] - self._mg[0], g[:, 3] - self._mg[1], order)
        self._fwd, res_f, rank_f, _ = np.linalg.lstsq(
            P, g[:, 2:4] - self._mg, rcond=None
        )
        self._inv, res_i, rank_i, _ = np.linalg.lstsq(
            G, g[:, 0:2] - self._mp, rcond=None
        )
        if rank_f < P.shape[1] or rank_i < G.shape[1]:
            raise ValueError(
                "degenerate GCP layout: polynomial system is rank-deficient"
            )
        # RMS residual of the forward fit (reported like gdalwarp -tps
        # logs); callers can gate on it
        d = P @ self._fwd - (g[:, 2:4] - self._mg)
        self.rms = float(np.sqrt((d * d).sum(axis=1).mean()))

    def forward(self, pixel, line):
        """(pixel, line) -> (geo_x, geo_y), vectorized."""
        shape = np.shape(pixel)
        B = _basis(
            np.asarray(pixel) - self._mp[0],
            np.asarray(line) - self._mp[1],
            self.order,
        )
        out = B @ self._fwd + self._mg
        return out[:, 0].reshape(shape), out[:, 1].reshape(shape)

    def inverse(self, geo_x, geo_y):
        """(geo_x, geo_y) -> (pixel, line): the independently-fitted
        reverse polynomial (reference behavior — NOT the algebraic
        inverse, which doesn't exist for order >= 2)."""
        shape = np.shape(geo_x)
        B = _basis(
            np.asarray(geo_x) - self._mg[0],
            np.asarray(geo_y) - self._mg[1],
            self.order,
        )
        out = B @ self._inv + self._mp
        return out[:, 0].reshape(shape), out[:, 1].reshape(shape)


class TPSTransform:
    """Thin-plate-spline transform fitted from GCPs — the gdalwarp -tps
    path (reference: alg/gdal_tps.cpp -> VizGeorefSpline2D). Radial
    basis U(r) = r^2 log r^2 plus an affine part; the spline
    INTERPOLATES every GCP exactly (vs the polynomial's least-squares
    fit). Forward and inverse are independently-fitted splines, exactly
    like the reference. Solve is a dense (n+3) system on mean-centered,
    scale-normalized coordinates — GCP sets are tiny, so this is
    driver/task-local numpy."""

    def __init__(self, gcps):
        g = np.asarray(gcps, dtype=np.float64)
        if g.ndim != 2 or g.shape[1] != 4:
            raise ValueError("gcps must be (n, 4): pixel, line, gx, gy")
        if len(g) < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self._fwd = self._fit(g[:, 0:2], g[:, 2:4])
        self._inv = self._fit(g[:, 2:4], g[:, 0:2])
        fx, fy = self._apply(self._fwd, g[:, 0], g[:, 1])
        d = np.stack([fx, fy], axis=1) - g[:, 2:4]
        self.rms = float(np.sqrt((d * d).sum(axis=1).mean()))

    @staticmethod
    def _fit(src: np.ndarray, dst: np.ndarray):
        mean = src.mean(axis=0)
        scale = max(float(np.abs(src - mean).max()), 1e-12)
        s = (src - mean) / scale
        n = len(s)
        d2 = ((s[:, None, :] - s[None, :, :]) ** 2).sum(-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            K = d2 * np.log(d2)
        K[d2 == 0.0] = 0.0
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        P = np.column_stack([np.ones(n), s])
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst
        try:
            coef = np.linalg.solve(A, rhs)
        except np.linalg.LinAlgError as exc:  # duplicate source points
            raise ValueError(f"degenerate TPS GCP layout: {exc}") from exc
        return (mean, scale, s, coef)

    @staticmethod
    def _apply(fit, x, y):
        mean, scale, s, coef = fit
        shape = np.shape(x)
        q = np.stack(
            [
                (np.asarray(x, dtype=np.float64).ravel() - mean[0]) / scale,
                (np.asarray(y, dtype=np.float64).ravel() - mean[1]) / scale,
            ],
            axis=1,
        )
        d2 = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            U = d2 * np.log(d2)
        U[d2 == 0.0] = 0.0
        n = len(s)
        out = (
            U @ coef[:n]
            + coef[n]
            + q[:, 0:1] * coef[n + 1]
            + q[:, 1:2] * coef[n + 2]
        )
        return out[:, 0].reshape(shape), out[:, 1].reshape(shape)

    def forward(self, pixel, line):
        return self._apply(self._fwd, pixel, line)

    def inverse(self, geo_x, geo_y):
        return self._apply(self._inv, geo_x, geo_y)


def _fit_transform(gcps, order):
    """order 1/2/3 -> polynomial (gdal_crs.cpp); order='tps' -> thin
    plate spline (gdal_tps.cpp)."""
    if order == "tps":
        return TPSTransform(gcps)
    return GCPTransform(gcps, order)


def _inverse_grid(gcps, out_gt, out_w: int, out_h: int, order):
    """Fit the GCP transform and evaluate the inverse transform over
    the full output pixel-center grid ONCE — this is the expensive,
    image-independent part of the warp (hoisted out of per-image loops)."""
    t = _fit_transform(gcps, order)
    cols = np.arange(out_w) + 0.5
    rows = np.arange(out_h) + 0.5
    C, R = np.meshgrid(cols, rows)
    gx = out_gt[0] + C * out_gt[1] + R * out_gt[2]
    gy = out_gt[3] + C * out_gt[4] + R * out_gt[5]
    return t.inverse(gx, gy)


def _sample_grid(arr3, sx, sy, resample: str, nodata: float):
    """Sample one source image at precomputed source coordinates.
    Bilinear clamps its 2x2 neighborhood at the edges (like the
    engine's resample.py samplers and GDAL's bilinear), so the last
    row/column interpolate against themselves instead of nodata-filling."""
    h, w, bands = arr3.shape
    out_h, out_w = sx.shape
    out = np.full((out_h, out_w, bands), nodata, dtype=np.float64)
    if resample == "near":
        ix = np.floor(sx).astype(np.int64)
        iy = np.floor(sy).astype(np.int64)
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        out[ok] = arr3[iy[ok], ix[ok], :]
    elif resample == "bilinear":
        fx = sx - 0.5
        fy = sy - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        wx = fx - x0
        wy = fy - y0
        # valid where the sample CENTER is inside the source; the 2x2
        # neighborhood clamps at the borders
        ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
        x0c = np.clip(x0, 0, w - 1)
        x1c = np.clip(x0 + 1, 0, w - 1)
        y0c = np.clip(y0, 0, h - 1)
        y1c = np.clip(y0 + 1, 0, h - 1)
        v00 = arr3[y0c, x0c, :]
        v01 = arr3[y0c, x1c, :]
        v10 = arr3[y1c, x0c, :]
        v11 = arr3[y1c, x1c, :]
        wxe = wx[..., None]
        wye = wy[..., None]
        val = (
            v00 * (1 - wxe) * (1 - wye)
            + v01 * wxe * (1 - wye)
            + v10 * (1 - wxe) * wye
            + v11 * wxe * wye
        )
        out[ok] = val[ok]
    else:
        raise ValueError(f"unsupported resample {resample!r}")
    return out


def warp_array_gcp(
    arr: np.ndarray,
    gcps,
    out_gt,
    out_w: int,
    out_h: int,
    order=1,
    resample: str = "near",
    nodata: float = 0.0,
) -> np.ndarray:
    """Resample one image onto a target grid through a GCP polynomial:
    for every output pixel center, geo -> (inverse poly) -> source
    pixel, then nearest/bilinear sample. Out-of-source pixels get
    `nodata`."""
    arr3 = np.atleast_3d(np.asarray(arr))
    sx, sy = _inverse_grid(gcps, out_gt, out_w, out_h, order)
    out = _sample_grid(arr3, sx, sy, resample, nodata)
    return out[:, :, 0] if out.shape[2] == 1 else out


def warp_images_gcp(
    images: DataFrame,
    gcps,
    out_gt,
    out_w: int,
    out_h: int,
    order=1,
    resample: str = "near",
    nodata: float = 0.0,
) -> DataFrame:
    """Distributed GCP warp: one narrow mapInPandas stage. The GCP fit
    and the inverse-transform grid are computed ONCE per task (they are
    image-independent) from the tiny closure-captured GCP list, and
    each image only pays the actual sampling — cheaper than broadcasting
    a fitted object and keeps tasks pure."""
    from ..checksum import gdal_checksum

    gcps = [tuple(map(float, g)) for g in gcps]

    def do(batches):
        sx, sy = _inverse_grid(gcps, out_gt, out_w, out_h, order)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                out3 = _sample_grid(
                    np.atleast_3d(np.asarray(arr)), sx, sy, resample, nodata
                )
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(out3.shape[1]),
                        "h": int(out3.shape[0]),
                        "data": out3.astype(np.float64).tobytes(),
                        "checksum": int(gdal_checksum(out3[:, :, 0])),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "w", "h", "data", "checksum"]
            )

    return images.mapInPandas(
        do, schema="image_id string, w int, h int, data binary, checksum int"
    )
