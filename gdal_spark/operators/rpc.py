"""RPC (Rational Polynomial Coefficient) georeferencing — RPC00B.

Reference: alg/gdalrpc.cpp (GDALCreateRPCTransformer / RPCEvaluate) and
the NITF RPC00B specification (public): image (row, col) is a ratio of
two 20-term cubic polynomials in normalized (lat, lon, height). The
ground->image direction is closed-form; image->ground is solved by
vectorized Newton iteration on the forward model at a fixed height —
the same shape as the reference's iterative RPCInverseTransformPoint.

Scale shape: an RPC set is 90 floats per image; evaluation is pure
vectorized numpy inside the usual narrow mapInPandas decode stage.
"""

from __future__ import annotations

import numpy as np

#: RPC00B term order (NITF spec / gdalrpc.cpp RPCEvaluate): products of
#: (P=lat_n, L=lon_n, H=height_n) per coefficient index 1..20.
_TERMS = (
    "1", "L", "P", "H", "LP", "LH", "PH", "LL", "PP", "HH",
    "PLH", "LLL", "LPP", "LHH", "LLP", "PPP", "PHH", "LLH", "PPH", "HHH",
)

_REQUIRED = (
    "line_off", "samp_off", "lat_off", "long_off", "height_off",
    "line_scale", "samp_scale", "lat_scale", "long_scale", "height_scale",
    "line_num_coeff", "line_den_coeff", "samp_num_coeff", "samp_den_coeff",
)


def _poly20(coef: np.ndarray, P, L, H):
    """Evaluate the 20-term RPC00B cubic (vectorized)."""
    return (
        coef[0]
        + coef[1] * L + coef[2] * P + coef[3] * H
        + coef[4] * L * P + coef[5] * L * H + coef[6] * P * H
        + coef[7] * L * L + coef[8] * P * P + coef[9] * H * H
        + coef[10] * P * L * H
        + coef[11] * L * L * L + coef[12] * L * P * P + coef[13] * L * H * H
        + coef[14] * L * L * P + coef[15] * P * P * P + coef[16] * P * H * H
        + coef[17] * L * L * H + coef[18] * P * P * H + coef[19] * H * H * H
    )


class RPCTransform:
    """RPC00B transformer. ``rpc`` is a dict with the standard offsets,
    scales and four 20-coefficient lists (lowercase keys, see
    ``_REQUIRED``)."""

    def __init__(self, rpc: dict):
        missing = [k for k in _REQUIRED if k not in rpc]
        if missing:
            raise ValueError(f"RPC dict missing {missing}")
        self.r = {
            k: (np.asarray(rpc[k], dtype=np.float64)
                if k.endswith("_coeff") else float(rpc[k]))
            for k in _REQUIRED
        }
        for k in self.r:
            if k.endswith("_coeff") and self.r[k].shape != (20,):
                raise ValueError(f"{k} must have exactly 20 coefficients")

    def ground_to_image(self, lon, lat, height=0.0):
        """(lon, lat, h) -> (col = sample, row = line), vectorized —
        gdalrpc.cpp RPCTransformPoint."""
        r = self.r
        P = (np.asarray(lat, dtype=np.float64) - r["lat_off"]) / r["lat_scale"]
        L = (np.asarray(lon, dtype=np.float64) - r["long_off"]) / r["long_scale"]
        H = (np.asarray(height, dtype=np.float64) - r["height_off"]) / r[
            "height_scale"
        ]
        row = _poly20(r["line_num_coeff"], P, L, H) / _poly20(
            r["line_den_coeff"], P, L, H
        )
        col = _poly20(r["samp_num_coeff"], P, L, H) / _poly20(
            r["samp_den_coeff"], P, L, H
        )
        return (
            col * r["samp_scale"] + r["samp_off"],
            row * r["line_scale"] + r["line_off"],
        )

    def image_to_ground(
        self, col, row, height=0.0, max_iter: int = 12, tol: float = 1e-10
    ):
        """(col, row, h) -> (lon, lat): vectorized Newton on the forward
        model with numeric partials (the reference's iterative inverse,
        gdalrpc.cpp RPCInverseTransformPoint). ``tol`` is in pixels."""
        r = self.r
        col = np.asarray(col, dtype=np.float64)
        row = np.asarray(row, dtype=np.float64)
        lon = np.full(np.shape(col) or (1,), r["long_off"], dtype=np.float64)
        lat = np.full(np.shape(row) or (1,), r["lat_off"], dtype=np.float64)
        dl = 1e-7 * max(abs(r["long_scale"]), 1.0)
        dp = 1e-7 * max(abs(r["lat_scale"]), 1.0)
        for _ in range(max_iter):
            c0, r0 = self.ground_to_image(lon, lat, height)
            ec, er = c0 - col, r0 - row
            if max(np.abs(ec).max(initial=0), np.abs(er).max(initial=0)) < tol:
                break
            c1, r1 = self.ground_to_image(lon + dl, lat, height)
            c2, r2 = self.ground_to_image(lon, lat + dp, height)
            j00 = (c1 - c0) / dl  # dcol/dlon
            j01 = (c2 - c0) / dp  # dcol/dlat
            j10 = (r1 - r0) / dl  # drow/dlon
            j11 = (r2 - r0) / dp  # drow/dlat
            det = j00 * j11 - j01 * j10
            det = np.where(det == 0.0, np.nan, det)
            lon = lon - (ec * j11 - er * j01) / det
            lat = lat - (er * j00 - ec * j10) / det
        if np.shape(col) == ():
            return float(lon[0]), float(lat[0])
        return lon, lat
