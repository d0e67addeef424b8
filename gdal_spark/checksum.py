"""GDAL golden-output checksum, re-derived from alg/gdalchecksum.cpp:48-253.

    checksum = sum over pixels (row-major) of  int(px) % primes[i % 11]
    where i = y * width + x  (per band), masked to 16 bits.

- primes = {7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43}
- integer data: C '%' (remainder truncated toward zero, sign of dividend)
- float data: converted like GDALCopyWords float->Int32: v+0.5, clamp to
  [-2147483647, 2147483647], floor; non-finite -> INT_MIN
- the running &0xffff per line is equivalent to one final mask (addition
  is a homomorphism mod 2**16 in two's complement)

This is the per-tile correctness oracle used throughout tests (the same
role band.Checksum() plays in autotest, e.g.
autotest/pyscripts/test_gdal2tiles.py:85-124).
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _int_from_double(a: np.ndarray) -> np.ndarray:
    out = np.full(a.shape, np.iinfo(np.int32).min, dtype=np.int64)
    finite = np.isfinite(a)
    v = a[finite] + 0.5
    r = np.where(
        v < -2147483647.0,
        -2147483647,
        np.where(v > 2147483647.0, 2147483647, np.floor(v)),
    ).astype(np.int64)
    out[finite] = r
    return out


# uint8 fast path: value%prime is a (11, 256) lookup; the pixel-index
# prime pattern per (h, w) is cached (tiles recur at a handful of shapes)
_REM8: np.ndarray | None = None
_IDX_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _rem8_table() -> np.ndarray:
    global _REM8
    if _REM8 is None:
        v = np.arange(256, dtype=np.int64)
        _REM8 = np.stack([v % p for p in PRIMES]).astype(np.int32)
    return _REM8


def _idx11(h: int, w: int) -> np.ndarray:
    key = (h, w)
    g = _IDX_CACHE.get(key)
    if g is None:
        g = (np.arange(h * w, dtype=np.int64) % 11).reshape(h, w)
        if h * w <= (1 << 21) and len(_IDX_CACHE) < 64:
            _IDX_CACHE[key] = g
    return g


def gdal_checksum(band: np.ndarray) -> int:
    """Checksum of one 2-D band (any dtype). Matches GDALChecksumImage for a
    full-band window (nXOff=nYOff=0)."""
    band = np.asarray(band)
    if band.ndim != 2:
        raise ValueError("gdal_checksum expects a single 2-D band")
    h, w = band.shape
    if band.dtype == np.uint8:
        rem = _rem8_table()[_idx11(h, w), band.astype(np.int64)]
        return int(rem.sum(dtype=np.int64)) & 0xFFFF
    if band.dtype.kind == "f":
        vals = _int_from_double(band.astype(np.float64))
    else:
        vals = band.astype(np.int64)
    p = PRIMES[_idx11(h, w)]
    # C remainder: truncation toward zero (numpy % floors, so fix negatives)
    absrem = np.abs(vals) % p
    rem = np.where(vals >= 0, absrem, -absrem)
    return int(rem.sum()) & 0xFFFF


def image_checksums(arr: np.ndarray) -> list[int]:
    """Per-band checksums of an (h, w) or (h, w, c) array — one LUT
    gather for all bands of a uint8 image."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        return [gdal_checksum(arr)]
    if arr.dtype == np.uint8:
        h, w, c = arr.shape
        rem = _rem8_table()[_idx11(h, w)[:, :, None], arr.astype(np.int64)]
        return [int(s) & 0xFFFF for s in rem.sum(axis=(0, 1), dtype=np.int64)]
    return [gdal_checksum(arr[:, :, b]) for b in range(arr.shape[2])]
