"""Quadkey-style int64 cell ids — the engine's H3/S2 analog.

A cell is an (z, x, y) XYZ-convention tile packed into one signed int64:

    cell = (z << 58) | (x << 29) | y          (z <= 28, x/y < 2**29)

This replaces the reference's spatial index structures (shapefile .qix,
GPKG RTree, quadtree ``port/cpl_quad_tree.cpp``): instead of a per-node
tree probe, covering cells become an equi-join key that Spark hash
partitions — the distributed analog recommended by the reference itself
("copy method layer into memory layer", ogr/ogrlayer.cpp:3284-3285 -> our
broadcast join; quadtree radius search alg/gdalgrid.cpp:245-340 -> our
k-ring expansion).

All functions are numpy-vectorized; Spark-side cell assignment is pure
column math in :mod:`gdal_spark.grid` composed with these packers.
"""

from __future__ import annotations

import numpy as np

Z_SHIFT = 58
X_SHIFT = 29
XY_MASK = (1 << 29) - 1


def pack(z, x, y):
    """(z, x, y) XYZ tile -> int64 cell id."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (z << Z_SHIFT) | (x << X_SHIFT) | y


def unpack(cell):
    cell = np.asarray(cell, dtype=np.int64)
    z = cell >> Z_SHIFT
    x = (cell >> X_SHIFT) & XY_MASK
    y = cell & XY_MASK
    return z, x, y


def parent(cell, steps: int = 1):
    """Cell at zoom z-steps containing this cell."""
    z, x, y = unpack(cell)
    return pack(z - steps, x >> steps, y >> steps)


def children(cell):
    """The 4 child cells at zoom z+1 (returns array shape (..., 4))."""
    z, x, y = unpack(cell)
    cx = (np.asarray(x)[..., None] << 1) + np.array([0, 1, 0, 1])
    cy = (np.asarray(y)[..., None] << 1) + np.array([0, 0, 1, 1])
    return pack(np.asarray(z)[..., None] + 1, cx, cy)


def ring_offsets(radius: int):
    """Chebyshev ring at exactly `radius` (the 8r cells of the square ring).

    radius=0 -> [(0,0)]. Mirrors the quadtree radius-expansion search shape
    of alg/gdalgrid.cpp:245-340 on a regular grid.
    """
    if radius == 0:
        return np.zeros((1, 2), dtype=np.int64)
    offs = []
    r = radius
    for dx in range(-r, r + 1):
        offs.append((dx, -r))
        offs.append((dx, r))
    for dy in range(-r + 1, r):
        offs.append((-r, dy))
        offs.append((r, dy))
    return np.array(offs, dtype=np.int64)


def disk_offsets(radius: int):
    """All offsets with Chebyshev distance <= radius ((2r+1)^2 cells)."""
    r = radius
    dx, dy = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1), indexing="ij")
    return np.stack([dx.ravel(), dy.ravel()], axis=1).astype(np.int64)


def neighbors(cell, offsets, wrap_x: bool = True):
    """Apply (dx, dy) offsets to cells; x wraps around the antimeridian,
    y is clamped (rows outside [0, 2**z-1] are dropped by the caller via
    the returned validity mask).

    Returns (cells', valid) with shape (..., len(offsets)).
    """
    z, x, y = unpack(cell)
    n = np.int64(1) << np.asarray(z)[..., None]
    nx = np.asarray(x)[..., None] + offsets[:, 0]
    ny = np.asarray(y)[..., None] + offsets[:, 1]
    if wrap_x:
        nx = np.mod(nx, n)
        valid = (ny >= 0) & (ny < n)
    else:
        valid = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        nx = np.clip(nx, 0, n - 1)
    ny = np.clip(ny, 0, n - 1)
    return pack(np.asarray(z)[..., None], nx, ny), valid


def quadkey_str(cell):
    """Microsoft-style quadkey string (for debugging / partition prefixes).

    Digit per zoom level, per gdal2tiles.py GlobalMercator.QuadTree.
    """
    z, x, y = (int(v) for v in unpack(np.asarray(cell).ravel()[0:1]))
    key = ""
    for i in range(z, 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if x & mask:
            digit += 1
        if y & mask:
            digit += 2
        key += str(digit)
    return key


# ---------------------------------------------------------------------------
# Hexagonal binning (H3-style planar aggregation cells)


def hex_cell(x, y, size: float):
    """Planar pointy-top hexagon assignment — the H3-usage-pattern density
    aggregation (hex bins have uniform neighbor distance and ~13% lower
    quantization error than squares) without H3's icosahedral global
    index, which planar/Mercator workloads don't need. Standard axial
    coordinates + cube rounding:

        q = (x * sqrt(3)/3 - y/3) / size,  r = (2/3 * y) / size

    fractional cube ``(q, -q-r, r)`` rounds per-component, then the
    component with the LARGEST rounding error is recomputed from the
    other two so q+s+r == 0 stays exact. Returns (q, r) int64 axial ids.

    numpy twin of :func:`col_hex_cell`; the DuckDB oracle replays the
    identical expressions, association order preserved.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    qf = (x * (np.sqrt(3.0) / 3.0) - y * (1.0 / 3.0)) / size
    rf = (y * (2.0 / 3.0)) / size
    sf = -qf - rf
    # round half away from zero (matches Spark/DuckDB round())
    # trunc-toward-zero after the half-offset == round half away from
    # zero, and matches the Column path's cast("long") exactly
    rq = np.trunc(qf + np.where(qf >= 0, 0.5, -0.5))
    rr = np.trunc(rf + np.where(rf >= 0, 0.5, -0.5))
    rs = np.trunc(sf + np.where(sf >= 0, 0.5, -0.5))
    dq, dr, ds = np.abs(rq - qf), np.abs(rr - rf), np.abs(rs - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -rr - rs, rq)
    r = np.where(fix_r, -rq - rs, rr)
    return q.astype(np.int64), r.astype(np.int64)


def hex_center(q, r, size: float):
    """Axial (q, r) -> center (x, y) of the pointy-top hexagon."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    return (
        size * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r),
        size * (1.5 * r),
    )


def col_hex_cell(x, y, size: float):
    """Column form of :func:`hex_cell` -> (q, r) Column pair; pure
    whole-stage-codegen math (trig-free), identical expression order."""
    from pyspark.sql import functions as F

    s3 = float(np.sqrt(3.0) / 3.0)
    qf = (x * s3 - y * (1.0 / 3.0)) / size
    rf = (y * (2.0 / 3.0)) / size
    sf = -qf - rf
    # cast-to-long truncates toward zero in both Spark and DuckDB
    rq = (qf + F.when(qf >= 0, 0.5).otherwise(-0.5)).cast("long")
    rr = (rf + F.when(rf >= 0, 0.5).otherwise(-0.5)).cast("long")
    rs = (sf + F.when(sf >= 0, 0.5).otherwise(-0.5)).cast("long")
    dq = F.abs(rq - qf)
    dr = F.abs(rr - rf)
    ds = F.abs(rs - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = F.when(fix_q, -rr - rs).otherwise(rq)
    r = F.when(fix_r, -rq - rs).otherwise(rr)
    return q, r
