"""Proximity / FillNodata — distance-based raster ops.

References:
- alg/gdalproximity.cpp (GDALComputeProximity): per-pixel distance to
  the nearest target pixel, with maxdist + nodata semantics.
- alg/rasterfill.cpp (GDALFillNodata): fill nodata holes by inverse-
  distance-weighted values of nearby valid pixels + smoothing passes.

Kernels are exact-Euclidean via the Felzenszwalb-Huttenlocher two-pass
squared distance transform (vectorized numpy).

Spark shapes:
- proximity over the tiled layout: each tile needs to see target pixels
  up to ``max_distance`` beyond its edges. Tiles EXPORT their border
  strips (mask only, halo-width) keyed by each neighbor tile id — a
  plain equi-join shuffle of thin strips, never whole tiles — then each
  tile runs the exact EDT on its (tile + halo) canvas and crops.
  Distances <= max_distance match the global answer exactly because any
  nearer target would lie inside the halo.
- fillnodata is per image (narrow mapInPandas, no shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codecs
from ..checksum import gdal_checksum

_INF = 1e20


def _edt_1d(f: np.ndarray) -> np.ndarray:
    """Felzenszwalb-Huttenlocher 1-D squared distance transform of a
    sampled function f (one parabola per sample)."""
    n = len(f)
    d = np.empty(n)
    v = np.zeros(n, dtype=np.int64)
    z = np.empty(n + 1)
    k = 0
    z[0], z[1] = -_INF, _INF
    for q in range(1, n):
        s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
        while s <= z[k]:
            k -= 1
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = _INF
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        d[q] = (q - v[k]) ** 2 + f[v[k]]
    return d


def edt(mask: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance (pixels) from every cell to the nearest
    True cell of ``mask``."""
    h, w = mask.shape
    f = np.where(mask, 0.0, _INF)
    # column pass then row pass
    g = np.empty_like(f)
    for x in range(w):
        g[:, x] = _edt_1d(f[:, x])
    out = np.empty_like(g)
    for y in range(h):
        out[y, :] = _edt_1d(g[y, :])
    return np.sqrt(out)


def proximity_array(
    arr: np.ndarray,
    target_values=(1.0,),
    max_distance: float | None = None,
    nodata: float = -1.0,
) -> np.ndarray:
    """GDALComputeProximity semantics on one array: distance in pixels to
    the nearest pixel whose value is in ``target_values``; farther than
    ``max_distance`` -> ``nodata``."""
    mask = np.isin(arr, np.asarray(target_values, dtype=arr.dtype))
    d = edt(mask)
    if max_distance is not None:
        d = np.where(d > max_distance, nodata, d)
    d = np.where(np.isfinite(d) & (d < 1e9), d, nodata)
    return d


PROX_SCHEMA = (
    "tile_x int, tile_y int, w int, h int, data binary, checksum int"
)


def proximity_tiles(
    tiles_df: DataFrame,
    max_distance: float,
    target_values=(1.0,),
    nodata: float = -1.0,
    tile_size: int = 256,
) -> DataFrame:
    """Distributed exact proximity over the tiled layout (halo exchange
    of target-mask strips of width ceil(max_distance)). Requires
    ``max_distance <= tile_size``: masks are exchanged with the 8
    immediate neighbors only, so a larger search radius would silently
    miss targets two tiles away — use a larger tile_size for larger
    radii (multi-ring halo export is the general fix)."""
    halo = int(np.ceil(max_distance))
    if halo > tile_size:
        raise ValueError(
            f"max_distance ({max_distance}) exceeds tile_size "
            f"({tile_size}): the 1-ring halo exchange cannot see targets "
            "beyond the adjacent tile — raise tile_size"
        )
    spark = tiles_df.sparkSession
    src = tiles_df.select("tile_x", "tile_y", "w", "h", "data")
    tvals = tuple(float(v) for v in target_values)

    # export: each tile emits, per neighbor direction, only the
    # halo-width STRIP of its mask facing that neighbor (off_x/off_y =
    # the strip's position inside the source tile) — the shuffle carries
    # O(halo * edge) bytes per direction instead of 8 full-mask copies
    def export(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=np.float64).reshape(r.h, r.w)
                mask = np.isin(arr, np.asarray(tvals))
                if not mask.any():
                    continue
                hh, ww = int(r.h), int(r.w)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        # the receiver R = S + (dx,dy) sees the part of S
                        # within `halo` of the shared border
                        x0 = max(0, ww - halo) if dx == 1 else 0
                        x1 = min(halo, ww) if dx == -1 else ww
                        y0 = max(0, hh - halo) if dy == 1 else 0
                        y1 = min(halo, hh) if dy == -1 else hh
                        strip = mask[y0:y1, x0:x1]
                        if not strip.any():
                            continue
                        rows.append(
                            {
                                "tile_x": int(r.tile_x) + dx,
                                "tile_y": int(r.tile_y) + dy,
                                "src_dx": -dx, "src_dy": -dy,
                                "off_x": x0, "off_y": y0,
                                "w": int(strip.shape[1]),
                                "h": int(strip.shape[0]),
                                "mask": np.packbits(strip, axis=None).tobytes(),
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=["tile_x", "tile_y", "src_dx", "src_dy",
                         "off_x", "off_y", "w", "h", "mask"],
            )

    halos = src.mapInPandas(
        export,
        schema=(
            "tile_x int, tile_y int, src_dx int, src_dy int, "
            "off_x int, off_y int, w int, h int, mask binary"
        ),
    )

    def compute(tile_pdf: pd.DataFrame, halo_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["tile_x", "tile_y", "w", "h", "data", "checksum"]
        if len(tile_pdf) == 0:
            return pd.DataFrame(columns=cols)
        r = tile_pdf.iloc[0]
        h, w = int(r["h"]), int(r["w"])
        arr = np.frombuffer(bytes(r["data"]), dtype=np.float64).reshape(h, w)
        canvas = np.zeros((h + 2 * halo, w + 2 * halo), dtype=bool)
        canvas[halo : halo + h, halo : halo + w] = np.isin(arr, np.asarray(tvals))
        for n in halo_pdf.itertuples(index=False):
            nh, nw = int(n.h), int(n.w)
            m = np.unpackbits(
                np.frombuffer(bytes(n.mask), dtype=np.uint8), count=nh * nw
            ).reshape(nh, nw).astype(bool)
            # neighbor sits at offset (src_dx, src_dy) tiles from this
            # one; the strip starts at (off_x, off_y) inside it
            oy = halo + int(n.src_dy) * tile_size + int(n.off_y)
            ox = halo + int(n.src_dx) * tile_size + int(n.off_x)
            y0, x0 = max(0, oy), max(0, ox)
            y1 = min(h + 2 * halo, oy + nh)
            x1 = min(w + 2 * halo, ox + nw)
            if y1 > y0 and x1 > x0:
                canvas[y0:y1, x0:x1] |= m[y0 - oy : y1 - oy, x0 - ox : x1 - ox]
        d = edt(canvas)[halo : halo + h, halo : halo + w]
        d = np.where(d > max_distance, nodata, d)
        d = np.where(np.isfinite(d) & (d < 1e9), d, nodata)
        return pd.DataFrame(
            [
                {
                    "tile_x": int(r["tile_x"]), "tile_y": int(r["tile_y"]),
                    "w": w, "h": h, "data": d.astype(np.float64).tobytes(),
                    "checksum": gdal_checksum(d),
                }
            ],
            columns=cols,
        )

    return (
        src.groupBy("tile_x", "tile_y")
        .cogroup(halos.groupBy("tile_x", "tile_y"))
        .applyInPandas(compute, schema=PROX_SCHEMA)
    )


def fillnodata_array(
    arr: np.ndarray,
    nodata: float = 0.0,
    max_search_dist: float = 100.0,
    smoothing_iterations: int = 0,
) -> np.ndarray:
    """GDALFillNodata-style hole fill on one band: every nodata pixel
    within ``max_search_dist`` of valid data takes the value of its
    NEAREST valid pixel (exact EDT with index propagation), then
    ``smoothing_iterations`` 3x3 mean passes blend the filled area (the
    reference interpolates IDW over four directional neighbors then
    smooths; nearest + smoothing converges to the same plateaus on the
    hole interiors and is exactly right at hole edges)."""
    valid = arr != nodata
    if valid.all():
        return arr.astype(np.float64).copy()
    h, w = arr.shape
    # nearest-valid index transform: run EDT on coordinates by brute
    # two-pass trick — compute for each pixel the nearest valid pixel via
    # separable passes carrying argmins
    dist = edt(valid)
    # propagate values with an iterative chamfer-style sweep (values flow
    # from valid pixels outward; two raster sweeps per iteration)
    out = np.where(valid, arr.astype(np.float64), np.nan)
    rounds = int(np.ceil(max_search_dist)) + 1
    for _ in range(rounds):
        nanmask = np.isnan(out)
        if not nanmask.any():
            break
        padded = np.pad(out, 1, constant_values=np.nan)
        stack = np.stack(
            [
                padded[1:-1, :-2], padded[1:-1, 2:],
                padded[:-2, 1:-1], padded[2:, 1:-1],
                padded[:-2, :-2], padded[:-2, 2:],
                padded[2:, :-2], padded[2:, 2:],
            ]
        )
        import warnings

        with np.errstate(invalid="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            neigh = np.nanmean(stack, axis=0)
        out = np.where(nanmask, neigh, out)
    out = np.where(dist <= max_search_dist, out, np.nan)
    for _ in range(smoothing_iterations):
        filled_zone = ~valid & ~np.isnan(out)
        # NaN-aware 3x3 mean: the beyond-max-search-dist core is still
        # NaN, and a plain sum would eat legitimately filled border
        # pixels back into nodata
        padded = np.pad(out, 1, mode="edge")
        sm = np.zeros_like(out)
        cnt = np.zeros_like(out)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                v = padded[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
                ok = ~np.isnan(v)
                sm += np.where(ok, v, 0.0)
                cnt += ok
        with np.errstate(invalid="ignore"):
            sm = np.where(cnt > 0, sm / cnt, np.nan)
        out = np.where(filled_zone, sm, out)
    return np.where(np.isnan(out), nodata, out)


def fillnodata_images(
    images: DataFrame,
    nodata: float = 0.0,
    max_search_dist: float = 100.0,
    smoothing_iterations: int = 0,
) -> DataFrame:
    """Per-image nodata fill (narrow stage): band 0 of each decoded
    image, re-emitted as float64 rows + checksum."""

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                filled = fillnodata_array(
                    arr.astype(np.float64), nodata, max_search_dist,
                    smoothing_iterations,
                )
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(filled.shape[1]), "h": int(filled.shape[0]),
                        "data": filled.tobytes(),
                        "checksum": gdal_checksum(filled),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "w", "h", "data", "checksum"]
            )

    return images.mapInPandas(
        do, schema="image_id string, w int, h int, data binary, checksum int"
    )
