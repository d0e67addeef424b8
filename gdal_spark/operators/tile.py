"""XYZ/TMS tile pyramid — the engine's gdal2tiles, as a Spark dataflow.

Pipeline (SURVEY.md §3.3 mapping):

1. **zoom planning** — per-image native zoom from pixel size
   (ZoomForPixelSize, gdal2tiles.py:503-509) as pure Column math.
2. **tile assignment** — per-image covered (z, tx, ty) range
   (gdal2tiles.py:2428-2435 tminmax build) as pure Column math +
   ``explode(sequence(...))``; **no UDF, no pixel I/O** — this is the
   work-list build of generate_base_tiles (2797-2962) pushed into Catalyst,
   and the skip-no-source filter happens here, before any pixel work
   (the "single biggest saver at scale", SURVEY.md §4).
3. **fragment cut** — mapInPandas over image rows: decode once per image,
   emit one fragment per covered tile. 3857 north-up sources follow the
   gdal2tiles geo_query + oversample + scale_query_to_tile path digit for
   digit (gdal2tiles.py:2964-3006, 1334-1394); other sources take the exact
   per-tile warp (the gdalalg_raster_tile.cpp:647-649 per-tile
   WarpRegionToBuffer formulation).
4. **compose** — groupBy(z, tx, ty).applyInPandas: mosaic fragments in
   image_id order (gdalbuildvrt placement, apps/gdalbuildvrt_lib.cpp),
   append alpha (gdal2tiles.py:2815), encode PNG, GDAL checksum
   (alg/gdalchecksum.cpp) + lineage columns. The tile-key shuffle **is**
   the mosaic.
5. **overviews** — groupBy(parent tile).applyInPandas: place <=4 children
   in a 2x2 buffer by (x%2, y-parity) (gdal2tiles.py:1536-1550), 2:1
   average downsample with exact edge weights (gcore/overview.cpp), iterate
   z-1 .. tminz.

Scale notes: fragments, not whole images, cross the shuffle (<= ts*ts*c
bytes each); hot low-zoom cells are handled by AQE skew-join plus the
deliberate partial-composition structure (fragments of one tile can be
pre-composed per shuffle partition before the final merge when
``salt_partials`` is set).
"""

from __future__ import annotations

import math

import numpy as np

from .. import codecs
from ..checksum import image_checksums
from ..grid import ORIGIN_SHIFT, EARTH_RADIUS, MercatorGrid, geo_query, xyz_flip
from ..resample import resize
from .warp import warp_array

from pyspark.sql import Column
from pyspark.sql import functions as F

_MERC = MercatorGrid()


# ---------------------------------------------------------------------------
# stage 1+2: zoom planning + tile assignment (pure Column math)
# ---------------------------------------------------------------------------


def col_zoom_for_pixel_size(pixel_size, max_zoom: int = 31, tile_size: int = 256):
    """ZoomForPixelSize (gdal2tiles.py:503-509) as a Column expression:
    the last zoom that does not scale up, i.e. floor(log2(IR / ps)),
    clamped to [0, max_zoom]."""
    ir = 2 * math.pi * EARTH_RADIUS / tile_size
    raw = F.floor(F.log2(F.lit(ir) / pixel_size))
    return F.greatest(F.lit(0), F.least(F.lit(max_zoom), raw)).cast("int")


def native_zoom_col(tile_size: int = 256):
    """Native (max) zoom of an image row from its mercator pixel size.

    4326 rows: degree pixel size -> meters via the equatorial scale
    originShift/180 (the same scale LatLonToMeters applies to x,
    gdal2tiles.py:422-429)."""
    ps_m = F.when(F.col("srid") == 4326, F.col("gt1") * (ORIGIN_SHIFT / 180.0)).otherwise(
        F.col("gt1")
    )
    return col_zoom_for_pixel_size(ps_m, tile_size=tile_size)


def assign_tiles(images, zoom, tile_size: int = 256):
    """Explode each image row into its covered (z, tx, ty) TMS tiles at
    ``zoom`` (int or Column). Pure column math -> stays in WholeStageCodegen;
    Catalyst prunes to the 5 footprint columns before the explode."""
    z = zoom if isinstance(zoom, Column) else F.lit(int(zoom))
    ir = 2 * math.pi * EARTH_RADIUS / tile_size
    res = F.lit(ir) / F.pow(F.lit(2.0), z.cast("double"))
    ts = float(tile_size)

    def m2t(m):
        p = (m + ORIGIN_SHIFT) / res
        return (F.ceil(p / ts) - 1).cast("long")

    n1 = F.pow(F.lit(2.0), z.cast("double")).cast("long") - 1
    tminx = F.greatest(F.lit(0).cast("long"), m2t(F.col("minx")))
    tminy = F.greatest(F.lit(0).cast("long"), m2t(F.col("miny")))
    tmaxx = F.least(n1, m2t(F.col("maxx")))
    tmaxy = F.least(n1, m2t(F.col("maxy")))

    return (
        images.withColumn("z", z.cast("int"))
        .withColumn("_tminx", tminx)
        .withColumn("_tminy", tminy)
        .withColumn("_tmaxx", tmaxx)
        .withColumn("_tmaxy", tmaxy)
        .where(
            (F.col("_tmaxx") >= F.col("_tminx")) & (F.col("_tmaxy") >= F.col("_tminy"))
        )
        .withColumn("tx", F.explode(F.sequence(F.col("_tminx"), F.col("_tmaxx"))))
        .withColumn("ty", F.explode(F.sequence(F.col("_tminy"), F.col("_tmaxy"))))
        .drop("_tminx", "_tminy", "_tmaxx", "_tmaxy")
    )


# ---------------------------------------------------------------------------
# stage 3: fragment cut (mapInPandas — decode each image once)
# ---------------------------------------------------------------------------

FRAGMENT_SCHEMA = (
    "z int, tx long, ty long, image_id string, px binary, alpha binary, c int"
)


def _cut_window(arr, alpha_src, gt, w, h, bounds, ts: int, resampling: str):
    """geo_query cut of one tile from a north-up source already in the
    tile grid's CRS (shared by the mercator and geodetic paths)."""
    bminx, bminy, bmaxx, bmaxy = bounds
    (rx, ry, rxs, rys), (wx, wy, wxs, wys) = geo_query(
        gt, w, h, bminx, bmaxy, bmaxx, bminy, querysize=ts
    )
    rx, ry, rxs, rys = int(rx), int(ry), int(rxs), int(rys)
    wx, wy, wxs, wys = int(wx), int(wy), int(wxs), int(wys)
    if rxs <= 0 or rys <= 0 or wxs <= 0 or wys <= 0:
        return None
    patch = arr[ry : ry + rys, rx : rx + rxs]
    apatch = alpha_src[ry : ry + rys, rx : rx + rxs]
    from ..resample import WINDOW_KERNELS

    kern = resampling
    if (
        kern not in WINDOW_KERNELS
        and kern != "near"
        and (rxs > 2 * wxs or rys > 2 * wys)
    ):
        kern = "average"
    up = resize(patch.astype(np.float64), wys, wxs, kern)
    aup = resize(apatch.astype(np.float64)[:, :, None], wys, wxs, "average")[:, :, 0]
    c = up.shape[2]
    dq = np.zeros((ts, ts, c), dtype=np.float64)
    aq = np.zeros((ts, ts), dtype=np.float64)
    dq[wy : wy + wys, wx : wx + wxs] = up
    aq[wy : wy + wys, wx : wx + wxs] = aup
    tile = np.clip(np.round(dq), 0, 255).astype(np.uint8)
    alpha = np.where(aq >= 127.5, 255, 0).astype(np.uint8)
    return tile, alpha


def _cut_one(arr, alpha_src, r, z: int, tx: int, ty: int, tile_size: int, resampling: str):
    """Cut one (image, tile) fragment. Returns (tile_rgb uint8 (ts,ts,c),
    alpha uint8 (ts,ts)) or None if the tile has no coverage."""
    ts = tile_size
    gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
    b = _MERC.tile_bounds(tx, ty, z)
    bminx, bminy, bmaxx, bmaxy = (float(v) for v in b)

    if r.srid == 3857 and gt[2] == 0.0 and gt[4] == 0.0:
        # gdal2tiles base-tile path: geo_query read/write windows.
        # NOTE: for read windows >2x the write window this path uses the
        # exact area-average reducer REGARDLESS of `resampling` (the
        # oversample+shrink gdal2tiles performs converges to the area
        # integral; point kernels on a >2x decimation would alias) —
        # the per-tile WARP branch below honors the kernel literally.
        # (gdal2tiles.py:2964-3006, create_base_tile 1283-1436). gdal2tiles
        # oversamples to querysize=4*ts then downsamples; we resize the read
        # window straight to the write window in one pass — same integral
        # (area-average is exact, resize_average edge weighting), ~16x less
        # memory traffic per fragment.
        cut = _cut_window(
            arr, alpha_src, gt, r.w, r.h,
            (bminx, bminy, bmaxx, bmaxy), ts, resampling,
        )
        if cut is None:
            return None
        tile, alpha = cut
    else:
        # per-tile warp (apps/gdalalg_raster_tile.cpp:647-649 formulation);
        # every GRA_* kernel goes straight through (no silent fallback)
        from ..resample import WINDOW_KERNELS as _WK
        from ..resample import SAMPLERS as _SK

        res = _MERC.resolution(z)
        dst_gt = (bminx, float(res), 0.0, bmaxy, 0.0, -float(res))
        samp = resampling if (resampling in _SK or resampling in _WK) else "bilinear"
        out, alpha = warp_array(arr, gt, r.srid, (ts, ts), dst_gt, 3857, samp)
        tile = np.clip(np.round(out), 0, 255).astype(np.uint8)
        if tile.ndim == 2:
            tile = tile[:, :, None]
        if alpha_src is not None:
            # source transparency must survive the warp: resample the
            # source alpha through the same transform and AND it into
            # the coverage mask (same 127.5 threshold as _cut_window)
            a_out, _cov = warp_array(
                alpha_src.astype(np.float64), gt, r.srid, (ts, ts),
                dst_gt, 3857, samp,
            )
            a2 = np.atleast_3d(a_out)[:, :, 0]
            alpha = np.where(
                (alpha > 0) & (a2 >= 127.5), 255, 0
            ).astype(np.uint8)
    if tile.ndim == 2:
        tile = tile[:, :, None]
    if not alpha.any():
        return None
    return tile, alpha


def tile_range_cols(images, zoom, tile_size: int = 256):
    """Covered TMS tile range per image at ``zoom`` (Column math only) —
    the tminmax build of gdal2tiles.py:2428-2435 without exploding."""
    z = zoom if isinstance(zoom, Column) else F.lit(int(zoom))
    ir = 2 * math.pi * EARTH_RADIUS / tile_size
    res = F.lit(ir) / F.pow(F.lit(2.0), z.cast("double"))
    ts = float(tile_size)

    def m2t(m):
        p = (m + ORIGIN_SHIFT) / res
        return (F.ceil(p / ts) - 1).cast("long")

    n1 = F.pow(F.lit(2.0), z.cast("double")).cast("long") - 1
    return (
        images.withColumn("z", z.cast("int"))
        .withColumn("tminx", F.greatest(F.lit(0).cast("long"), m2t(F.col("minx"))))
        .withColumn("tminy", F.greatest(F.lit(0).cast("long"), m2t(F.col("miny"))))
        .withColumn("tmaxx", F.least(n1, m2t(F.col("maxx"))))
        .withColumn("tmaxy", F.least(n1, m2t(F.col("maxy"))))
        .where(
            (F.col("tmaxx") >= F.col("tminx")) & (F.col("tmaxy") >= F.col("tminy"))
        )
    )


def _decode_rgb_alpha(raw: bytes, fmt: str):
    arr = codecs.decode_image(raw, fmt)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] == 4:
        return arr[:, :, :3], arr[:, :, 3]
    return arr, np.full(arr.shape[:2], 255, dtype=np.uint8)


def _decode_or_none(raw: bytes, fmt: str, on_error: str):
    """Decode, or (on_error='skip') swallow corrupt bytes — one
    truncated blob among 10^12 must not kill the tile job; default
    'fail' aborts like gdal2tiles."""
    try:
        return _decode_rgb_alpha(raw, fmt)
    except Exception:
        if on_error == "skip":
            return None
        raise


def _check_on_error(on_error: str) -> None:
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")


def _fragment_row(r, z, tx, ty, tile, alpha):
    # PNG, not raw: fragments cross a shuffle + a sort-based group
    # iterator + an Arrow->pandas conversion — payload size IS the cost
    # there (level-1 zlib: ~10x smaller, ~1ms each way). Fully-opaque
    # fragments (the common case: image covers the whole tile) ship an
    # EMPTY alpha instead of a constant-255 PNG — skips one encode here
    # and one decode in compose.
    return {
        "z": int(z),
        "tx": int(tx),
        "ty": int(ty),
        "image_id": r.image_id,
        "px": codecs.encode_png(tile, level=1),
        "alpha": b"" if alpha.min() == 255 else codecs.encode_png(alpha, level=1),
        "c": int(tile.shape[2]),
    }


def cut_fragments(images, zoom=None, tile_size: int = 256, resampling: str = "average", on_error: str = "fail"):
    """images (+ optional fixed zoom; default = per-image native zoom) ->
    fragments DF. Each image row stays ONE row into the pandas pass
    (tile ranges are columns, not an explode), so the image is decoded
    exactly once and its bytes are never duplicated across tiles; only
    (ts, ts) PNG fragments leave the stage."""
    import pandas as pd

    z_col = F.lit(int(zoom)) if zoom is not None else native_zoom_col(tile_size)
    with_range = tile_range_cols(images, z_col, tile_size)

    def do(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                dec = _decode_or_none(bytes(r.bytes), r.fmt, on_error)
                if dec is None:
                    continue
                arr, alpha_src = dec
                z = int(r.z)
                for tx in range(int(r.tminx), int(r.tmaxx) + 1):
                    for ty in range(int(r.tminy), int(r.tmaxy) + 1):
                        cut = _cut_one(
                            arr, alpha_src, r, z, tx, ty, tile_size, resampling
                        )
                        if cut is None:
                            continue
                        tile, alpha = cut
                        out.append(_fragment_row(r, z, tx, ty, tile, alpha))
            yield pd.DataFrame(
                out,
                columns=["z", "tx", "ty", "image_id", "px", "alpha", "c"],
            )

    return with_range.mapInPandas(do, schema=FRAGMENT_SCHEMA)


# ---------------------------------------------------------------------------
# stage 4: compose fragments -> tiles (the tile-key shuffle IS the mosaic)
# ---------------------------------------------------------------------------

TILE_SCHEMA = (
    "z int, tx long, ty long, y_xyz long, png binary, w int, h int, "
    "checksum int, checksums array<int>, n_src int, src_ids array<string>"
)


def _compose_group(pdf, tile_size: int):
    import pandas as pd

    z = int(pdf["z"].iloc[0])
    tx = int(pdf["tx"].iloc[0])
    ty = int(pdf["ty"].iloc[0])
    pdf = pdf.sort_values("image_id")
    ts = tile_size
    c = int(pdf["c"].max())
    buf = np.zeros((ts, ts, c), dtype=np.uint8)
    alpha = np.zeros((ts, ts), dtype=np.uint8)
    src_ids = []
    for r in pdf.itertuples(index=False):
        tile = codecs.decode_png(bytes(r.px))
        if tile.ndim == 2:
            tile = tile[:, :, None]
        if tile.shape[2] < c:  # gray fragment into RGB mosaic: replicate
            tile = np.repeat(tile[:, :, :1], c, axis=2)
        ab = bytes(r.alpha)
        if len(ab) == 0:  # fully-opaque fragment marker
            buf[:, :, :] = tile
            alpha[:, :] = 255
        else:
            fa = codecs.decode_png(ab)
            if fa.ndim == 3:
                fa = fa[:, :, 0]
            m = fa > 0
            buf[m] = tile[m]
            alpha[m] = 255
        src_ids.append(r.image_id)
    rgba = np.dstack([buf, alpha])
    # level 3: ~2x faster than the zlib default for ~2% larger tiles
    # (150 -> 154 KB measured on a photographic tile)
    png = codecs.encode_png(rgba, level=3)
    sums = image_checksums(rgba)
    return pd.DataFrame(
        [
            {
                "z": z,
                "tx": tx,
                "ty": ty,
                "y_xyz": int(xyz_flip(ty, z)),
                "png": png,
                "w": ts,
                "h": ts,
                "checksum": sums[0],
                "checksums": sums,
                "n_src": len(src_ids),
                "src_ids": src_ids,
            }
        ]
    )


def compose_tiles(fragments, tile_size: int = 256):
    return fragments.groupBy("z", "tx", "ty").applyInPandas(
        lambda pdf: _compose_group(pdf, tile_size), schema=TILE_SCHEMA
    )


def cut_base_tiles(images, zoom=None, tile_size: int = 256, resampling: str = "average"):
    """End-to-end base-tile cut: assignment -> fragments -> composed tiles."""
    return compose_tiles(cut_fragments(images, zoom, tile_size, resampling), tile_size)


# ---------------------------------------------------------------------------
# stage 5: overview zoom levels (4 -> 1 reduce per zoom)
# ---------------------------------------------------------------------------


def _overview_group(pdf, tile_size: int):
    import pandas as pd

    ts = tile_size
    pz = int(pdf["z"].iloc[0]) - 1
    ptx = int(pdf["ptx"].iloc[0])
    pty = int(pdf["pty"].iloc[0])
    buf = np.zeros((2 * ts, 2 * ts, 4), dtype=np.uint8)
    src_ids: list[str] = []
    n_src = 0
    for r in pdf.itertuples(index=False):
        child = codecs.decode_png(bytes(r.png))
        if child.ndim == 2:
            child = child[:, :, None]
        if child.shape[2] == 2:  # gray+alpha -> RGBA
            child = np.dstack([np.repeat(child[:, :, :1], 3, axis=2), child[:, :, 1]])
        elif child.shape[2] == 3:  # RGB -> RGBA
            child = np.dstack([child, np.full(child.shape[:2], 255, dtype=np.uint8)])
        elif child.shape[2] == 1:
            child = np.dstack(
                [np.repeat(child, 3, axis=2), np.full(child.shape[:2], 255, dtype=np.uint8)]
            )
        dx = int(r.tx) % 2
        dy = int(r.ty) % 2
        # TMS ty grows north; buffer row 0 is the north half
        # (gdal2tiles.py:1536-1550 y-parity flip)
        ox = dx * ts
        oy = (1 - dy) * ts
        buf[oy : oy + ts, ox : ox + ts] = child
        n_src += int(r.n_src)
        src_ids.extend(list(r.src_ids)[:16])
    down = resize(buf.astype(np.float64), ts, ts, "average")
    tile = np.clip(np.round(down), 0, 255).astype(np.uint8)
    # re-binarize alpha after averaging
    tile[:, :, 3] = np.where(tile[:, :, 3] >= 128, 255, 0)
    png = codecs.encode_png(tile, level=3)
    sums = image_checksums(tile)
    return pd.DataFrame(
        [
            {
                "z": pz,
                "tx": ptx,
                "ty": pty,
                "y_xyz": int(xyz_flip(pty, pz)),
                "png": png,
                "w": ts,
                "h": ts,
                "checksum": sums[0],
                "checksums": sums,
                "n_src": n_src,
                "src_ids": src_ids[:64],
            }
        ]
    )


def overview_tiles(tiles, tile_size: int = 256):
    """One zoom step up: compose <=4 children per parent then 2:1 average
    downsample (create_overview_tile, gdal2tiles.py:1471-1600). z=0 tiles
    have no parent and are dropped from the input."""
    parents = (
        tiles.where(F.col("z") > 0)
        .withColumn("ptx", (F.col("tx") / 2).cast("long"))
        .withColumn("pty", (F.col("ty") / 2).cast("long"))
    )
    return parents.groupBy("z", "ptx", "pty").applyInPandas(
        lambda pdf: _overview_group(pdf, tile_size), schema=TILE_SCHEMA
    )


def tile_pyramid(
    images,
    tminz: int,
    tmaxz: int,
    tile_size: int = 256,
    resampling: str = "average",
    persist: bool = True,
):
    """Full pyramid, gdal2tiles REDUCE semantics: base tiles at tmaxz,
    then each level z-1 derived from level z (the "best overview" source
    selection of gcore/rasterio.cpp:4086-4174), so total work is a
    geometric series in tile count.

    The chained reduces are materialization barriers (each level must
    finish before the next starts) — use :func:`tile_pyramid_direct` when
    throughput/scaling matters more than bit-parity with the
    overview-of-overview rounding chain. With ``persist`` the final union
    is checkpointed eagerly and every per-level cache is released
    immediately, so a long session does not accumulate executor storage."""
    level = cut_base_tiles(images, tmaxz, tile_size, resampling)
    if persist:
        level = level.persist()
    out = [level]
    for _z in range(tmaxz, tminz, -1):
        level = overview_tiles(level, tile_size)
        if persist:
            level = level.persist()
        out.append(level)
    result = out[0]
    for lv in out[1:]:
        result = result.unionByName(lv)
    if persist:
        result = result.localCheckpoint(eager=True)
        for lv in out:
            lv.unpersist()
    return result


# ---------------------------------------------------------------------------
# direct pyramid: every level cut from the source, ONE shuffle, no barriers
# ---------------------------------------------------------------------------


def cut_fragments_levels(
    images,
    tminz: int | None = None,
    tmaxz: int | None = None,
    levels_below: int | None = None,
    tile_size: int = 256,
    resampling: str = "average",
    on_error: str = "fail",
):
    """Fragments for a RANGE of zoom levels in one narrow pass: decode
    each image once, cut every covered tile of every level straight from
    the source (the per-tile formulation of apps/gdalalg_raster_tile.cpp
    — each zoom is an independent area-average of the source, not an
    overview-of-overviews).

    Levels per image: native zoom z_n (capped by ``tmaxz``) down to
    ``tminz`` — or, with ``levels_below=k``, down to z_n - k (per-image
    relative overviews, the bench/throughput shape).

    Scale notes: this trades ~33%% extra resample work (each level reads
    the full read-window again) for ZERO inter-level shuffles or
    persist+count barriers — the whole pyramid is map -> one tile-key
    shuffle -> compose, so wall-clock scales with executors instead of
    being serialized through per-level materializations. Very low zooms
    fan many images into one tile; AQE skew handling covers the hot
    cells.
    """
    import pandas as pd

    # explicit tmaxz wins (gdal2tiles cuts past native zoom by upsampling
    # when asked); otherwise per-image native zoom
    nz = native_zoom_col(tile_size)
    imgs = images.withColumn("zmax", nz if tmaxz is None else F.lit(int(tmaxz)))
    lo = 0 if tminz is None else int(tminz)
    if levels_below is not None:
        zmin_col = F.greatest(F.lit(lo), F.col("zmax") - int(levels_below))
    else:
        zmin_col = F.lit(lo)
    imgs = imgs.withColumn("zmin", F.least(zmin_col, F.col("zmax")))

    def do(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                dec = _decode_or_none(bytes(r.bytes), r.fmt, on_error)
                if dec is None:
                    continue
                arr, alpha_src = dec
                for z in range(int(r.zmax), int(r.zmin) - 1, -1):
                    n1 = (1 << z) - 1
                    tminx, tminy, tmaxx, tmaxy = _MERC.tile_range(
                        r.minx, r.miny, r.maxx, r.maxy, z
                    )
                    tminx, tminy = max(0, int(tminx)), max(0, int(tminy))
                    tmaxx, tmaxy = min(n1, int(tmaxx)), min(n1, int(tmaxy))
                    for tx in range(tminx, tmaxx + 1):
                        for ty in range(tminy, tmaxy + 1):
                            cut = _cut_one(
                                arr, alpha_src, r, z, tx, ty, tile_size, resampling
                            )
                            if cut is None:
                                continue
                            tile, alpha = cut
                            out.append(_fragment_row(r, z, tx, ty, tile, alpha))
            yield pd.DataFrame(
                out, columns=["z", "tx", "ty", "image_id", "px", "alpha", "c"]
            )

    return imgs.mapInPandas(do, schema=FRAGMENT_SCHEMA)


def _cut_one_geodetic(arr, alpha_src, r, z, tx, ty, tile_size, resampling, grid):
    """One geodetic (EPSG:4326) tile fragment — gdal2tiles --profile
    geodetic (gdal2tiles.py:534-660). 4326 north-up sources take the
    exact geo_query path; others warp per tile."""
    ts = tile_size
    gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
    bminx, bminy, bmaxx, bmaxy = (float(v) for v in grid.tile_bounds(tx, ty, z))
    if r.srid == 4326 and gt[2] == 0.0 and gt[4] == 0.0:
        cut = _cut_window(
            arr, alpha_src, gt, r.w, r.h,
            (bminx, bminy, bmaxx, bmaxy), ts, resampling,
        )
        if cut is None:
            return None
        tile, alpha = cut
    else:
        from ..resample import SAMPLERS as _SK
        from ..resample import WINDOW_KERNELS as _WK

        res = float(grid.resolution(z))
        dst_gt = (bminx, res, 0.0, bmaxy, 0.0, -res)
        samp = resampling if (resampling in _SK or resampling in _WK) else "bilinear"
        out, alpha = warp_array(arr, gt, r.srid, (ts, ts), dst_gt, 4326, samp)
        tile = np.clip(np.round(out), 0, 255).astype(np.uint8)
        if tile.ndim == 2:
            tile = tile[:, :, None]
        if alpha_src is not None:
            # same source-transparency AND as the mercator warp branch
            a_out, _cov = warp_array(
                alpha_src.astype(np.float64), gt, r.srid, (ts, ts),
                dst_gt, 4326, samp,
            )
            a2 = np.atleast_3d(a_out)[:, :, 0]
            alpha = np.where(
                (alpha > 0) & (a2 >= 127.5), 255, 0
            ).astype(np.uint8)
    if tile.ndim == 2:
        tile = tile[:, :, None]
    if not alpha.any():
        return None
    return tile, alpha


def cut_fragments_geodetic(
    images,
    tminz: int | None = None,
    tmaxz: int | None = None,
    levels_below: int | None = None,
    tile_size: int = 256,
    resampling: str = "average",
    tmscompatible: bool = True,
    on_error: str = "fail",
):
    """Geodetic-profile fragments for a range of zoom levels, one narrow
    pass (the direct-cut shape of cut_fragments_levels over the
    GeodeticGrid: 2*2^z x 2^z tiles per level with tmscompatible)."""
    import pandas as pd

    from ..grid import GeodeticGrid

    grid = GeodeticGrid(tile_size=tile_size, tmscompatible=tmscompatible)
    # native zoom from the DEGREE pixel size (gdal2tiles geodetic
    # ZoomForPixelSize with resFact)
    ps_deg = F.when(F.col("srid") == 4326, F.col("gt1")).otherwise(
        F.col("gt1") / (ORIGIN_SHIFT / 180.0)
    )
    raw = F.floor(F.log2(F.lit(grid.res_fact) / ps_deg))
    nz = F.greatest(F.lit(0), F.least(F.lit(31), raw)).cast("int")
    imgs = images.withColumn("zmax", nz if tmaxz is None else F.lit(int(tmaxz)))
    lo = 0 if tminz is None else int(tminz)
    if levels_below is not None:
        zmin_col = F.greatest(F.lit(lo), F.col("zmax") - int(levels_below))
    else:
        zmin_col = F.lit(lo)
    imgs = imgs.withColumn("zmin", F.least(zmin_col, F.col("zmax")))

    def do(batches):
        from .warp import geo_transform_points

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                dec = _decode_or_none(bytes(r.bytes), r.fmt, on_error)
                if dec is None:
                    continue
                arr, alpha_src = dec
                gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
                if r.srid == 4326:
                    lon0, lat1 = gt[0], gt[3]
                    lon1 = gt[0] + r.w * gt[1]
                    lat0 = gt[3] + r.h * gt[5]
                else:
                    xs, ys = geo_transform_points(
                        np.array([r.minx, r.maxx]), np.array([r.miny, r.maxy]),
                        3857, 4326,
                    )
                    lon0, lon1 = float(xs[0]), float(xs[1])
                    lat0, lat1 = float(ys[0]), float(ys[1])
                for z in range(int(r.zmax), int(r.zmin) - 1, -1):
                    nx1 = 2 * (1 << z) - 1 if grid.res_fact == 180.0 / tile_size else (1 << z) - 1
                    ny1 = (1 << z) - 1
                    tminx, tminy = grid.lonlat_to_tile(lon0, lat0, z)
                    tmaxx, tmaxy = grid.lonlat_to_tile(lon1, lat1, z)
                    tminx, tminy = max(0, int(tminx)), max(0, int(tminy))
                    tmaxx, tmaxy = min(nx1, int(tmaxx)), min(ny1, int(tmaxy))
                    for tx in range(tminx, tmaxx + 1):
                        for ty in range(tminy, tmaxy + 1):
                            cut = _cut_one_geodetic(
                                arr, alpha_src, r, z, tx, ty, tile_size,
                                resampling, grid,
                            )
                            if cut is None:
                                continue
                            tile, alpha = cut
                            out.append(_fragment_row(r, z, tx, ty, tile, alpha))
            yield pd.DataFrame(
                out, columns=["z", "tx", "ty", "image_id", "px", "alpha", "c"]
            )

    return imgs.mapInPandas(do, schema=FRAGMENT_SCHEMA)


def geodetic_tile_pyramid(
    images,
    tminz: int | None = None,
    tmaxz: int | None = None,
    levels_below: int | None = None,
    tile_size: int = 256,
    resampling: str = "average",
    tmscompatible: bool = True,
):
    """Single-action geodetic pyramid (gdal2tiles --profile geodetic):
    map -> one tile-key shuffle -> compose."""
    return compose_tiles(
        cut_fragments_geodetic(
            images, tminz, tmaxz, levels_below, tile_size, resampling, tmscompatible
        ),
        tile_size,
    )


def tile_pyramid_direct(
    images,
    tminz: int | None = None,
    tmaxz: int | None = None,
    levels_below: int | None = None,
    tile_size: int = 256,
    resampling: str = "average",
    on_error: str = "fail",
):
    """Single-action pyramid: all levels cut from source in one map
    stage, composed through ONE tile-key shuffle. No persist, no
    barriers — the plan is scan -> mapInPandas -> exchange -> compose.
    ``on_error='skip'`` drops undecodable source rows instead of
    aborting (the warp_images convention)."""
    _check_on_error(on_error)
    return compose_tiles(
        cut_fragments_levels(
            images, tminz, tmaxz, levels_below, tile_size, resampling,
            on_error=on_error,
        ),
        tile_size,
    )
