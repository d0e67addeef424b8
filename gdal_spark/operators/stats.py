"""Raster statistics + reclassify + pixel calc — the per-image analytic
operators.

- raster_statistics : GDALRasterBand::ComputeStatistics
  (gcore/gdalrasterband.cpp:6534) — min/max/mean/std per band per image,
  then corpus-level aggregates; one decode per image (mapInPandas), the
  cross-image reduce is a plain Catalyst agg.
- raster_histogram  : GetHistogram (gdalrasterband.cpp:4176) — fixed-bin
  counts per image; corpus histogram = groupBy(bin).sum.
- checksum_images   : GDALChecksumImage oracle per band.
- reclassify        : `gdal raster reclassify`
  (apps/gdalalg_raster_reclassify.cpp) — value-range remap via np.select.
- pixel_calc        : band algebra (apps/gdalalg_raster_calc.cpp) with a
  restricted expression set evaluated by numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from .. import codecs
from ..checksum import image_checksums

STATS_SCHEMA = (
    "image_id string, band int, min double, max double, mean double, "
    "std double, n long"
)


def raster_statistics(images):
    """Per-(image, band) stats; compose with .groupBy().agg() for corpus
    rollups. Decode happens once per row inside Arrow batches."""

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                for b in range(arr.shape[2]):
                    band = arr[:, :, b].astype(np.float64)
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "band": b,
                            "min": float(band.min()),
                            "max": float(band.max()),
                            "mean": float(band.mean()),
                            "std": float(band.std()),
                            "n": int(band.size),
                        }
                    )
            yield pd.DataFrame(rows, columns=["image_id", "band", "min", "max", "mean", "std", "n"])

    return images.mapInPandas(do, schema=STATS_SCHEMA)


def raster_histogram(images, bins: int = 16, vmin: float = 0.0, vmax: float = 256.0):
    """Per-image fixed-bin histogram -> (image_id, band, bin, count).
    Corpus histogram: .groupBy('band','bin').agg(sum('count'))."""

    def do(batches):
        for pdf in batches:
            rows = []
            edges = np.linspace(vmin, vmax, bins + 1)
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                for b in range(arr.shape[2]):
                    cnt, _ = np.histogram(arr[:, :, b], bins=edges)
                    for i, c in enumerate(cnt):
                        rows.append(
                            {"image_id": r.image_id, "band": b, "bin": i, "count": int(c)}
                        )
            yield pd.DataFrame(rows, columns=["image_id", "band", "bin", "count"])

    return images.mapInPandas(do, schema="image_id string, band int, bin int, count long")


def checksum_images(images):
    """Per-band GDAL checksums (the golden-output aggregate, §2.4)."""

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                for b, cs in enumerate(image_checksums(np.atleast_3d(arr))):
                    rows.append({"image_id": r.image_id, "band": b, "checksum": cs})
            yield pd.DataFrame(rows, columns=["image_id", "band", "checksum"])

    return images.mapInPandas(do, schema="image_id string, band int, checksum int")


def enhance_array(
    arr: np.ndarray,
    mode: str = "equalize",
    low_pct: float = 2.0,
    high_pct: float = 98.0,
) -> np.ndarray:
    """gdalenhance (apps/gdalenhance.cpp) per-band contrast enhancement
    on uint8 bands:

    - 'equalize': histogram equalization — LUT = round(255 * cdf(v))
      with the standard min-nonzero-cdf normalization, so the darkest
      occupied bin maps to 0 and the full range is used;
    - 'stretch': linear percentile stretch — the [low_pct, high_pct]
      value range maps to [0, 255], clipping outside (the common
      2%-98% enhancement).

    Both LUTs are monotone, rank-preserving per band."""
    a3 = np.atleast_3d(np.asarray(arr))
    out = np.empty_like(a3, dtype=np.uint8)
    for b in range(a3.shape[2]):
        # clamp (not wrap) wider dtypes into the 8-bit LUT domain —
        # a 16-bit band astype'd directly would alias modulo 256
        band = np.clip(a3[:, :, b], 0, 255).astype(np.uint8)
        if mode == "equalize":
            hist = np.bincount(band.ravel(), minlength=256)
            cdf = np.cumsum(hist).astype(np.float64)
            nz = cdf[cdf > 0]
            cmin = nz[0] if len(nz) else 0.0
            denom = cdf[-1] - cmin
            if denom <= 0:  # constant band: identity
                lut = np.arange(256, dtype=np.uint8)
            else:
                lut = np.round(255.0 * (cdf - cmin) / denom)
                lut = np.clip(lut, 0, 255).astype(np.uint8)
        elif mode == "stretch":
            lo = float(np.percentile(band, low_pct))
            hi = float(np.percentile(band, high_pct))
            if hi <= lo:
                lut = np.arange(256, dtype=np.uint8)
            else:
                lut = np.clip(
                    np.round((np.arange(256) - lo) * 255.0 / (hi - lo)),
                    0, 255,
                ).astype(np.uint8)
        else:
            raise ValueError(f"unknown enhance mode {mode!r}")
        out[:, :, b] = lut[band]
    return out[:, :, 0] if np.asarray(arr).ndim == 2 else out


def enhance_images(
    images, mode: str = "equalize", low_pct: float = 2.0,
    high_pct: float = 98.0, out_fmt: str = "png", on_error: str = "fail",
):
    """DataFrame operator for gdalenhance: one decode + LUT per image,
    narrow stage (no shuffle). ``on_error='skip'`` drops undecodable
    rows (the warp_images convention)."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                out = enhance_array(arr, mode, low_pct, high_pct)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": codecs.encode_image(out, out_fmt),
                        "fmt": out_fmt,
                        "checksum": int(image_checksums(np.atleast_3d(out))[0]),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "fmt", "checksum"]
            )

    return images.mapInPandas(
        do, schema="image_id string, bytes binary, fmt string, checksum int"
    )


def reclassify_array(arr: np.ndarray, mapping: list[tuple[float, float, float]], default=None):
    """mapping: [(lo, hi, value)] half-open [lo, hi) ranges; default keeps
    the source value (PASS_THROUGH) or burns a constant."""
    a = arr.astype(np.float64)
    conds = [ (a >= lo) & (a < hi) for lo, hi, _ in mapping ]
    vals = [v for _, _, v in mapping]
    base = a if default is None else np.full_like(a, float(default))
    return np.select(conds, vals, base)


def reclassify_images(images, mapping, default=None, out_fmt: str = "raw"):
    """DataFrame reclassify: decode -> np.select -> re-encode. The raw
    sink stores float64 UNCLIPPED, so class codes outside 0..255
    (nodata=-9999, large category ids) survive — `gdal raster
    reclassify` preserves the output type. uint8 sinks (png/jpg) clip
    to their own range."""
    from .warp import IMAGE_OUT_SCHEMA

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                out = reclassify_array(arr, mapping, default)
                if out_fmt == "raw":
                    enc = out  # float64, full range
                else:
                    enc = np.clip(np.round(out), 0, 255).astype(np.uint8)
                d = r._asdict()
                d["bytes"] = codecs.encode_image(enc, out_fmt)
                d["fmt"] = out_fmt
                rows.append(d)
            yield pd.DataFrame(rows)

    return images.mapInPandas(do, schema=IMAGE_OUT_SCHEMA)


PIXEL_FUNCS = {
    "sqrt": np.sqrt,
    "log": np.log,
    "log10": np.log10,
    "exp": np.exp,
    "abs": np.abs,
    "sin": np.sin,
    "cos": np.cos,
}


def pixel_calc_images(images, func: str = "sqrt", scale: float = 1.0, offset: float = 0.0,
                      out_fmt: str = "raw"):
    """Band algebra y = f(x * scale + offset) with a whitelisted numpy
    func (the VRT pixel-function surface, frmts/vrt/pixelfunctions.cpp,
    restricted to a safe set — no eval)."""
    from .warp import IMAGE_OUT_SCHEMA

    fn = PIXEL_FUNCS[func]

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt).astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    out = fn(arr * scale + offset)
                out = np.nan_to_num(out, nan=0.0, posinf=255.0, neginf=0.0)
                out8 = np.clip(np.round(out), 0, 255).astype(np.uint8)
                d = r._asdict()
                d["bytes"] = codecs.encode_image(out8, out_fmt)
                d["fmt"] = out_fmt
                rows.append(d)
            yield pd.DataFrame(rows)

    return images.mapInPandas(do, schema=IMAGE_OUT_SCHEMA)


# ---------------------------------------------------------------------------
# nearblack (apps/nearblack_lib.cpp): collapse near-black/near-white
# collar pixels scanned inward from the raster edges
# ---------------------------------------------------------------------------


def _nearblack_pass(
    rgb: np.ndarray,
    near: int,
    target: int,
    max_nonblack: int,
    bottom_up: bool,
) -> np.ndarray:
    """One full nearblack sweep (vertical check + left->right + right->left
    horizontal line scans over every line, in top-down or bottom-up order) —
    the exact ProcessLine state machine of apps/nearblack_lib.cpp:545-741,
    vectorized across lines. Mutates ``rgb`` in place (replaced pixels become
    ``target``) and returns the boolean mask of pixels replaced this pass.

    Semantics preserved from the reference:
    - per-column counters (panLastLineCounts): a column stops being collar
      once it has accumulated more than ``max_nonblack`` non-near pixels;
      tolerated non-near pixels ARE collapsed (the nMaxNonBlack behavior)
    - first-line special (nearblack_lib.cpp:611): valid data on the very
      first processed line kills the column immediately (nothing replaced)
      when max_nonblack > 0
    - horizontal scans re-enter collar state where the vertical counter is
      still 0 (nearblack_lib.cpp:735), which is what lets collars bend
      around corners; the L->R scan excludes the last column and the R->L
      scan the first (both covered by the opposite direction), and a
      non-near pixel at the scan's starting edge disables it
      (nearblack_lib.cpp:708)
    - on a bottom-up pass the HORIZONTAL tolerance is forced to 0
      (nearblack_lib.cpp:647); the vertical check keeps max_nonblack
    """
    view = rgb[::-1] if bottom_up else rgb
    h, w = view.shape[:2]
    nb = (np.abs(view.astype(np.int16) - target) > near).any(axis=2)
    mask = np.zeros((h, w), dtype=bool)

    # --- vertical check (all lines at once; per-column effective counts) ---
    cum = np.cumsum(nb, axis=0, dtype=np.int64)
    prev = np.vstack([np.zeros((1, w), np.int64), cum[:-1]])
    if max_nonblack > 0:
        dead0 = nb[0]  # valid data on the first processed line: column dead
        big = max_nonblack + 1
        cum = np.where(dead0[None, :], big, cum)
        prev = np.where(dead0[None, :], big, prev)
        prev[0] = 0
    rep_v = (prev <= max_nonblack) & ~(nb & (cum > max_nonblack))
    view[rep_v] = target
    nb[rep_v] = False
    mask |= rep_v
    counts_after = cum  # counter value as of each line's horizontal scan

    # --- horizontal scans (state machine over columns, vectorized across
    #     all lines; hmax forced to 0 on the bottom-up pass) ---
    hmax = 0 if bottom_up else max_nonblack

    def hscan(cols_iter, i_start):
        do_test = np.ones(h, dtype=bool)
        nnb = np.zeros(h, dtype=np.int64)
        for i in cols_iter:
            col_nb = nb[:, i]
            ca = counts_after[:, i]
            act = do_test
            # grey columns (vertical counter still tolerant) reset the run
            nnb_new = np.where(col_nb, np.where(ca <= hmax, ca, nnb + 1), nnb)
            exceeded = nnb_new > hmax
            edge = col_nb & (hmax > 0) & (i == i_start)
            rep = act & ~exceeded & ~edge
            nnb = np.where(act, nnb_new, nnb)
            do_test = np.where(act, ~(exceeded | edge), do_test)
            reen = ~act & (ca == 0)
            do_test |= reen
            nnb = np.where(reen, 0, nnb)
            view[rep, i] = target
            nb[rep, i] = False
            mask[rep, i] = True

    if w > 1:
        hscan(range(0, w - 1), 0)
        hscan(range(w - 1, 0, -1), w - 1)
    return mask[::-1] if bottom_up else mask


def nearblack_collapse(
    arr: np.ndarray,
    near: int = 15,
    white: bool = False,
    max_nonblack: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Full nearblack: (cleaned_rgb, collar_mask) with the reference's exact
    two-sweep structure (apps/nearblack_lib.cpp:395-530) — a top-down sweep
    over the source, then a bottom-up sweep over the ALREADY-CLEANED output
    with fresh column counters. ``max_nonblack`` defaults to the reference
    CLI default (nearblack_lib.h:39: nMaxNonBlack = 2)."""
    c3 = arr[:, :, :3] if arr.ndim == 3 else np.repeat(arr[:, :, None], 3, axis=2)
    rgb = c3.copy()
    m1 = _nearblack_pass(rgb, near, 255 if white else 0, max_nonblack, False)
    m2 = _nearblack_pass(rgb, near, 255 if white else 0, max_nonblack, True)
    return rgb, m1 | m2


def nearblack_mask(
    arr: np.ndarray,
    near: int = 15,
    white: bool = False,
    max_nonblack: int = 2,
) -> np.ndarray:
    """Boolean mask of the edge collar per apps/nearblack_lib.cpp semantics
    (see nearblack_collapse): line-to-line counter propagation, bent-collar
    re-entry, and the nMaxNonBlack non-near tolerance (default 2 as in the
    reference CLI)."""
    return nearblack_collapse(arr, near=near, white=white, max_nonblack=max_nonblack)[1]


def nearblack_images(images, near: int = 15, white: bool = False, max_nonblack: int = 2):
    """Per-image nearblack: collar pixels collapse to exact black/white
    and the emitted alpha zeroes them (the -setalpha behavior). Output:
    image_id, cleaned PNG (RGBA), n_collar, checksum."""

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                rgb, m = nearblack_collapse(
                    arr, near=near, white=white, max_nonblack=max_nonblack
                )
                alpha = np.where(m, 0, 255).astype(np.uint8)
                rgba = np.dstack([rgb, alpha])
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": codecs.encode_png(rgba),
                        "n_collar": int(m.sum()),
                        "checksum": int(image_checksums(rgba)[0]),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "n_collar", "checksum"]
            )

    return images.mapInPandas(
        do, schema="image_id string, bytes binary, n_collar long, checksum int"
    )


# ---------------------------------------------------------------------------
# gdal_calc: multi-raster band algebra
# ---------------------------------------------------------------------------
# Reference: swig/python/gdal-utils/osgeo_utils/gdal_calc.py — letters
# A..Z bind input rasters, the --calc expression is evaluated with numpy
# broadcasting. The reference evals arbitrary Python; this engine
# compiles the expression through an AST WHITELIST instead (arithmetic,
# comparisons, ternary where(), and the PIXEL_FUNCS names only), so no
# attacker-controlled code ever runs in an executor.

import ast as _ast

_CALC_FUNCS = dict(PIXEL_FUNCS)
_CALC_FUNCS.update(
    {
        "minimum": np.minimum,
        "maximum": np.maximum,
        "where": np.where,
        "power": np.power,
        "floor": np.floor,
        "ceil": np.ceil,
        "round": np.round,
    }
)

_ALLOWED_NODES = (
    _ast.Expression, _ast.BinOp, _ast.UnaryOp, _ast.Compare, _ast.Call,
    _ast.Name, _ast.Load, _ast.Constant,
    _ast.Add, _ast.Sub, _ast.Mult, _ast.Div, _ast.FloorDiv, _ast.Mod,
    _ast.Pow, _ast.USub, _ast.UAdd,
    _ast.Lt, _ast.LtE, _ast.Gt, _ast.GtE, _ast.Eq, _ast.NotEq,
    _ast.BitAnd, _ast.BitOr, _ast.BitXor,
)


def compile_calc(expr: str, letters):
    """Validate + compile a gdal_calc expression against the whitelist;
    returns fn(dict[letter -> ndarray]) -> ndarray."""
    tree = _ast.parse(expr, mode="eval")
    for node in _ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"calc expression node not allowed: {type(node).__name__}"
            )
        if isinstance(node, _ast.Call):
            if not isinstance(node.func, _ast.Name) or node.func.id not in _CALC_FUNCS:
                raise ValueError("only whitelisted functions may be called")
        if isinstance(node, _ast.Name) and node.id not in _CALC_FUNCS:
            if node.id not in letters:
                raise ValueError(f"unknown name {node.id!r} in calc expression")
    code = compile(tree, "<calc>", "eval")

    def fn(env):
        scope = dict(_CALC_FUNCS)
        scope.update(env)
        return eval(code, {"__builtins__": {}}, scope)  # noqa: S307 — AST-whitelisted

    return fn


def calc_images(
    inputs: dict,
    expr: str,
    out_fmt: str = "png",
):
    """Distributed gdal_calc: ``inputs`` maps letters (A, B, ...) to
    image DataFrames (image_id, bytes, fmt); all sides join 1:1 on
    image_id (bytes cross the shuffle once per input) and ONE Arrow
    pass evaluates the compiled expression per image. Output is clipped
    to uint8 (gdal_calc's default Byte type) with a band-1 checksum."""
    letters = sorted(inputs)
    fn = compile_calc(expr, letters)

    base = None
    for letter in letters:
        side = inputs[letter].select(
            F.col("image_id").alias(f"{letter}_id"),
            F.col("bytes").alias(f"{letter}_bytes"),
            F.col("fmt").alias(f"{letter}_fmt"),
        )
        if base is None:
            base = side.withColumnRenamed(f"{letter}_id", "image_id")
        else:
            base = base.join(
                side, base["image_id"] == side[f"{letter}_id"], "inner"
            ).drop(f"{letter}_id")

    def do(batches):
        from gdal_spark.checksum import gdal_checksum

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                env = {}
                for letter in letters:
                    env[letter] = codecs.decode_image(
                        bytes(getattr(r, f"{letter}_bytes")),
                        getattr(r, f"{letter}_fmt"),
                    ).astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    out = fn(env)
                out = np.nan_to_num(
                    np.asarray(out, dtype=np.float64),
                    nan=0.0, posinf=255.0, neginf=0.0,
                )
                out8 = np.clip(np.round(out), 0, 255).astype(np.uint8)
                band = out8 if out8.ndim == 2 else out8[:, :, 0]
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": codecs.encode_image(out8, out_fmt),
                        "w": band.shape[1], "h": band.shape[0],
                        "checksum": int(gdal_checksum(band)),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "checksum"]
            )

    return base.mapInPandas(
        do,
        schema="image_id string, bytes binary, w int, h int, checksum long",
    )


def raster_info(images) -> "DataFrame":
    """gdalinfo analog (apps/gdalinfo_lib.cpp summary): ONE row per image
    — size, georef, native-CRS corner coordinates (origin / lower-right,
    gcore/gdalinfo corner report), and per-band min/max/mean/std as
    arrays indexed by band. One decode per image, no shuffle."""

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.atleast_3d(codecs.decode_image(bytes(r.bytes), r.fmt))
                b = arr.reshape(-1, arr.shape[2]).astype(np.float64)
                ulx, uly = float(r.gt0), float(r.gt3)
                lrx = float(r.gt0 + r.w * r.gt1 + r.h * r.gt2)
                lry = float(r.gt3 + r.w * r.gt4 + r.h * r.gt5)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(r.w),
                        "h": int(r.h),
                        "n_bands": int(arr.shape[2]),
                        "fmt": r.fmt,
                        "srid": int(r.srid),
                        "ulx": ulx, "uly": uly, "lrx": lrx, "lry": lry,
                        "px_w": float(r.gt1), "px_h": float(r.gt5),
                        "band_min": b.min(axis=0).tolist(),
                        "band_max": b.max(axis=0).tolist(),
                        "band_mean": b.mean(axis=0).tolist(),
                        "band_std": b.std(axis=0).tolist(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "n_bands", "fmt", "srid",
                    "ulx", "uly", "lrx", "lry", "px_w", "px_h",
                    "band_min", "band_max", "band_mean", "band_std",
                ],
            )

    return images.mapInPandas(
        do,
        schema=(
            "image_id string, w int, h int, n_bands int, fmt string, "
            "srid int, ulx double, uly double, lrx double, lry double, "
            "px_w double, px_h double, band_min array<double>, "
            "band_max array<double>, band_mean array<double>, "
            "band_std array<double>"
        ),
    )
