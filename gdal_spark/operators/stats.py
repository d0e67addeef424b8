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


def nearblack_mask(arr: np.ndarray, near: int = 15, white: bool = False) -> np.ndarray:
    """Boolean mask of the edge collar: pixels within ``near`` of
    black (or white) reachable from any raster edge by a straight
    horizontal or vertical run of near-target pixels — the four
    line-scan passes of nearblack_lib.cpp (it processes each line
    from both ends, then each column)."""
    c3 = arr[:, :, :3] if arr.ndim == 3 else arr[:, :, None]
    target = 255 if white else 0
    nb = (np.abs(c3.astype(np.int64) - target) <= near).all(axis=2)
    h, w = nb.shape
    mask = np.zeros((h, w), dtype=bool)
    cols = np.arange(w)
    rows = np.arange(h)
    # left/right scans: leading run of near-target per row
    first = np.where(nb.all(axis=1), w, np.argmin(nb, axis=1))
    mask |= cols[None, :] < first[:, None]
    last = np.where(nb.all(axis=1), 0, w - np.argmin(nb[:, ::-1], axis=1))
    mask |= cols[None, :] >= last[:, None]
    # top/bottom scans per column
    firstc = np.where(nb.all(axis=0), h, np.argmin(nb, axis=0))
    mask |= rows[:, None] < firstc[None, :]
    lastc = np.where(nb.all(axis=0), 0, h - np.argmin(nb[::-1, :], axis=0))
    mask |= rows[:, None] >= lastc[None, :]
    return mask


def nearblack_images(images, near: int = 15, white: bool = False):
    """Per-image nearblack: collar pixels collapse to exact black/white
    and the emitted alpha zeroes them (the -setalpha behavior). Output:
    image_id, cleaned PNG (RGBA), n_collar, checksum."""

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 2:
                    arr = np.repeat(arr[:, :, None], 3, axis=2)
                rgb = arr[:, :, :3].copy()
                m = nearblack_mask(rgb, near=near, white=white)
                rgb[m] = 255 if white else 0
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
