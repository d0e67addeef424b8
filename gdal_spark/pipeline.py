"""`gdal pipeline` analog — the reference's modern unified CLI.

Reference: apps/gdalalg_abstract_pipeline.h (step chaining, `!`
separator), apps/gdalalg_raster_pipeline.cpp / gdalalg_vector_pipeline
.cpp (step registries), and the per-step option names taken verbatim
from their AddArg declarations (e.g. gdalalg_raster_reproject.cpp
``dst-crs``/``resampling``/``resolution``, gdalalg_vector_filter.cpp
``where``, gdalalg_vector_segmentize.cpp ``max-length``,
gdalalg_raster_scale.cpp ``src-min``..``exponent``). This module
parses the same ``read ... ! step ... ! write ...`` strings and lowers
each step onto the engine's existing distributed operators, so a user
of the reference CLI can run their pipeline text on Spark unchanged:

    run_pipeline(spark,
        "gdal raster pipeline read in/*.tif "
        "! reproject --dst-crs=EPSG:3857 --resampling=bilinear "
        "! write out.parquet")

Every step is a DataFrame -> DataFrame lowering (images-table rows for
raster pipelines, (wkb + envelope + attrs) feature rows for vector
pipelines), so the composed pipeline is ONE Catalyst plan — the
narrow per-row steps fuse into a single stage, and nothing
materializes between steps (the reference streams blocks between
steps for the same reason; here the optimizer does it).

Scope notes (documented, not silent): steps that change modality
(contour, polygonize, rasterize) and driver-specific creation options
are not exposed through the CLI surface — their operators exist and
compose in Python. Unknown steps/options raise with the supported
list, like the CLI's own usage errors.
"""

from __future__ import annotations

import os
import shlex

import numpy as np

from pyspark.sql import DataFrame, functions as F

__all__ = ["parse_pipeline", "run_pipeline", "RASTER_STEPS", "VECTOR_STEPS"]


# ---------------------------------------------------------------------------
# parsing


def _num(s: str):
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def _nums(s: str) -> list:
    return [_num(p) for p in str(s).split(",")]


def parse_pipeline(text: str):
    """Pipeline string -> (kind, [(step, positionals, options)]).

    ``kind`` is 'raster' / 'vector' when the string carries the CLI
    prefix (``gdal raster pipeline ...``) and None otherwise. Steps
    are split on standalone ``!`` tokens (the reference's separator);
    options accept both ``--name=value`` and ``--name value``;
    shell-style quoting applies (shlex), so ``--where="a = 'x'"``
    survives."""
    toks = shlex.split(text)
    kind = None
    if toks and toks[0] == "gdal":
        toks = toks[1:]
    if toks and toks[0] in ("raster", "vector"):
        kind = toks[0]
        toks = toks[1:]
    if toks and toks[0] == "pipeline":
        toks = toks[1:]
    steps: list[list[str]] = [[]]
    for t in toks:
        if t == "!":
            steps.append([])
        else:
            steps[-1].append(t)
    parsed = []
    for raw in steps:
        if not raw:
            continue
        name, rest = raw[0], raw[1:]
        pos: list[str] = []
        opts: dict[str, object] = {}
        i = 0
        while i < len(rest):
            t = rest[i]
            if t.startswith("--"):
                if "=" in t:
                    k, v = t[2:].split("=", 1)
                else:
                    k = t[2:]
                    # flag vs valued: valued iff a non-option token follows
                    if i + 1 < len(rest) and not rest[i + 1].startswith("--"):
                        i += 1
                        v = rest[i]
                    else:
                        v = True
                opts[k] = v
            else:
                pos.append(t)
            i += 1
        parsed.append((name, pos, opts))
    if not parsed:
        raise ValueError("empty pipeline")
    if parsed[0][0] != "read":
        raise ValueError(
            f"first step must be 'read', got {parsed[0][0]!r}"
        )
    return kind, parsed


def _srid(v) -> int:
    """'EPSG:3857' / '3857' / 3857 -> 3857."""
    s = str(v)
    if s.upper().startswith("EPSG:"):
        s = s[5:]
    return int(s)


def _check_opts(step: str, opts: dict, allowed: set):
    bad = set(opts) - allowed
    if bad:
        raise ValueError(
            f"step {step!r}: unknown option(s) {sorted(bad)}; "
            f"supported: {sorted(allowed)}"
        )


# ---------------------------------------------------------------------------
# raster steps (images-table rows in, images-table rows out)


def _read_raster(spark, pos, opts):
    _check_opts("read", opts, {"level", "target-bytes", "srid"})
    if not pos:
        raise ValueError("read: missing input path")
    path = pos[0]
    ext = os.path.splitext(path.rstrip("*").rstrip("/"))[1].lower()
    from . import formats

    if ext in (".tif", ".tiff"):
        if "level" in opts or "target-bytes" in opts:
            df = formats.scan_gtiff_windowed(
                spark, path, level=int(opts.get("level", 0)),
                target_bytes=int(opts.get("target-bytes", 32 << 20)),
            )
        else:
            df = formats.scan_gtiff(spark, path)
    elif ext == ".asc":
        df = formats.scan_aaigrid(spark, path, srid=int(opts.get("srid", 0)))
    else:  # the engine's own images tables
        df = spark.read.parquet(path)
    # downstream operators expect the full images-table surface
    for c, t in (("caption", "string"), ("phash", "long"),
                 ("nodata", "double")):
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(t))
    return df


def _reproject_raster(spark, df, pos, opts):
    _check_opts("reproject", opts, {
        "dst-crs", "resampling", "resolution", "target-aligned-pixels",
        "src-nodata"})
    from .operators.warp import warp_images

    res = opts.get("resolution")
    return warp_images(
        df,
        dst_srid=_srid(opts["dst-crs"]),
        resampling=str(opts.get("resampling", "near")),
        target_res=tuple(float(v) for v in _nums(res)) if res else None,
        tap=bool(opts.get("target-aligned-pixels", False)),
        src_nodata=(float(opts["src-nodata"])
                    if "src-nodata" in opts else None),
    )


def _clip_raster(spark, df, pos, opts):
    _check_opts("clip", opts, {"bbox", "window"})
    from .operators.translate import translate_images

    if "window" in opts:
        col, line, width, height = _nums(opts["window"])
        return translate_images(df, srcwin=(col, line, width, height))
    minx, miny, maxx, maxy = (float(v) for v in _nums(opts["bbox"]))
    return translate_images(df, projwin=(minx, maxy, maxx, miny))


def _resize_raster(spark, df, pos, opts):
    _check_opts("resize", opts, {"size", "resampling"})
    from .operators.translate import translate_images

    w, h = (int(v) for v in _nums(opts["size"]))
    return translate_images(
        df, outsize=(w, h), resampling=str(opts.get("resampling", "near"))
    )


def _scale_raster(spark, df, pos, opts):
    _check_opts("scale", opts, {
        "src-min", "src-max", "dst-min", "dst-max", "exponent"})
    from .operators.translate import translate_images

    scale = (float(opts["src-min"]), float(opts["src-max"]),
             float(opts.get("dst-min", 0.0)),
             float(opts.get("dst-max", 255.0)))
    exp = float(opts["exponent"]) if "exponent" in opts else None
    return translate_images(df, scale=scale, exponent=exp)


def _select_raster(spark, df, pos, opts):
    _check_opts("select", opts, {"band"})
    from .operators.translate import translate_images

    bands = [int(b) - 1 for b in _nums(opts["band"])]  # CLI bands: 1-based
    if any(b < 0 for b in bands):
        raise ValueError("select: band numbers are 1-based")
    return translate_images(df, bands=bands)


def _dem_step(kind):
    def step(spark, df, pos, opts):
        _check_opts(kind, opts, {
            "zfactor", "azimuth", "altitude", "gradient-alg", "percent"})
        from . import codecs
        from .operators.dem import dem_array

        z = float(opts.get("zfactor", 1.0))
        az = float(opts.get("azimuth", 315.0))
        alt = float(opts.get("altitude", 45.0))
        alg = str(opts.get("gradient-alg", "Horn")).lower()
        slope_format = "percent" if opts.get("percent") else "degree"
        import pandas as pd

        def do(batches):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                    if arr.ndim == 3:
                        arr = arr[:, :, 0]
                    out = dem_array(
                        arr.astype(np.float64), kind,
                        xres=abs(float(r.gt1)), yres=abs(float(r.gt5)),
                        z_factor=z, azimuth=az, altitude=alt, alg=alg,
                        slope_format=slope_format,
                    )
                    filled = np.nan_to_num(out, nan=-9999.0)
                    rows.append({
                        "image_id": r.image_id,
                        "bytes": codecs.encode_raw(filled),
                        "w": int(out.shape[1]), "h": int(out.shape[0]),
                        "fmt": "raw",
                        "gt0": r.gt0, "gt1": r.gt1, "gt2": r.gt2,
                        "gt3": r.gt3, "gt4": r.gt4, "gt5": r.gt5,
                        "srid": r.srid, "nodata": -9999.0,
                    })
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "bytes", "w", "h", "fmt", "gt0",
                             "gt1", "gt2", "gt3", "gt4", "gt5", "srid",
                             "nodata"],
                )

        return df.mapInPandas(
            do,
            schema="image_id string, bytes binary, w int, h int, "
                   "fmt string, gt0 double, gt1 double, gt2 double, "
                   "gt3 double, gt4 double, gt5 double, srid int, "
                   "nodata double",
        )

    return step


def _info_raster(spark, df, pos, opts):
    _check_opts("info", opts, set())
    from .operators.stats import raster_info

    return raster_info(df)


def _write_raster(spark, df, pos, opts):
    _check_opts("write", opts, {
        "compression", "tile-size", "predictor", "overviews", "nodata"})
    if not pos:
        raise ValueError("write: missing output path")
    path = pos[0]
    ext = os.path.splitext(path)[1].lower()
    from . import formats

    if ext in (".tif", ".tiff", ""):
        out_dir = path if ext == "" else os.path.dirname(path) or "."
        ovr = opts.get("overviews")
        formats.write_gtiff(
            df, out_dir,
            compression=str(opts.get("compression", "deflate")),
            predictor=bool(opts.get("predictor", False)),
            tile_size=(int(opts["tile-size"]) if "tile-size" in opts
                       else None),
            overviews=[int(v) for v in _nums(ovr)] if ovr else None,
        )
    elif ext == ".asc":
        formats.write_aaigrid(
            df, os.path.dirname(path) or ".",
            nodata=float(opts.get("nodata", -9999.0)),
        )
    elif ext == ".parquet":
        df.write.mode("overwrite").parquet(path)
    else:
        raise ValueError(f"write: unsupported raster output {path!r}")
    return df


RASTER_STEPS = {
    "read": _read_raster,
    "reproject": _reproject_raster,
    "clip": _clip_raster,
    "resize": _resize_raster,
    "scale": _scale_raster,
    "select": _select_raster,
    "slope": _dem_step("slope"),
    "aspect": _dem_step("aspect"),
    "hillshade": _dem_step("hillshade"),
    "tri": _dem_step("tri"),
    "tpi": _dem_step("tpi"),
    "roughness": _dem_step("roughness"),
    "info": _info_raster,
    "write": _write_raster,
}


# ---------------------------------------------------------------------------
# vector steps ((wkb + minx..maxy envelope + attrs) feature rows)


def _with_envelopes(df: DataFrame, geom_col: str = "geometry") -> DataFrame:
    """Format-driver rows (geometry WKB) -> the vector-operator surface
    (wkb + minx/miny/maxx/maxy), envelopes in one Arrow pass."""
    from . import geom as _geom
    import pandas as pd

    out_cols = [("wkb" if c == geom_col else c) for c in df.columns]
    fields = []
    for f in df.schema.fields:
        name = "wkb" if f.name == geom_col else f.name
        fields.append(f"`{name}` {f.dataType.simpleString()}")
    schema = ", ".join(
        fields + ["minx double", "miny double", "maxx double", "maxy double"]
    )

    def do(batches):
        for pdf in batches:
            pdf = pdf.rename(columns={geom_col: "wkb"})
            envs = np.full((len(pdf), 4), np.nan)
            for i, b in enumerate(pdf["wkb"]):
                if b is None:
                    continue
                envs[i] = _geom.parse_wkb(bytes(b)).envelope()
            pdf = pdf[out_cols].copy()
            pdf["minx"], pdf["miny"] = envs[:, 0], envs[:, 1]
            pdf["maxx"], pdf["maxy"] = envs[:, 2], envs[:, 3]
            yield pdf

    return df.mapInPandas(do, schema=schema)


def _expand_dir(path: str) -> str:
    """A distributed sink writes a DIRECTORY of part files; accept the
    directory itself for file-granular scans by globbing its parts."""
    import glob as _glob

    local = path[7:] if path.startswith("file://") else path
    if os.path.isdir(local):
        if _glob.glob(os.path.join(local, "part-*")):
            return os.path.join(path, "part-*")
        return os.path.join(path, "*")
    return path


def _read_vector(spark, pos, opts):
    _check_opts("read", opts, {"layer"})
    if not pos:
        raise ValueError("read: missing input path")
    path = pos[0]
    base = path.rstrip("*").rstrip("/")
    ext = os.path.splitext(base)[1].lower()
    from . import formats

    layer = opts.get("layer")
    if ext == ".shp":
        df = formats.scan_shapefile(spark, path)
    elif ext == ".gpkg":
        if not layer:
            raise ValueError("read: .gpkg needs --layer")
        df = formats.scan_geopackage(spark, path, str(layer))
    elif ext == ".fgb":
        df = formats.scan_flatgeobuf(spark, path)
    elif ext in (".geojson", ".json"):
        df = formats.scan_geojson(spark, path)
    elif ext in (".ndjson", ".geojsonl", ".jsonl"):
        df = formats.scan_geojson_seq(spark, _expand_dir(path))
    elif ext == ".csv":
        df = formats.scan_csv_vector(spark, path)
    elif ext == ".kml":
        df = formats.scan_kml(spark, path)
    elif ext == ".gml":
        df = formats.scan_gml(spark, path)
    elif ext == ".gpx":
        df = formats.scan_gpx(spark, path, layer=str(layer or "waypoints"))
    elif ext == ".gdb":
        if not layer:
            raise ValueError("read: .gdb needs --layer")
        df = formats.scan_filegdb(spark, path, str(layer))
    elif ext == ".parquet":
        df = formats.scan_geoparquet(spark, path)
        if "geometry" not in df.columns:
            raise ValueError("read: geoparquet without geometry column")
        drop = [c for c in ("bbox",) if c in df.columns]
        df = df.drop(*drop) if drop else df
    else:
        raise ValueError(f"read: unsupported vector input {path!r}")
    return _with_envelopes(df)


def _filter_vector(spark, df, pos, opts):
    _check_opts("filter", opts, {"where", "bbox"})
    from .operators.vector import spatial_filter, vector_filter

    if "bbox" in opts:
        minx, miny, maxx, maxy = (float(v) for v in _nums(opts["bbox"]))
        df = spatial_filter(df, minx, miny, maxx, maxy)
    if "where" in opts:
        df = vector_filter(df, str(opts["where"]))
    return df


def _select_vector(spark, df, pos, opts):
    _check_opts("select", opts, {"fields"})
    keep = [c for c in ("fid", "wkb", "minx", "miny", "maxx", "maxy")
            if c in df.columns]
    want = [str(c) for c in str(opts["fields"]).split(",")]
    missing = [c for c in want if c not in df.columns]
    if missing:
        raise ValueError(f"select: unknown field(s) {missing}")
    return df.select(*(keep + [c for c in want if c not in keep]))


def _reproject_vector(spark, df, pos, opts):
    _check_opts("reproject", opts, {"src-crs", "dst-crs"})
    from .operators.vector import reproject_features

    return reproject_features(
        df, _srid(opts["src-crs"]), _srid(opts["dst-crs"])
    )


def _clip_vector(spark, df, pos, opts):
    _check_opts("clip", opts, {"bbox"})
    from .operators.vector import clip_features

    minx, miny, maxx, maxy = (float(v) for v in _nums(opts["bbox"]))
    return clip_features(df, minx, miny, maxx, maxy)


def _simplify_vector(spark, df, pos, opts):
    _check_opts("simplify", opts, {"tolerance"})
    from .operators.vector import simplify_features

    return simplify_features(df, float(opts["tolerance"]))


def _segmentize_vector(spark, df, pos, opts):
    _check_opts("segmentize", opts, {"max-length"})
    from .operators.vector import segmentize

    return segmentize(df, float(opts["max-length"]))


def _buffer_vector(spark, df, pos, opts):
    _check_opts("buffer", opts, {"distance", "quadrant-segments"})
    from .operators.buffer import buffer_features

    return buffer_features(
        df, float(opts["distance"]),
        quad_segs=int(opts.get("quadrant-segments", 8)),
    )


def _swap_xy_vector(spark, df, pos, opts):
    _check_opts("swap-xy", opts, set())
    from .operators.vector import swap_xy

    return swap_xy(df)


def _explode_vector(spark, df, pos, opts):
    _check_opts("explode-collections", opts, set())
    from .operators.vector import explode_collections

    return explode_collections(df)


def _make_valid_vector(spark, df, pos, opts):
    _check_opts("make-valid", opts, set())
    from .operators.vector import make_valid_features

    return make_valid_features(df)


def _sql_vector(spark, df, pos, opts):
    _check_opts("sql", opts, {"statement"})
    from .sql import execute_sql

    stmt = str(opts["statement"]) if "statement" in opts else (
        pos[0] if pos else None)
    if not stmt:
        raise ValueError("sql: missing --statement")
    return execute_sql(spark, stmt, {"input": (df, "wkb")})


def _info_vector(spark, df, pos, opts):
    _check_opts("info", opts, set())
    from .operators.vector import vector_info

    return vector_info(df, geom_col="wkb")


def _write_vector(spark, df, pos, opts):
    _check_opts("write", opts, {"layer"})
    if not pos:
        raise ValueError("write: missing output path")
    path = pos[0]
    ext = os.path.splitext(path)[1].lower()
    from . import formats

    out = df.withColumnRenamed("wkb", "geometry")
    drop = [c for c in ("minx", "miny", "maxx", "maxy") if c in out.columns]
    out = out.drop(*drop)
    if ext == ".shp":
        formats.write_shapefile(out, path)
    elif ext == ".gpkg":
        formats.write_geopackage(out, path, str(opts.get("layer", "layer")))
    elif ext == ".fgb":
        formats.write_flatgeobuf(out, path)
    elif ext in (".ndjson", ".geojsonl", ".jsonl", ".geojson", ".json"):
        formats.write_geojson_seq(out, path)
    elif ext == ".csv":
        formats.write_csv_vector(out, path)
    elif ext == ".kml":
        formats.write_kml(out, path)
    elif ext == ".gml":
        formats.write_gml(out, path)
    elif ext == ".gpx":
        formats.write_gpx(out, path)
    elif ext == ".parquet":
        formats.write_geoparquet(out, path)
    else:
        raise ValueError(f"write: unsupported vector output {path!r}")
    return df


VECTOR_STEPS = {
    "read": _read_vector,
    "filter": _filter_vector,
    "select": _select_vector,
    "reproject": _reproject_vector,
    "clip": _clip_vector,
    "simplify": _simplify_vector,
    "segmentize": _segmentize_vector,
    "buffer": _buffer_vector,
    "swap-xy": _swap_xy_vector,
    "explode-collections": _explode_vector,
    "make-valid": _make_valid_vector,
    "sql": _sql_vector,
    "info": _info_vector,
    "write": _write_vector,
}


# ---------------------------------------------------------------------------
# driver


def run_pipeline(spark, text: str, kind: str | None = None) -> DataFrame:
    """Parse + lower + run a ``gdal {raster|vector} pipeline`` string;
    returns the final step's DataFrame (``write`` executes the sink and
    passes its input through, like the CLI)."""
    parsed_kind, steps = parse_pipeline(text)
    kind = kind or parsed_kind
    if kind not in ("raster", "vector"):
        raise ValueError(
            "pipeline kind not given: pass kind= or prefix the string "
            "with 'gdal raster pipeline' / 'gdal vector pipeline'"
        )
    registry = RASTER_STEPS if kind == "raster" else VECTOR_STEPS
    # validate the whole pipeline before lowering anything (the CLI
    # parses all steps before the first block moves)
    for i, (name, _pos, _opts) in enumerate(steps):
        if name not in registry:
            raise ValueError(
                f"unknown {kind} step {name!r}; supported: "
                f"{sorted(registry)}"
            )
        if i > 0 and name == "read":
            raise ValueError("read must be the first step")
    df = None
    for i, (name, pos, opts) in enumerate(steps):
        if i == 0:
            df = registry["read"](spark, pos, opts)
        else:
            df = registry[name](spark, df, pos, opts)
    return df
