"""Arc/Info ASCII Grid (AAIGrid) driver — the text DEM interchange format.

Reference driver: frmts/aaigrid/aaigriddataset.cpp. Implemented from the
published format description: a header of ``ncols nrows
xllcorner|xllcenter yllcorner|yllcenter cellsize [nodata_value]``
key/value lines (case-insensitive, any order after ncols/nrows) followed
by ``nrows`` rows of whitespace-separated cell values, top row first.
``*llcenter`` shifts the origin by half a cell (the reference's
handling); the affine geotransform is north-up ``(xll, cs, 0, ytop, 0,
-cs)``.

Spark shape: AAIGrid files are whole-document (the header governs the
body), so the unit of parallelism is the FILE — a glob of N files fans
out N tasks via the binaryFile source, exactly like the GeoJSON
FeatureCollection path. Each file becomes one row of the engine's
images table (``bytes`` holds the raw float64 grid in the engine's GSRW
container, georef in ``gt0..gt5``), after which every raster operator
(warp, contour, DEM, zonal...) applies unchanged. The sink streams one
file per row back out.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ._util import local_path
from .. import codecs

OUT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
    "gt5 double, srid int, nodata double"
)


def parse_aaigrid(text: str):
    """-> (array float64 (h, w) with nodata as NaN, geotransform, nodata)."""
    toks = text.split()
    hdr = {}
    pos = 0
    while pos + 1 < len(toks):
        key = toks[pos].lower()
        if key in ("ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
                   "yllcenter", "cellsize", "nodata_value", "dx", "dy"):
            hdr[key] = float(toks[pos + 1])
            pos += 2
        else:
            break
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    cx = hdr.get("dx", hdr.get("cellsize"))
    cy = hdr.get("dy", hdr.get("cellsize"))
    if cx is None or cy is None:
        raise ValueError("AAIGrid header missing cellsize")
    xll = hdr.get("xllcorner", hdr.get("xllcenter"))
    yll = hdr.get("yllcorner", hdr.get("yllcenter"))
    if xll is None or yll is None:
        raise ValueError("AAIGrid header missing ll origin")
    if "xllcenter" in hdr:
        xll -= cx / 2
    if "yllcenter" in hdr:
        yll -= cy / 2
    vals = np.asarray(toks[pos:pos + w * h], dtype=np.float64)
    if vals.size != w * h:
        raise ValueError(
            f"AAIGrid body has {vals.size} values, expected {w * h}"
        )
    arr = vals.reshape(h, w)
    nodata = hdr.get("nodata_value")
    if nodata is not None:
        arr = np.where(arr == nodata, np.nan, arr)
    gt = (xll, cx, 0.0, yll + h * cy, 0.0, -cy)
    return arr, gt, nodata


def format_aaigrid(arr: np.ndarray, gt, nodata: float | None = -9999.0) -> str:
    """Inverse of :func:`parse_aaigrid` (north-up grids only, like the
    reference's CreateCopy)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        a = a[:, :, 0]
    h, w = a.shape
    if gt[2] != 0 or gt[4] != 0 or gt[5] >= 0:
        raise ValueError("AAIGrid requires a north-up, unrotated grid")
    if abs(abs(gt[1]) - abs(gt[5])) > 1e-12:
        raise ValueError("AAIGrid requires square cells (use dx/dy readers)")
    # float() unwrap everywhere: repr(np.float64(v)) is 'np.float64(v)'
    # under numpy>=2, which would corrupt the file silently.
    lines = [
        f"ncols {w}",
        f"nrows {h}",
        f"xllcorner {float(gt[0])!r}",
        f"yllcorner {float(gt[3] + h * gt[5])!r}",
        f"cellsize {float(gt[1])!r}",
    ]
    if nodata is not None:
        lines.append(f"NODATA_value {float(nodata)!r}")
        a = np.where(np.isnan(a), nodata, a)
    body = "\n".join(" ".join(repr(float(v)) for v in row) for row in a)
    return "\n".join(lines) + "\n" + body + "\n"


def scan_aaigrid(spark, path_glob: str, srid: int = 0):
    """Glob of .asc files -> images-table rows (one task per file)."""

    def parse(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr, gt, nodata = parse_aaigrid(
                    bytes(r.content).decode("ascii")
                )
                rows.append({
                    "image_id": os.path.splitext(os.path.basename(r.path))[0],
                    "bytes": codecs.encode_raw(arr),
                    "w": arr.shape[1], "h": arr.shape[0], "fmt": "raw",
                    "gt0": gt[0], "gt1": gt[1], "gt2": gt[2],
                    "gt3": gt[3], "gt4": gt[4], "gt5": gt[5],
                    "srid": srid,
                    "nodata": nodata,
                })
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "gt0", "gt1",
                         "gt2", "gt3", "gt4", "gt5", "srid", "nodata"],
            )

    return (
        spark.read.format("binaryFile").load(path_glob)
        .select("path", "content")
        .mapInPandas(parse, schema=OUT_SCHEMA)
    )


def write_aaigrid(df, out_dir: str, nodata: float | None = -9999.0):
    """One .asc file per row, written BY THE TASK that holds the row (a
    distributed many-files sink — AAIGrid has no multi-dataset container,
    so file-per-row is the natural layout and there is no driver funnel).
    A per-row ``nodata`` column (the one :func:`scan_aaigrid` emits)
    takes precedence over the function-level default, so a grid whose
    nodata marker collides with legitimate default-marker values
    round-trips faithfully."""
    out_dir = local_path(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    has_nodata_col = "nodata" in df.columns

    def dump(batches):
        for pdf in batches:
            names = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                gt = tuple(float(getattr(r, f"gt{i}")) for i in range(6))
                nd = nodata
                if has_nodata_col and r.nodata is not None and not pd.isna(r.nodata):
                    nd = float(r.nodata)
                path = os.path.join(out_dir, f"{r.image_id}.asc")
                with open(path, "w") as f:
                    f.write(format_aaigrid(arr, gt, nd))
                names.append(path)
            yield pd.DataFrame({"path": names})

    return [
        r.path
        for r in df.mapInPandas(dump, schema="path string").collect()
    ]
