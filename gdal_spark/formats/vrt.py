"""GDAL VRT (virtual raster XML) driver — read and gdalbuildvrt-style write.

Reference: ``frmts/vrt/vrtdataset.cpp`` (dataset/band XML layout) and
``frmts/vrt/vrtsources.cpp:1317-1331`` (``VRTSimpleSource::RasterIO``
src-window -> dst-window composition; ComplexSource scale/offset + NODATA
masking), plus the published format description. Implemented from the
public spec — no reference code.

Spark shape: a ``.vrt`` file is a TINY XML plan over big source rasters,
so the scan parses the XML driver-side (the .vrt bytes only — never a
source pixel) and fans out ONE TASK PER SOURCE: each task opens only its
own source file, cuts ``SrcRect``, resamples to ``DstRect`` size
(pixel-center nearest by default, the reference's default for simple
sources), applies the ComplexSource value map, and ships a
dst-positioned fragment. A ``groupBy(vrt)`` compose then paints the
fragments in document order (the reference's painter semantics: later
sources overwrite earlier ones where their data is valid) into the band
canvases. The shuffle carries exactly the painted fragment bytes — a
10k-source VRT decodes on 10k tasks, not one.

The write side is the true ``gdalbuildvrt`` artifact (the reference's
``apps/gdalbuildvrt_lib.cpp`` emits this same lazy XML): one
``SimpleSource`` per input row placed onto the union grid, so real GDAL
can open what this engine wrote, and vice versa. Only georef COLUMNS are
aggregated to build it — no pixels move.

Scope (documented): SimpleSource + ComplexSource (ScaleRatio/ScaleOffset
+ NODATA); ComplexSource LUT/Exponent and derived-band pixel functions
are out of scope here — the engine's pixel-function surface is
``operators.stats.raster_calc`` (SURVEY §2: Spark's lazy DataFrame DAG
IS the VRT; this driver is the interchange shim for on-disk .vrt files).
Nested .vrt sources recurse to depth 4.

WARPED VRT (``subClass="VRTWarpedDataset"``, frmts/vrt/vrtwarped.cpp +
the GDALWarpOptions serialization of alg/gdalwarper.cpp:1918-2205): the
lazy gdalwarp artifact — dst grid + ``<GDALWarpOptions>`` carrying
ResampleAlg / SourceDataset / MaxError / SourceSRS. Reads lower onto the
engine's own ``operators.warp.warp_array`` (every GRA_* kernel name maps
to its gdalwarp -r twin); ``write_warped_vrt`` emits the artifact from
HEADER BYTES ONLY (georef tags, never a pixel) so describing a 100 GB
reprojection costs one metadata read. In the distributed scan each
warped .vrt is one task (the source file is that task's whole input);
a directory of them fans out task-per-file.
"""

from __future__ import annotations

import glob
import os
import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd

from ._util import local_path
from .. import codecs
from ..resample import resize

OUT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
    "gt5 double, srid int, nodata double"
)

_FRAG_SCHEMA = (
    "vrt string, band int, src_order int, dx int, dy int, fw int, fh int, "
    "data binary, mask binary"
)

_DTYPES = {
    "Byte": np.uint8, "UInt16": np.uint16, "Int16": np.int16,
    "UInt32": np.uint32, "Int32": np.int32, "Float32": np.float32,
    "Float64": np.float64,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}

_MAX_DEPTH = 4

# GDALSerializeWarpOptions / GDALDeserializeWarpOptions name table
# (alg/gdalwarper.cpp:1921-1948, 2166-2193) -> the engine's gdalwarp -r
# kernel names (operators/warp.py + resample.py)
_GDAL_RESAMPLE = {
    "NearestNeighbour": "near", "Bilinear": "bilinear", "Cubic": "cubic",
    "CubicSpline": "cubicspline", "Lanczos": "lanczos", "Average": "average",
    "RootMeanSquare": "rms", "Mode": "mode", "Maximum": "max",
    "Minimum": "min", "Median": "med", "Quartile1": "q1", "Quartile3": "q3",
    "Sum": "sum", "Default": "near",
}
_RESAMPLE_GDAL = {v: k for k, v in _GDAL_RESAMPLE.items() if k != "Default"}


def _srid_from_srs(text: str | None) -> int:
    """SRS element -> EPSG code. Accepts 'EPSG:n', bare digits, or WKT
    (last AUTHORITY["EPSG","n"] wins, the projected CRS in a compound)."""
    if not text:
        return 0
    t = text.strip()
    m = re.fullmatch(r"(?i)EPSG:\s*(\d+)", t)
    if m:
        return int(m.group(1))
    if t.isdigit():
        return int(t)
    codes = re.findall(r'AUTHORITY\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', t)
    return int(codes[-1]) if codes else 0


def _rect(el) -> tuple[int, int, int, int] | None:
    if el is None:
        return None
    return (int(float(el.get("xOff"))), int(float(el.get("yOff"))),
            int(float(el.get("xSize"))), int(float(el.get("ySize"))))


def parse_vrt(text: str, base_dir: str) -> dict:
    """VRT XML -> descriptor dict (no source file is touched)."""
    root = ET.fromstring(text)
    if root.tag != "VRTDataset":
        raise ValueError(f"not a VRTDataset (root <{root.tag}>)")
    W = int(root.get("rasterXSize"))
    H = int(root.get("rasterYSize"))
    gt_el = root.find("GeoTransform")
    if gt_el is not None and gt_el.text:
        gt = tuple(float(v) for v in gt_el.text.replace(",", " ").split())
        if len(gt) != 6:
            raise ValueError("GeoTransform needs 6 coefficients")
    else:
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    srid = _srid_from_srs(getattr(root.find("SRS"), "text", None))
    if root.get("subClass") == "VRTWarpedDataset":
        return _parse_warped(root, base_dir, W, H, gt, srid)
    bands = []
    for bel in root.findall("VRTRasterBand"):
        dt = bel.get("dataType", "Byte")
        if dt not in _DTYPES:
            raise ValueError(f"unsupported VRT dataType {dt!r}")
        nd_el = bel.find("NoDataValue")
        nodata = (float(nd_el.text) if nd_el is not None and nd_el.text
                  else None)
        sources = []
        for sel in bel:
            if sel.tag not in ("SimpleSource", "ComplexSource"):
                continue
            fn_el = sel.find("SourceFilename")
            fn = fn_el.text.strip()
            if fn_el.get("relativeToVRT", "0") == "1":
                fn = os.path.join(base_dir, fn)
            sb_el = sel.find("SourceBand")
            nd_src = sel.find("NODATA")
            sr = sel.find("ScaleRatio")
            so = sel.find("ScaleOffset")
            src_rect = _rect(sel.find("SrcRect"))
            dst_rect = _rect(sel.find("DstRect"))
            # the reference requires the windows set together
            # (vrtdataset.h IsSrcWinSet/IsDstWinSet + the GetSrcDstWindow
            # debug assert; a half-set source paints nothing in release) —
            # surface that as a parse error instead of silence
            if (src_rect is None) != (dst_rect is None):
                raise ValueError(
                    f"{fn}: SrcRect and DstRect must be set together")
            sources.append({
                "kind": "complex" if sel.tag == "ComplexSource" else "simple",
                "filename": fn,
                "band": int(sb_el.text) if sb_el is not None else 1,
                "src_rect": src_rect,
                "dst_rect": dst_rect,
                "resampling": sel.get("resampling", "near")
                .replace("nearest", "near"),
                "scale_ratio": float(sr.text) if sr is not None else 1.0,
                "scale_offset": float(so.text) if so is not None else 0.0,
                "src_nodata": (float(nd_src.text) if nd_src is not None
                               else None),
            })
        bands.append({"band": int(bel.get("band", len(bands) + 1)),
                      "dtype": dt, "nodata": nodata, "sources": sources})
    if not bands:
        raise ValueError("VRTDataset has no VRTRasterBand")
    return {"w": W, "h": H, "gt": gt, "srid": srid, "bands": bands}


def _parse_warped(root, base_dir: str, W: int, H: int, gt, srid: int) -> dict:
    """``subClass="VRTWarpedDataset"`` -> warped descriptor. Parses the
    GDALWarpOptions subset a gdalwarp-written artifact carries: the
    source dataset path, the ResampleAlg name table, ApproxTransformer
    MaxError, ReprojectionTransformer SourceSRS/TargetSRS, and the
    BandList's SrcNoDataReal."""
    bands = root.findall("VRTRasterBand")
    dt = bands[0].get("dataType", "Byte") if bands else "Byte"
    if dt not in _DTYPES:
        raise ValueError(f"unsupported VRT dataType {dt!r}")
    nd_el = bands[0].find("NoDataValue") if bands else None
    nodata = (float(nd_el.text) if nd_el is not None and nd_el.text
              else None)
    wo = root.find("GDALWarpOptions")
    if wo is None:
        raise ValueError("VRTWarpedDataset without GDALWarpOptions")
    sd = wo.find("SourceDataset")
    if sd is None or not (sd.text or "").strip():
        raise ValueError("GDALWarpOptions without SourceDataset")
    fn = sd.text.strip()
    if sd.get("relativeToVRT", "0") == "1":
        fn = os.path.join(base_dir, fn)
    alg_name = getattr(wo.find("ResampleAlg"), "text", None) or "Default"
    alg = _GDAL_RESAMPLE.get(alg_name.strip())
    if alg is None:
        raise ValueError(f"unrecognised ResampleAlg {alg_name!r}")
    me_el = wo.find(".//ApproxTransformer/MaxError")
    max_error = float(me_el.text) if me_el is not None and me_el.text else None
    src_srs = wo.find(".//ReprojectionTransformer/SourceSRS")
    src_srid = _srid_from_srs(getattr(src_srs, "text", None))
    if not srid:
        tgt = wo.find(".//ReprojectionTransformer/TargetSRS")
        srid = _srid_from_srs(getattr(tgt, "text", None))
    snd = wo.find(".//BandList/BandMapping/SrcNoDataReal")
    src_nodata = float(snd.text) if snd is not None and snd.text else None
    return {
        "w": W, "h": H, "gt": gt, "srid": srid, "warped": True,
        "src_filename": fn, "resampling": alg, "max_error": max_error,
        "src_srid": src_srid, "src_nodata": src_nodata,
        "bands": [{"band": 1, "dtype": dt, "nodata": nodata,
                   "sources": []}],
    }


def _read_source_georef(path: str, _depth: int = 0):
    """Georeferenced source read -> (array, gt, srid, nodata). Warped
    sources must carry their own georef: .tif, .asc (gt only), or a
    nested .vrt (depth-capped)."""
    p = local_path(path)
    ext = os.path.splitext(p)[1].lower().lstrip(".")
    if ext in ("tif", "tiff"):
        from .gtiff import parse_gtiff

        with open(p, "rb") as f:
            return parse_gtiff(f.read())
    if ext == "asc":
        from .aaigrid import parse_aaigrid

        with open(p) as f:
            arr, gt, nodata = parse_aaigrid(f.read())
        return arr, gt, 0, nodata
    if ext == "vrt":
        if _depth >= _MAX_DEPTH:
            raise ValueError(f"nested VRT deeper than {_MAX_DEPTH}: {path}")
        with open(p) as f:
            desc = parse_vrt(f.read(), os.path.dirname(p))
        return materialize_vrt(desc, _depth + 1)
    raise ValueError(
        f"warped-VRT source needs a georeferenced format, got {path!r}")


def _materialize_warped(desc: dict, _depth: int = 0):
    """Warped descriptor -> (array in band dtype, gt, srid, nodata): the
    in-task warp, lowering GDALWarpOptions onto operators.warp.warp_array
    (the ChunkAndWarpImage analog). Pixels where the warp kernel found no
    valid source (alpha 0) take the band NoDataValue (or 0)."""
    from ..operators.warp import warp_array

    src, src_gt, src_srid, _src_nd = _read_source_georef(
        desc["src_filename"], _depth)
    if desc["src_srid"]:
        src_srid = desc["src_srid"]
    a = np.asarray(src, dtype=np.float64)
    out, alpha = warp_array(
        a, src_gt, src_srid, (desc["h"], desc["w"]), desc["gt"],
        desc["srid"], desc["resampling"], approx_error=desc["max_error"],
        src_nodata=desc["src_nodata"],
    )
    b = desc["bands"][0]
    fill = b["nodata"] if b["nodata"] is not None else 0.0
    out = np.where(
        (alpha == 0)[..., None] if out.ndim == 3 else alpha == 0, fill, out)
    dt = _DTYPES[b["dtype"]]
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        out = np.clip(np.round(out), info.min, info.max)
    return out.astype(dt), desc["gt"], desc["srid"], b["nodata"]


def write_warped_vrt(src_path: str, vrt_path: str, dst_srid: int,
                     resampling: str = "near",
                     max_error: float | None = 0.125,
                     relative: bool = True) -> str:
    """gdalwarp -of VRT analog: describe a reprojection lazily. Reads
    ONLY the source's georef header (gtiff_levels walks tag bytes — the
    COG read discipline), computes the suggested output grid, and emits
    the reference's GDALWarpOptions serialization shape so real GDAL can
    open the artifact. No pixel is touched. SRS elements carry the
    ``EPSG:n`` user-input form (both this parser and the reference's
    SetFromUserInput accept it; WKT1 would also work via crs_wkt but is
    only exportable for registered projected CRS)."""
    from ..operators.warp import suggested_output_grid

    if resampling not in _RESAMPLE_GDAL:
        raise ValueError(f"unknown resampling {resampling!r}")
    src_path = local_path(src_path)
    ext = os.path.splitext(src_path)[1].lower().lstrip(".")
    if ext not in ("tif", "tiff"):
        raise ValueError("write_warped_vrt reads georef headers from .tif")
    from .gtiff import gtiff_levels

    with open(src_path, "rb") as f:
        levels, gt, srid, _nd = gtiff_levels(f)
    w, h = levels[0]["w"], levels[0]["h"]
    bits, sfmt = levels[0]["bits"], levels[0].get("sfmt", 1)
    dt_name = {(8, 1): "Byte", (16, 1): "UInt16", (16, 2): "Int16",
               (32, 1): "UInt32", (32, 2): "Int32", (32, 3): "Float32",
               (64, 3): "Float64"}.get((bits, sfmt), "Byte")
    if not srid:
        raise ValueError(f"{src_path} has no SRS; cannot describe a warp")
    dst_gt, out_w, out_h = suggested_output_grid(gt, srid, w, h, dst_srid)
    vrt_path = local_path(vrt_path)
    base = os.path.dirname(os.path.abspath(vrt_path))
    fn = os.path.abspath(src_path)
    rel = relative and os.path.dirname(fn) == base
    shown = os.path.basename(fn) if rel else fn
    me = ("" if max_error is None else
          f"""
      <ApproxTransformer>
        <MaxError>{float(max_error)!r}</MaxError>
        <BaseTransformer>""")
    me_close = "" if max_error is None else """
        </BaseTransformer>
      </ApproxTransformer>"""
    xml = f"""<VRTDataset rasterXSize="{out_w}" rasterYSize="{out_h}" subClass="VRTWarpedDataset">
  <SRS>EPSG:{dst_srid}</SRS>
  <GeoTransform>{", ".join(repr(float(v)) for v in dst_gt)}</GeoTransform>
  <VRTRasterBand dataType="{dt_name}" band="1" subClass="VRTWarpedRasterBand"/>
  <GDALWarpOptions>
    <ResampleAlg>{_RESAMPLE_GDAL[resampling]}</ResampleAlg>
    <WorkingDataType>Float64</WorkingDataType>
    <SourceDataset relativeToVRT="{int(rel)}">{escape(shown)}</SourceDataset>
    <Transformer>{me}
          <GenImgProjTransformer>
            <ReprojectTransformer>
              <ReprojectionTransformer>
                <SourceSRS>EPSG:{srid}</SourceSRS>
                <TargetSRS>EPSG:{dst_srid}</TargetSRS>
              </ReprojectionTransformer>
            </ReprojectTransformer>
          </GenImgProjTransformer>{me_close}
    </Transformer>
    <BandList>
      <BandMapping src="1" dst="1"/>
    </BandList>
  </GDALWarpOptions>
</VRTDataset>
"""
    with open(vrt_path, "w") as f:
        f.write(xml)
    return vrt_path


def _read_source_band(path: str, band: int, _depth: int = 0) -> np.ndarray:
    """One band of one source file as a 2-D float64 array. Dispatch by
    extension: .tif (gtiff driver), .asc (AAIGrid), nested .vrt
    (recursive, depth-capped), else the image codecs (png/jpg/bmp/pnm/
    GSRW raw)."""
    p = local_path(path)
    ext = os.path.splitext(p)[1].lower().lstrip(".")
    if ext in ("tif", "tiff"):
        from .gtiff import parse_gtiff

        with open(p, "rb") as f:
            arr = parse_gtiff(f.read())[0]
    elif ext == "asc":
        from .aaigrid import parse_aaigrid

        with open(p) as f:
            arr = parse_aaigrid(f.read())[0]
    elif ext == "vrt":
        if _depth >= _MAX_DEPTH:
            raise ValueError(f"nested VRT deeper than {_MAX_DEPTH}: {path}")
        with open(p) as f:
            desc = parse_vrt(f.read(), os.path.dirname(p))
        arr = materialize_vrt(desc, _depth + 1)[0]
    else:
        with open(p, "rb") as f:
            arr = codecs.decode_image(f.read(), ext)
    a = np.asarray(arr)
    if a.ndim == 3:
        if band > a.shape[2]:
            raise ValueError(f"{path} has {a.shape[2]} bands, asked {band}")
        a = a[:, :, band - 1]
    elif band != 1:
        raise ValueError(f"{path} is single-band, asked band {band}")
    return a.astype(np.float64)


def _source_fragment(src: dict, W: int, H: int, _depth: int = 0):
    """One source -> (dx, dy, values float64 (fh, fw), valid bool) clipped
    to the canvas, the VRTSimpleSource::RasterIO window composition."""
    a = _read_source_band(src["filename"], src["band"], _depth)
    sh, sw = a.shape
    # both windows unset -> identity placement clipped to the source
    # (GetSrcDstWindow with UNINIT windows: dfScale = -1/-1 = 1, request
    # clamped to the band size — NOT a stretch onto the full canvas)
    sx, sy, sxs, sys = src["src_rect"] or (0, 0, sw, sh)
    dx, dy, dxs, dys = src["dst_rect"] or (0, 0, sxs, sys)
    cut = a[sy:sy + sys, sx:sx + sxs]
    if cut.shape != (dys, dxs):
        cut = np.asarray(
            resize(cut, dys, dxs, src["resampling"]), dtype=np.float64
        )
    valid = np.ones(cut.shape, dtype=bool)
    if src["src_nodata"] is not None:
        valid = cut != src["src_nodata"]
    if src["kind"] == "complex":
        cut = cut * src["scale_ratio"] + src["scale_offset"]
    # clip the dst window to the canvas (the reference clamps the same way)
    x0, y0 = max(dx, 0), max(dy, 0)
    x1, y1 = min(dx + dxs, W), min(dy + dys, H)
    if x1 <= x0 or y1 <= y0:
        return None
    cut = cut[y0 - dy:y1 - dy, x0 - dx:x1 - dx]
    valid = valid[y0 - dy:y1 - dy, x0 - dx:x1 - dx]
    return x0, y0, cut, valid


def materialize_vrt(desc: dict, _depth: int = 0):
    """Full local assembly of a parsed VRT -> (array (h, w) or (h, w, c)
    in the band dtype, gt, srid, nodata). The in-task path for nested
    sources, and the driver-local replay used by tests/oracles; the
    distributed scan reproduces this bit-for-bit via fragments."""
    if desc.get("warped"):
        return _materialize_warped(desc, _depth)
    W, H = desc["w"], desc["h"]
    dts = {b["dtype"] for b in desc["bands"]}
    if len(dts) != 1:
        raise ValueError(f"mixed band dataTypes {sorted(dts)} unsupported")
    planes = []
    for b in desc["bands"]:
        canvas = np.zeros((H, W), dtype=np.float64)
        for src in b["sources"]:
            frag = _source_fragment(src, W, H, _depth)
            if frag is None:
                continue
            x0, y0, cut, valid = frag
            region = canvas[y0:y0 + cut.shape[0], x0:x0 + cut.shape[1]]
            region[valid] = cut[valid]
        planes.append(canvas)
    dt = _DTYPES[desc["bands"][0]["dtype"]]
    out = np.dstack(planes) if len(planes) > 1 else planes[0]
    if np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        out = np.clip(np.round(out), info.min, info.max)
    return out.astype(dt), desc["gt"], desc["srid"], desc["bands"][0]["nodata"]


def scan_vrt(spark, path_glob: str):
    """Glob of .vrt files -> images-table rows. Driver reads ONLY the XML
    plans; pixel work fans out one task per (vrt, band, source); a
    groupBy(vrt) compose paints fragments in document order."""
    paths = sorted(glob.glob(local_path(path_glob)))
    if not paths:
        raise ValueError(f"no .vrt files match {path_glob!r}")
    plan_rows = []
    metas = {}
    warped = []
    for p in paths:
        with open(p) as f:
            desc = parse_vrt(f.read(), os.path.dirname(p))
        if desc.get("warped"):
            warped.append((p, desc))
            continue
        metas[p] = desc
        for b in desc["bands"]:
            for order, src in enumerate(b["sources"]):
                sr = src["src_rect"] or (-1, -1, -1, -1)
                dr = src["dst_rect"] or (-1, -1, -1, -1)
                plan_rows.append((
                    p, desc["w"], desc["h"], int(b["band"]), order,
                    src["kind"], src["filename"], src["band"],
                    *sr, *dr, src["resampling"],
                    src["scale_ratio"], src["scale_offset"],
                    src["src_nodata"],
                ))
    plan = spark.createDataFrame(
        plan_rows,
        "vrt string, cw int, ch int, band int, src_order int, kind string, "
        "filename string, src_band int, sx int, sy int, sxs int, sys int, "
        "dx int, dy int, dxs int, dys int, resampling string, "
        "scale_ratio double, scale_offset double, src_nodata double",
    ).repartition(max(len(plan_rows), 1))

    def cut(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                src = {
                    "kind": r.kind, "filename": r.filename,
                    "band": int(r.src_band),
                    "src_rect": None if r.sx < 0 else
                    (int(r.sx), int(r.sy), int(r.sxs), int(r.sys)),
                    "dst_rect": None if r.dx < 0 else
                    (int(r.dx), int(r.dy), int(r.dxs), int(r.dys)),
                    "resampling": r.resampling,
                    "scale_ratio": float(r.scale_ratio),
                    "scale_offset": float(r.scale_offset),
                    "src_nodata": None if pd.isna(r.src_nodata)
                    else float(r.src_nodata),
                }
                frag = _source_fragment(src, int(r.cw), int(r.ch))
                if frag is None:
                    continue
                x0, y0, vals, valid = frag
                out.append({
                    "vrt": r.vrt, "band": int(r.band),
                    "src_order": int(r.src_order),
                    "dx": x0, "dy": y0,
                    "fw": vals.shape[1], "fh": vals.shape[0],
                    "data": vals.astype("<f8").tobytes(),
                    "mask": b"" if valid.all()
                    else np.packbits(valid).tobytes(),
                })
            yield pd.DataFrame(
                out, columns=["vrt", "band", "src_order", "dx", "dy",
                              "fw", "fh", "data", "mask"],
            )

    frags = plan.mapInPandas(cut, schema=_FRAG_SCHEMA)
    meta_b = {p: (d["w"], d["h"], d["gt"], d["srid"],
                  [b["band"] for b in d["bands"]],
                  d["bands"][0]["dtype"], d["bands"][0]["nodata"])
              for p, d in metas.items()}
    dts = {v[5] for v in meta_b.values()}
    if len(dts) > 1 or any(len({b["dtype"] for b in d["bands"]}) != 1
                           for d in metas.values()):
        raise ValueError("mixed band dataTypes unsupported")
    bmeta = spark.sparkContext.broadcast(meta_b)

    def compose(pdf: pd.DataFrame) -> pd.DataFrame:
        vrt = pdf["vrt"].iloc[0]
        W, H, gt, srid, band_ids, dt_name, nodata = bmeta.value[vrt]
        dt = _DTYPES[dt_name]
        planes = []
        for bid in band_ids:
            canvas = np.zeros((H, W), dtype=np.float64)
            sub = pdf[pdf["band"] == bid].sort_values("src_order")
            for r in sub.itertuples(index=False):
                vals = np.frombuffer(bytes(r.data), dtype="<f8").reshape(
                    r.fh, r.fw)
                mb = bytes(r.mask)
                region = canvas[r.dy:r.dy + r.fh, r.dx:r.dx + r.fw]
                if not mb:
                    region[:, :] = vals
                else:
                    valid = np.unpackbits(
                        np.frombuffer(mb, dtype=np.uint8),
                        count=r.fh * r.fw).reshape(r.fh, r.fw).astype(bool)
                    region[valid] = vals[valid]
            planes.append(canvas)
        out = np.dstack(planes) if len(planes) > 1 else planes[0]
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            out = np.clip(np.round(out), info.min, info.max)
        arr = out.astype(dt)
        return pd.DataFrame([{
            "image_id": os.path.splitext(os.path.basename(vrt))[0],
            "bytes": codecs.encode_raw(arr),
            "w": W, "h": H, "fmt": "raw",
            "gt0": gt[0], "gt1": gt[1], "gt2": gt[2],
            "gt3": gt[3], "gt4": gt[4], "gt5": gt[5],
            "srid": srid, "nodata": nodata,
        }])

    # a VRT whose every source clipped away entirely produces no group
    # and therefore no row (the reference reads such a dataset as an
    # all-zero canvas; callers wanting that degenerate row can
    # materialize_vrt() it driver-side — it costs no source reads)
    composed = frags.groupBy("vrt").applyInPandas(compose, schema=OUT_SCHEMA)
    if not warped:
        return composed

    # warped VRTs: the whole source raster is one task's input (the warp
    # kernel needs the full grid), so fan out exactly one task per file
    wdescs = {p: d for p, d in warped}
    wb = spark.sparkContext.broadcast(wdescs)
    wplan = spark.createDataFrame(
        [(p,) for p, _ in warped], "vrt string",
    ).repartition(len(warped))

    def run_warp(batches):
        for pdf in batches:
            out = []
            for p in pdf["vrt"]:
                desc = wb.value[p]
                arr, gt, srid, nodata = _materialize_warped(desc)
                out.append({
                    "image_id": os.path.splitext(os.path.basename(p))[0],
                    "bytes": codecs.encode_raw(arr),
                    "w": desc["w"], "h": desc["h"], "fmt": "raw",
                    "gt0": gt[0], "gt1": gt[1], "gt2": gt[2],
                    "gt3": gt[3], "gt4": gt[4], "gt5": gt[5],
                    "srid": srid, "nodata": nodata,
                })
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt",
                              "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
                              "srid", "nodata"])

    warped_df = wplan.mapInPandas(run_warp, schema=OUT_SCHEMA)
    if not plan_rows:
        return warped_df
    return composed.unionByName(warped_df)


def write_vrt(df, vrt_path: str, src_dir: str | None = None,
              ext: str = "tif", filename_col: str | None = None,
              nbands: int | None = None, dtype=None,
              resolution: str = "highest",
              target_res: tuple[float, float] | None = None,
              relative: bool = True, separate: bool = False) -> str:
    """gdalbuildvrt analog emitting the LAZY artifact: place every row of
    an images-table DataFrame onto the union grid as one SimpleSource per
    band (``apps/gdalbuildvrt_lib.cpp`` semantics: union extent,
    resolution highest|lowest|average|user, later rows paint over earlier
    where valid — document order here is image_id order, the engine's
    deterministic equivalent of command-line order). Only georef COLUMNS
    are collected; pixels never move. Files are assumed at
    ``{src_dir}/{image_id}.{ext}`` (the ``write_gtiff``/``write_aaigrid``
    layout) unless ``filename_col`` names a column carrying paths.

    ``separate=True`` is gdalbuildvrt -separate (gdalbuildvrt_lib.cpp
    SEPARATE mode): each input becomes its OWN output band (band i =
    i-th image in image_id order, reading the input's first band)
    instead of painting a mosaic — the band-stack artifact used to fuse
    per-epoch / per-sensor rasters into one dataset. The distributed
    scan composes it like any multi-band VRT (channel count = input
    count; keep it within the raw codec's channel budget).

    ``nbands``/``dtype`` default from decoding ONE row's bytes
    driver-side (a single small fetch); pass them to avoid it."""
    from ..operators.mosaic import mosaic_grid

    gt, W, H, srid = mosaic_grid(df, resolution, target_res)
    minx, rx, _, maxy, _, ngy = gt
    ry = -ngy
    cols = ["image_id", "w", "h", "gt0", "gt1", "gt3", "gt5"]
    if filename_col:
        cols.append(filename_col)
    has_nodata = "nodata" in df.columns
    if has_nodata:
        cols.append("nodata")
    rows = df.select(*cols).orderBy("image_id").collect()
    if dtype is None or (nbands is None and not separate):
        one = df.select("bytes", "fmt").limit(1).collect()[0]
        a = np.asarray(codecs.decode_image(bytes(one.bytes), one.fmt))
        if nbands is None and not separate:
            nbands = a.shape[2] if a.ndim == 3 else 1
        if dtype is None:
            dtype = a.dtype
    if separate:
        nbands = len(rows)
    dt_name = _DTYPE_NAMES.get(np.dtype(dtype))
    if dt_name is None:
        raise ValueError(f"no VRT dataType for dtype {dtype}")
    vrt_path = local_path(vrt_path)
    base = os.path.dirname(os.path.abspath(vrt_path))
    lines = [f'<VRTDataset rasterXSize="{W}" rasterYSize="{H}">']
    if srid:
        lines.append(f"  <SRS>EPSG:{srid}</SRS>")
    lines.append(
        "  <GeoTransform>" + ", ".join(repr(float(v)) for v in gt)
        + "</GeoTransform>"
    )
    for b in range(1, nbands + 1):
        lines.append(f'  <VRTRasterBand dataType="{dt_name}" band="{b}">')
        for r in ([rows[b - 1]] if separate else rows):
            if filename_col:
                fn = getattr(r, filename_col)
            else:
                fn = os.path.join(src_dir or base, f"{r.image_id}.{ext}")
            fn = os.path.abspath(local_path(fn))
            rel = relative and os.path.dirname(fn) == base
            shown = os.path.basename(fn) if rel else fn
            dx = int(round((r.gt0 - minx) / rx))
            dy = int(round((maxy - r.gt3) / ry))
            dxs = max(1, int(round(r.w * r.gt1 / rx)))
            dys = max(1, int(round(r.h * (-r.gt5) / ry)))
            nd = (r.nodata if has_nodata and r.nodata is not None
                  and not pd.isna(r.nodata) else None)
            tag = "ComplexSource" if nd is not None else "SimpleSource"
            lines.append(f"    <{tag}>")
            lines.append(
                f'      <SourceFilename relativeToVRT="{int(rel)}">'
                f"{escape(shown)}</SourceFilename>"
            )
            lines.append(
                f"      <SourceBand>{1 if separate else b}</SourceBand>")
            lines.append(
                f'      <SrcRect xOff="0" yOff="0" xSize="{r.w}" '
                f'ySize="{r.h}"/>'
            )
            lines.append(
                f'      <DstRect xOff="{dx}" yOff="{dy}" xSize="{dxs}" '
                f'ySize="{dys}"/>'
            )
            if nd is not None:
                lines.append(f"      <NODATA>{float(nd)!r}</NODATA>")
            lines.append(f"    </{tag}>")
        lines.append("  </VRTRasterBand>")
    lines.append("</VRTDataset>")
    xml = "\n".join(lines) + "\n"
    with open(vrt_path, "w") as f:
        f.write(xml)
    return vrt_path
