"""GeoTIFF driver — the de-facto standard geospatial raster container.

Reference driver: frmts/gtiff/gtiffdataset.cpp (semantics only; this is a
from-scratch implementation of the published TIFF 6.0 + GeoTIFF 1.1
specifications, not a libtiff port). Supported subset, per the round-4
review's scoping:

- classic TIFF (``II``/``MM``, magic 42), first IFD = the main image
  (later IFDs — overviews — and SubIFDs are ignored, like the
  reference's default Open of a multi-dir file);
- striped (RowsPerStrip) AND tiled (TileWidth/TileLength) layouts, with
  SHORT- or LONG-typed offset/bytecount arrays;
- PlanarConfiguration 1 (chunky) and 2 (band-separate);
- Compression 1 (none), 5 (LZW, MSB-first with early change), 8/32946
  (Deflate), 32773 (PackBits); horizontal differencing Predictor 2;
- BitsPerSample 8/16/32/64 with SampleFormat uint/int/float;
- geotransform from ModelTransformationTag (34264) else
  ModelPixelScaleTag (33550) + ModelTiepointTag (33922);
- SRID from the GeoKeyDirectory (34735): ProjectedCSTypeGeoKey 3072 for
  model-type 1, GeographicTypeGeoKey 2048 for model-type 2
  (user-defined 32767 -> 0);
- nodata from the GDAL_NODATA ASCII tag (42113).

Conformance is pinned against reference autotest DATA bytes (see
tests/data/README.md): ``byte.tif`` (GDAL checksum 4672, EPSG 26711),
``bug4468.tif`` (Deflate + predictor 2, band-1 checksum 2923),
``tiff_with_subifds.tif`` (LZW tiled, band-1 checksum 35731),
``small_world.tif`` (planar RGB), big-endian SHORT-offset strips.

Spark shape: a TIFF file is self-contained (its IFD governs the bytes),
so the unit of parallelism is the FILE — :func:`scan_gtiff` fans a glob
out one-task-per-file over the binaryFile source into standard
images-table rows (pixels re-encoded in the engine's GSRW container,
georef as gt0..gt5 + srid columns), after which every raster operator
(warp, tile, contour, DEM, zonal...) applies unchanged. The sink
(:func:`write_gtiff`) is file-per-row, written BY THE TASK that holds
the row — a distributed many-files sink with no driver funnel.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pandas as pd

from ._util import local_path
from .. import codecs

OUT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
    "gt5 double, srid int, nodata double"
)

# TIFF field types -> (struct letter, byte size)
_TYPES = {
    1: ("B", 1),   # BYTE
    2: ("s", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    6: ("b", 1),   # SBYTE
    8: ("h", 2),   # SSHORT
    9: ("i", 4),   # SLONG
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
}

_T_IMAGE_WIDTH = 256
_T_IMAGE_LENGTH = 257
_T_BITS_PER_SAMPLE = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTE_COUNTS = 279
_T_PLANAR_CONFIG = 284
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_BYTE_COUNTS = 325
_T_SAMPLE_FORMAT = 339
_T_MODEL_PIXEL_SCALE = 33550
_T_MODEL_TIEPOINT = 33922
_T_MODEL_TRANSFORMATION = 34264
_T_GEO_KEY_DIRECTORY = 34735
_T_GEO_DOUBLE_PARAMS = 34736
_T_GEO_ASCII_PARAMS = 34737
_T_GDAL_NODATA = 42113

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_DEFLATE = 8
_COMP_DEFLATE_OLD = 32946
_COMP_PACKBITS = 32773

# GeoKey ids
_GK_MODEL_TYPE = 1024
_GK_RASTER_TYPE = 1025
_GK_GEOGRAPHIC_TYPE = 2048
_GK_PROJECTED_CS_TYPE = 3072


# ---------------------------------------------------------------------------
# codecs: TIFF LZW (MSB-first, early change) and PackBits
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): codes packed MSB-first, initial
    9-bit width, ClearCode 256 / EOI 257, and the libtiff "early change"
    — the code width grows when the table reaches 2**width - 1 (one
    entry EARLY relative to vanilla LZW)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 257:  # EOI
            return bytes(out)
        if code == 256:  # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table ({len(table)})")
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """Inverse of :func:`lzw_decode` (same early-change discipline)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # leading Clear, as libtiff writes
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # width bump mirrors the decoder's early-change rule EXACTLY:
        # the decoder's table lags the encoder's by one entry (it learns
        # an entry only on the NEXT code), so the encoder bumps when its
        # next_code passes 2**width, which is the moment the decoder's
        # table reaches 2**width - 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table full -> Clear
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes, expected: int | None = None) -> bytes:
    """TIFF 6.0 §9 PackBits: n in [0,127] -> copy n+1 literals; n in
    [-127,-1] -> repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and (expected is None or len(out) < expected):
        c = data[i]
        i += 1
        if c < 128:
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            out += data[i:i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Run-length PackBits encoder (runs >= 3 bytes become repeats)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure run at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal stretch: until a >=3 run starts (or 128 cap)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def _read_ifd(buf: bytes, bo: str, off: int) -> dict:
    (n,) = struct.unpack_from(bo + "H", buf, off)
    tags = {}
    for k in range(n):
        base = off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, base)
        if typ not in _TYPES:
            continue
        letter, size = _TYPES[typ]
        total = cnt * size
        voff = base + 8 if total <= 4 else struct.unpack_from(bo + "I", buf, base + 8)[0]
        if typ == 2:
            raw = buf[voff:voff + cnt]
            tags[tag] = raw.split(b"\x00")[0].decode("latin-1")
        else:
            tags[tag] = list(struct.unpack_from(bo + str(cnt) + letter, buf, voff))
    return tags


def _dtype_for(bits: int, sfmt: int, bo: str):
    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt, "u")
    if kind == "f" and bits not in (32, 64):
        raise ValueError(f"float sample with {bits} bits unsupported")
    if bits not in (8, 16, 32, 64):
        raise ValueError(f"BitsPerSample {bits} unsupported (8/16/32/64)")
    return np.dtype(f"{bo}{kind}{bits // 8}")


def _depredict(block: np.ndarray) -> np.ndarray:
    """Predictor 2 (horizontal differencing) inverse: cumulative sum
    along the row per sample, wrapping in the sample dtype."""
    return np.cumsum(block, axis=1, dtype=np.int64).astype(block.dtype)


def parse_gtiff(buf: bytes):
    """TIFF bytes -> (array (h, w) or (h, w, c), geotransform tuple,
    srid int, nodata float|None). First IFD only."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (no II/MM byte-order mark)")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic == 43:
        raise ValueError("BigTIFF (magic 43) not supported; classic only")
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    tags = _read_ifd(buf, bo, ifd_off)

    w = int(tags[_T_IMAGE_WIDTH][0])
    h = int(tags[_T_IMAGE_LENGTH][0])
    spp = int(tags.get(_T_SAMPLES_PER_PIXEL, [1])[0])
    bits_l = tags.get(_T_BITS_PER_SAMPLE, [1])
    if len(set(bits_l)) != 1:
        raise ValueError(f"heterogeneous BitsPerSample {bits_l} unsupported")
    bits = int(bits_l[0])
    comp = int(tags.get(_T_COMPRESSION, [1])[0])
    planar = int(tags.get(_T_PLANAR_CONFIG, [1])[0])
    pred = int(tags.get(_T_PREDICTOR, [1])[0])
    sfmt = int(tags.get(_T_SAMPLE_FORMAT, [1])[0])
    dtype = _dtype_for(bits, sfmt, bo)
    bpp = dtype.itemsize

    tiled = _T_TILE_OFFSETS in tags
    if tiled:
        bw = int(tags[_T_TILE_WIDTH][0])
        bh = int(tags[_T_TILE_LENGTH][0])
        offsets = tags[_T_TILE_OFFSETS]
        counts = tags.get(_T_TILE_BYTE_COUNTS)
    else:
        bw = w
        bh = int(tags.get(_T_ROWS_PER_STRIP, [h])[0])
        bh = min(bh, h)
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags.get(_T_STRIP_BYTE_COUNTS)
    if counts is None:
        raise ValueError("missing Strip/TileByteCounts")

    across = (w + bw - 1) // bw
    down = (h + bh - 1) // bh
    per_plane = across * down
    nplanes = spp if planar == 2 else 1
    chans = 1 if planar == 2 else spp
    if len(offsets) < per_plane * nplanes:
        raise ValueError(
            f"{len(offsets)} blocks < expected {per_plane * nplanes}"
        )

    out = np.zeros((h, w, spp), dtype=dtype.newbyteorder("="))
    for plane in range(nplanes):
        for bi in range(per_plane):
            o = int(offsets[plane * per_plane + bi])
            c = int(counts[plane * per_plane + bi])
            if o == 0 and c == 0:
                continue  # sparse block -> stays zero
            raw = buf[o:o + c]
            if comp in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
                raw = zlib.decompress(raw)
            elif comp == _COMP_LZW:
                raw = lzw_decode(raw)
            elif comp == _COMP_PACKBITS:
                raw = packbits_decode(raw)
            elif comp != _COMP_NONE:
                raise ValueError(f"compression {comp} unsupported "
                                 "(none/LZW/Deflate/PackBits)")
            ty, tx = (bi // across) * bh, (bi % across) * bw
            rows = min(bh, h - ty)
            cols = min(bw, w - tx)
            # tiles are always full-size in the file; strips may be short
            frows = bh if tiled else rows
            want = frows * bw * chans * bpp
            if len(raw) < want:
                raw = raw + b"\x00" * (want - len(raw))
            block = np.frombuffer(raw[:want], dtype=dtype).reshape(
                frows, bw, chans
            )
            if pred == 2:
                block = _depredict(block)
            if plane == 0 and nplanes == 1:
                out[ty:ty + rows, tx:tx + cols, :] = block[:rows, :cols, :]
            else:
                out[ty:ty + rows, tx:tx + cols, plane] = block[:rows, :cols, 0]

    arr = out[:, :, 0] if spp == 1 else out

    # --- georeferencing ---
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    if _T_MODEL_TRANSFORMATION in tags:
        t = tags[_T_MODEL_TRANSFORMATION]
        gt = (float(t[3]), float(t[0]), float(t[1]),
              float(t[7]), float(t[4]), float(t[5]))
    elif _T_MODEL_PIXEL_SCALE in tags and _T_MODEL_TIEPOINT in tags:
        sx, sy = tags[_T_MODEL_PIXEL_SCALE][:2]
        i, j, _k, x, y, _z = tags[_T_MODEL_TIEPOINT][:6]
        gt = (float(x) - float(i) * float(sx), float(sx), 0.0,
              float(y) + float(j) * float(sy), 0.0, -float(sy))

    srid = 0
    if _T_GEO_KEY_DIRECTORY in tags:
        gk = tags[_T_GEO_KEY_DIRECTORY]
        keys = {}
        for k in range(4, len(gk) - 3, 4):
            kid, loc, cnt, val = gk[k:k + 4]
            if loc == 0:
                keys[int(kid)] = int(val)
        model = keys.get(_GK_MODEL_TYPE, 0)
        code = 0
        if model == 1:
            code = keys.get(_GK_PROJECTED_CS_TYPE, 0)
        elif model == 2:
            code = keys.get(_GK_GEOGRAPHIC_TYPE, 0)
        srid = 0 if code in (0, 32767) else code

    nodata = None
    nd = tags.get(_T_GDAL_NODATA)
    if nd:
        try:
            nodata = float(str(nd).strip())
        except ValueError:
            pass
    return arr, gt, srid, nodata


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

_W_COMP = {"none": _COMP_NONE, "deflate": _COMP_DEFLATE,
           "lzw": _COMP_LZW, "packbits": _COMP_PACKBITS}


def format_gtiff(arr: np.ndarray, gt, srid: int = 0,
                 nodata: float | None = None, compression: str = "deflate",
                 predictor: bool = False, tile_size: int | None = None) -> bytes:
    """array (+ georef) -> classic little-endian GeoTIFF bytes: single
    IFD, chunky planar, strips (~64 KiB each, libtiff-style) or
    ``tile_size``-square tiles, Deflate by default. ``predictor`` turns
    on horizontal differencing (integer dtypes only)."""
    a = np.ascontiguousarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    dt = a.dtype
    if dt.kind not in "uif" or dt.itemsize not in (1, 2, 4, 8):
        raise ValueError(f"dtype {dt} unsupported")
    sfmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    if predictor and dt.kind == "f":
        raise ValueError("predictor=2 is for integer samples")
    a = a.astype(dt.newbyteorder("<"), copy=False)
    comp = _W_COMP[compression]
    bpp = dt.itemsize

    def pack_block(block: np.ndarray) -> bytes:
        if predictor:
            block = np.concatenate(
                [block[:, :1, :],
                 (block[:, 1:, :].astype(np.int64)
                  - block[:, :-1, :].astype(np.int64)).astype(block.dtype)],
                axis=1,
            )
        raw = block.tobytes()
        if comp == _COMP_DEFLATE:
            return zlib.compress(raw, 6)
        if comp == _COMP_LZW:
            return lzw_encode(raw)
        if comp == _COMP_PACKBITS:
            return packbits_encode(raw)
        return raw

    blocks: list[bytes] = []
    if tile_size:
        bw = bh = int(tile_size)
        if bw % 16:
            raise ValueError("TIFF tile size must be a multiple of 16")
        for ty in range(0, h, bh):
            for tx in range(0, w, bw):
                t = np.zeros((bh, bw, spp), dtype=a.dtype)
                sub = a[ty:ty + bh, tx:tx + bw, :]
                t[:sub.shape[0], :sub.shape[1], :] = sub
                blocks.append(pack_block(t))
    else:
        bw = w
        rps = max(1, 65536 // max(1, w * spp * bpp))
        bh = min(rps, h)
        for ty in range(0, h, bh):
            blocks.append(pack_block(a[ty:ty + bh, :, :]))

    # --- assemble tags (ascending id, as TIFF requires) ---
    entries: list[tuple[int, int, int, list]] = []  # (tag, type, count, vals)

    def add(tag, typ, vals):
        entries.append((tag, typ, len(vals), list(vals)))

    add(_T_IMAGE_WIDTH, 3, [w])
    add(_T_IMAGE_LENGTH, 3, [h])
    add(_T_BITS_PER_SAMPLE, 3, [bpp * 8] * spp)
    add(_T_COMPRESSION, 3, [comp])
    add(_T_PHOTOMETRIC, 3, [2 if spp >= 3 else 1])
    add(_T_SAMPLES_PER_PIXEL, 3, [spp])
    if not tile_size:
        add(_T_ROWS_PER_STRIP, 3 if bh < 65536 else 4, [bh])
    add(_T_PLANAR_CONFIG, 3, [1])
    if predictor:
        add(_T_PREDICTOR, 3, [2])
    if tile_size:
        add(_T_TILE_WIDTH, 3, [bw])
        add(_T_TILE_LENGTH, 3, [bh])
    add(_T_SAMPLE_FORMAT, 3, [sfmt] * spp)
    if gt is not None:
        if gt[2] or gt[4]:
            add(_T_MODEL_TRANSFORMATION, 12,
                [gt[1], gt[2], 0.0, gt[0], gt[4], gt[5], 0.0, gt[3],
                 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
        else:
            add(_T_MODEL_PIXEL_SCALE, 12, [gt[1], -gt[5], 0.0])
            add(_T_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])
    if srid:
        from .geoparquet import _GEOGRAPHIC_EPSG

        geographic = int(srid) in _GEOGRAPHIC_EPSG
        gk = [1, 1, 0, 3,
              _GK_MODEL_TYPE, 0, 1, (2 if geographic else 1),
              _GK_RASTER_TYPE, 0, 1, 1]
        gk += ([_GK_GEOGRAPHIC_TYPE, 0, 1, int(srid)] if geographic
               else [_GK_PROJECTED_CS_TYPE, 0, 1, int(srid)])
        add(_T_GEO_KEY_DIRECTORY, 3, gk)
    if nodata is not None:
        s = (f"{nodata:.17g}\x00").encode("ascii")
        entries.append((_T_GDAL_NODATA, 2, len(s), [s]))

    off_tag = _T_TILE_OFFSETS if tile_size else _T_STRIP_OFFSETS
    cnt_tag = _T_TILE_BYTE_COUNTS if tile_size else _T_STRIP_BYTE_COUNTS
    add(off_tag, 4, [0] * len(blocks))  # placeholder, patched below
    add(cnt_tag, 4, [len(b) for b in blocks])
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4  # overflow area starts here
    overflow = bytearray()
    fixed = []
    for tag, typ, cnt, vals in entries:
        letter, size = _TYPES[typ]
        if typ == 2:
            payload = vals[0]
        else:
            payload = struct.pack("<" + str(cnt) + letter, *vals)
        if len(payload) <= 4:
            fixed.append((tag, typ, cnt, payload.ljust(4, b"\x00"), None))
        else:
            fixed.append((tag, typ, cnt, None, len(overflow)))
            overflow += payload
            if len(overflow) % 2:
                overflow += b"\x00"
    pix_off = data_off + len(overflow)
    # patch block offsets now that the layout is known
    offs = []
    cur = pix_off
    for b in blocks:
        offs.append(cur)
        cur += len(b)
    for i, (tag, typ, cnt, inline, ovf) in enumerate(fixed):
        if tag == off_tag:
            payload = struct.pack("<" + str(cnt) + "I", *offs)
            if len(payload) <= 4:
                fixed[i] = (tag, typ, cnt, payload.ljust(4, b"\x00"), None)
            else:
                overflow[ovf:ovf + len(payload)] = payload

    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n)
    for tag, typ, cnt, inline, ovf in fixed:
        out += struct.pack("<HHI", tag, typ, cnt)
        out += inline if inline is not None else struct.pack("<I", data_off + ovf)
    out += struct.pack("<I", 0)  # no next IFD
    out += overflow
    for b in blocks:
        out += b
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def scan_gtiff(spark, path_glob: str):
    """Glob of .tif files -> images-table rows (one task per file)."""

    def parse(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr, gt, srid, nodata = parse_gtiff(bytes(r.content))
                # GSRW carries u8/u16/i16/i32/f32/f64; widen the rest
                if np.dtype(arr.dtype) not in codecs._DTYPE_CODES:
                    arr = arr.astype(
                        np.float64 if arr.dtype.kind in "uif" else arr.dtype
                    )
                rows.append({
                    "image_id": os.path.splitext(os.path.basename(r.path))[0],
                    "bytes": codecs.encode_raw(arr),
                    "w": arr.shape[1], "h": arr.shape[0], "fmt": "raw",
                    "gt0": gt[0], "gt1": gt[1], "gt2": gt[2],
                    "gt3": gt[3], "gt4": gt[4], "gt5": gt[5],
                    "srid": srid, "nodata": nodata,
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


def write_gtiff(df, out_dir: str, compression: str = "deflate",
                predictor: bool = False, tile_size: int | None = None):
    """One .tif per row, written by the task that holds the row (the
    same distributed many-files layout as the AAIGrid sink)."""
    out_dir = local_path(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    has_nodata = "nodata" in df.columns
    has_srid = "srid" in df.columns

    def dump(batches):
        for pdf in batches:
            names = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                gt = tuple(float(getattr(r, f"gt{i}")) for i in range(6))
                nd = (float(r.nodata) if has_nodata and r.nodata is not None
                      and not pd.isna(r.nodata) else None)
                srid = int(r.srid) if has_srid and r.srid is not None else 0
                path = os.path.join(out_dir, f"{r.image_id}.tif")
                with open(path, "wb") as f:
                    f.write(format_gtiff(
                        arr, gt, srid=srid, nodata=nd,
                        compression=compression, predictor=predictor,
                        tile_size=tile_size,
                    ))
                names.append(path)
            yield pd.DataFrame({"path": names})

    return [
        r.path
        for r in df.mapInPandas(dump, schema="path string").collect()
    ]
