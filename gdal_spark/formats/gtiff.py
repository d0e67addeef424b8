"""GeoTIFF driver — the de-facto standard geospatial raster container.

Reference driver: frmts/gtiff/gtiffdataset.cpp (semantics only; this is a
from-scratch implementation of the published TIFF 6.0 + GeoTIFF 1.1
specifications, not a libtiff port). Supported subset, per the round-4
review's scoping:

- classic TIFF (``II``/``MM``, magic 42) AND BigTIFF (magic 43 —
  8-byte offsets, 20-byte IFD entries, LONG8/SLONG8/IFD8 types; the
  container every real >4 GB COG ships in), first IFD = the main image
  (later IFDs — overviews — and SubIFDs are ignored, like the
  reference's default Open of a multi-dir file);
- striped (RowsPerStrip) AND tiled (TileWidth/TileLength) layouts, with
  SHORT- or LONG-typed offset/bytecount arrays;
- PlanarConfiguration 1 (chunky) and 2 (band-separate);
- Compression 1 (none), 5 (LZW, MSB-first with early change), 7
  (new-style JPEG per TIFF TechNote 2, incl. the shared JPEGTables
  tag, through the engine's own T.81 codec — old-style 6 rejected
  with a clear error, like modern libtiff), 8/32946 (Deflate), 32773
  (PackBits); horizontal differencing Predictor 2;
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

Cloud-Optimized-GeoTIFF posture (the 100-TB path): one-task-per-file
caps the file size an executor can hold, so :func:`scan_gtiff_windowed`
reads a SINGLE huge GeoTIFF distributed — the driver parses only the
IFD chain with targeted seeks (:func:`read_ifd_chain`: header + tag
values, never pixel blocks — exactly the bytes a COG reader range-
requests), groups block-rows into ~``target_bytes`` row-band windows
from the per-block byte counts (:func:`plan_gtiff_windows`), and each
task seeks/reads/decodes ONLY its own windows' blocks
(:func:`read_gtiff_window`). Reduced-resolution IFDs in the chain
(NewSubfileType bit 1 — the COG overview layout, ref
frmts/gtiff/cogdriver.cpp semantics) are exposed as levels, and
:func:`format_gtiff` can WRITE them (``overviews=[2,4,...]``, 2x2
average like the reference's default overview resampling), so the
engine round-trips the COG layout it scans.
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
    7: ("B", 1),   # UNDEFINED (raw bytes — e.g. JPEGTables)
    8: ("h", 2),   # SSHORT
    9: ("i", 4),   # SLONG
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
    16: ("Q", 8),  # LONG8 (BigTIFF)
    17: ("q", 8),  # SLONG8 (BigTIFF)
    18: ("Q", 8),  # IFD8 (BigTIFF)
}

_T_NEW_SUBFILE_TYPE = 254
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
_T_JPEG_TABLES = 347
_T_YCBCR_SUBSAMPLING = 530
_T_MODEL_PIXEL_SCALE = 33550
_T_MODEL_TIEPOINT = 33922
_T_MODEL_TRANSFORMATION = 34264
_T_GEO_KEY_DIRECTORY = 34735
_T_GEO_DOUBLE_PARAMS = 34736
_T_GEO_ASCII_PARAMS = 34737
_T_GDAL_NODATA = 42113

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_JPEG_OLD = 6
_COMP_JPEG = 7
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


def _read_ifd_fh(f, bo: str, off: int, big: bool = False) -> tuple[dict, int]:
    """Parse ONE IFD from a seekable file object with targeted reads:
    the entry block, then each out-of-line tag value. Returns
    (tags, next_ifd_offset). Never touches pixel blocks — over an
    object store this is exactly the byte set a COG reader fetches.

    Classic layout: SHORT entry count, 12-byte entries (value field 4
    bytes), LONG next pointer. BigTIFF: LONG8 count, 20-byte entries
    (value field 8 bytes), LONG8 next pointer (TIFF 6.0 §2 / BigTIFF
    spec; ref frmts/gtiff semantics via libtiff's TIFFReadDirectory)."""
    esz, inl = (20, 8) if big else (12, 4)
    f.seek(off)
    if big:
        (n,) = struct.unpack(bo + "Q", f.read(8))
    else:
        (n,) = struct.unpack(bo + "H", f.read(2))
    if n > 65535:
        raise ValueError(f"implausible IFD entry count {n}")
    ent = f.read(esz * n + inl)
    (nxt,) = struct.unpack_from(bo + ("Q" if big else "I"), ent, esz * n)
    pending = []  # (tag, typ, cnt, voff) out-of-line values
    tags: dict = {}
    for k in range(n):
        if big:
            tag, typ = struct.unpack_from(bo + "HH", ent, esz * k)
            (cnt,) = struct.unpack_from(bo + "Q", ent, esz * k + 4)
        else:
            tag, typ, cnt = struct.unpack_from(bo + "HHI", ent, esz * k)
        if typ not in _TYPES:
            continue
        letter, size = _TYPES[typ]
        total = cnt * size
        vpos = esz * k + (12 if big else 8)
        if total <= inl:
            raw = ent[vpos:vpos + total]
            if typ == 2:
                tags[tag] = raw.split(b"\x00")[0].decode("latin-1")
            elif typ == 7:
                tags[tag] = raw
            else:
                tags[tag] = list(struct.unpack(bo + str(cnt) + letter, raw))
        else:
            (voff,) = struct.unpack_from(bo + ("Q" if big else "I"),
                                         ent, vpos)
            pending.append((tag, typ, cnt, voff))
    for tag, typ, cnt, voff in sorted(pending, key=lambda p: p[3]):
        letter, size = _TYPES[typ]
        f.seek(voff)
        raw = f.read(cnt * size)
        if typ == 2:
            tags[tag] = raw.split(b"\x00")[0].decode("latin-1")
        elif typ == 7:
            tags[tag] = raw
        else:
            tags[tag] = list(struct.unpack(bo + str(cnt) + letter, raw))
    return tags, int(nxt)


def _open_tiff(f) -> tuple[str, bool]:
    """Check the byte-order mark + magic; return (struct prefix,
    is_bigtiff). BigTIFF (magic 43) additionally carries the offset
    byte-size (must be 8) and a zero pad word before the first-IFD
    LONG8 offset."""
    f.seek(0)
    head = f.read(8)
    if head[:2] == b"II":
        bo = "<"
    elif head[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (no II/MM byte-order mark)")
    (magic,) = struct.unpack_from(bo + "H", head, 2)
    if magic == 42:
        return bo, False
    if magic == 43:
        osize, pad = struct.unpack_from(bo + "HH", head, 4)
        if osize != 8 or pad != 0:
            raise ValueError(f"BigTIFF with offset size {osize}/pad {pad}")
        return bo, True
    raise ValueError(f"bad TIFF magic {magic}")


def _first_ifd_offset(f, bo: str, big: bool) -> int:
    if big:
        f.seek(8)
        (off,) = struct.unpack(bo + "Q", f.read(8))
    else:
        f.seek(4)
        (off,) = struct.unpack(bo + "I", f.read(4))
    return int(off)


def read_ifd_chain(f) -> tuple[str, list[dict]]:
    """Walk the whole IFD chain (main image + COG-style overview
    directories) with header-byte reads only, classic or BigTIFF.
    Returns (byte-order prefix, [tags per IFD])."""
    bo, big = _open_tiff(f)
    off = _first_ifd_offset(f, bo, big)
    chain = []
    seen = set()
    while off and off not in seen and len(chain) < 64:
        seen.add(off)
        tags, off = _read_ifd_fh(f, bo, off, big)
        chain.append(tags)
    return bo, chain


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


def _level_from_tags(tags: dict, bo: str) -> dict:
    """Extract one IFD's decode parameters + block index (offsets /
    byte counts) into a plain dict — everything a task needs to decode
    any block of this level without re-reading the header."""
    w = int(tags[_T_IMAGE_WIDTH][0])
    h = int(tags[_T_IMAGE_LENGTH][0])
    spp = int(tags.get(_T_SAMPLES_PER_PIXEL, [1])[0])
    bits_l = tags.get(_T_BITS_PER_SAMPLE, [1])
    if len(set(bits_l)) != 1:
        raise ValueError(f"heterogeneous BitsPerSample {bits_l} unsupported")
    bits = int(bits_l[0])
    comp = int(tags.get(_T_COMPRESSION, [1])[0])
    if comp == _COMP_JPEG_OLD:
        raise ValueError(
            "old-style JPEG (compression 6) unsupported — re-write with "
            "new-style JPEG (7), like the reference driver recommends"
        )
    if comp not in (_COMP_NONE, _COMP_LZW, _COMP_DEFLATE,
                    _COMP_DEFLATE_OLD, _COMP_PACKBITS, _COMP_JPEG):
        raise ValueError(f"compression {comp} unsupported "
                         "(none/LZW/Deflate/PackBits/JPEG)")
    planar = int(tags.get(_T_PLANAR_CONFIG, [1])[0])
    pred = int(tags.get(_T_PREDICTOR, [1])[0])
    sfmt = int(tags.get(_T_SAMPLE_FORMAT, [1])[0])
    _dtype_for(bits, sfmt, bo)  # validate early
    jtab = None
    if comp == _COMP_JPEG:
        if bits != 8 or sfmt != 1:
            raise ValueError("JPEG-in-TIFF requires uint8 samples")
        if planar != 1:
            raise ValueError("JPEG-in-TIFF with planar config 2 "
                             "unsupported")
        jt = tags.get(_T_JPEG_TABLES)
        if jt:
            # JSON-safe (the windowed-scan plan ships the level dict
            # as JSON): base64-encode the tables stream
            import base64

            jtab = base64.b64encode(bytes(jt)).decode("ascii")
    tiled = _T_TILE_OFFSETS in tags
    if tiled:
        bw = int(tags[_T_TILE_WIDTH][0])
        bh = int(tags[_T_TILE_LENGTH][0])
        offsets = tags[_T_TILE_OFFSETS]
        counts = tags.get(_T_TILE_BYTE_COUNTS)
    else:
        bw = w
        bh = min(int(tags.get(_T_ROWS_PER_STRIP, [h])[0]), h)
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags.get(_T_STRIP_BYTE_COUNTS)
    if counts is None:
        raise ValueError("missing Strip/TileByteCounts")
    across = (w + bw - 1) // bw
    down = (h + bh - 1) // bh
    per_plane = across * down
    nplanes = spp if planar == 2 else 1
    if len(offsets) < per_plane * nplanes:
        raise ValueError(
            f"{len(offsets)} blocks < expected {per_plane * nplanes}"
        )
    return {
        "bo": bo, "w": w, "h": h, "spp": spp, "bits": bits, "sfmt": sfmt,
        "comp": comp, "planar": planar, "pred": pred, "tiled": tiled,
        "bw": bw, "bh": bh, "across": across, "down": down, "jtab": jtab,
        "offsets": [int(o) for o in offsets],
        "counts": [int(c) for c in counts],
    }


def _georef_from_tags(tags: dict):
    """(geotransform, srid, nodata) from the GeoTIFF / GDAL tags."""
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
    return gt, srid, nodata


def _decode_block(raw: bytes, lvl: dict, frows: int) -> np.ndarray:
    """One compressed block -> (frows, bw, chans) array."""
    comp = lvl["comp"]
    if comp == _COMP_JPEG:
        # New-style JPEG (TIFF TechNote 2): each strip/tile is a
        # complete JPEG interchange stream, except that the quant +
        # Huffman tables may live in the shared JPEGTables tag (an
        # abbreviated SOI..tables..EOI stream) — splice them in after
        # the block's SOI so the block decodes standalone
        from ..jpeg import decode_jpeg

        buf = bytes(raw)
        jt64 = lvl.get("jtab")
        if jt64 and buf[:2] == b"\xff\xd8":
            import base64

            jt = base64.b64decode(jt64)
            if jt[:2] == b"\xff\xd8":
                jt = jt[2:]
            if jt[-2:] == b"\xff\xd9":
                jt = jt[:-2]
            buf = b"\xff\xd8" + jt + buf[2:]
        img = decode_jpeg(buf)
        if img.ndim == 2:
            img = img[:, :, None]
        chans = lvl["spp"]
        if img.shape[2] != chans:
            raise ValueError(
                f"JPEG block decoded {img.shape[2]} channels, "
                f"IFD says {chans} samples/pixel"
            )
        block = np.zeros((frows, lvl["bw"], chans), dtype=np.uint8)
        rr = min(frows, img.shape[0])
        cc = min(lvl["bw"], img.shape[1])
        block[:rr, :cc, :] = img[:rr, :cc, :]
        return block
    if comp in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
        raw = zlib.decompress(raw)
    elif comp == _COMP_LZW:
        raw = lzw_decode(raw)
    elif comp == _COMP_PACKBITS:
        raw = packbits_decode(raw)
    dtype = _dtype_for(lvl["bits"], lvl["sfmt"], lvl["bo"])
    chans = 1 if lvl["planar"] == 2 else lvl["spp"]
    want = frows * lvl["bw"] * chans * dtype.itemsize
    if len(raw) < want:
        raw = raw + b"\x00" * (want - len(raw))
    block = np.frombuffer(raw[:want], dtype=dtype).reshape(
        frows, lvl["bw"], chans
    )
    if lvl["pred"] == 2:
        block = _depredict(block)
    return block


def read_gtiff_window(f, lvl: dict, x0: int, y0: int, ww: int, wh: int):
    """Decode exactly the blocks of ``lvl`` intersecting the pixel
    window (x0, y0, ww, wh) from a seekable file object. Bytes touched
    = the window's own compressed blocks — nothing else (the COG
    access pattern; the accounting test pins this with a counting
    file wrapper). Returns (wh, ww[, spp]) array."""
    w, h = lvl["w"], lvl["h"]
    if not (0 <= x0 and 0 <= y0 and x0 + ww <= w and y0 + wh <= h):
        raise ValueError(f"window {(x0, y0, ww, wh)} outside {w}x{h}")
    bw, bh, across = lvl["bw"], lvl["bh"], lvl["across"]
    per_plane = lvl["across"] * lvl["down"]
    spp = lvl["spp"]
    nplanes = spp if lvl["planar"] == 2 else 1
    dtype = _dtype_for(lvl["bits"], lvl["sfmt"], lvl["bo"])
    out = np.zeros((wh, ww, spp), dtype=dtype.newbyteorder("="))
    offsets, counts = lvl["offsets"], lvl["counts"]
    for plane in range(nplanes):
        for by in range(y0 // bh, (y0 + wh - 1) // bh + 1):
            for bx in range(x0 // bw, (x0 + ww - 1) // bw + 1):
                bi = plane * per_plane + by * across + bx
                o, c = offsets[bi], counts[bi]
                ty, tx = by * bh, bx * bw
                rows = min(bh, h - ty)
                cols = min(bw, w - tx)
                if o == 0 and c == 0:
                    continue  # sparse block -> stays zero
                frows = bh if lvl["tiled"] else rows
                f.seek(o)
                block = _decode_block(f.read(c), lvl, frows)
                # intersect block extent with the window
                ry0 = max(ty, y0)
                ry1 = min(ty + rows, y0 + wh)
                rx0 = max(tx, x0)
                rx1 = min(tx + cols, x0 + ww)
                sub = block[ry0 - ty:ry1 - ty, rx0 - tx:rx1 - tx, :]
                if plane == 0 and nplanes == 1:
                    out[ry0 - y0:ry1 - y0, rx0 - x0:rx1 - x0, :] = sub
                else:
                    out[ry0 - y0:ry1 - y0, rx0 - x0:rx1 - x0, plane] = (
                        sub[:, :, 0]
                    )
    return out[:, :, 0] if spp == 1 else out


def gtiff_levels(f) -> tuple[list[dict], tuple, int, float | None]:
    """All usable resolution levels of an open TIFF: level 0 = the
    main image; levels 1+ = chain IFDs that are reduced-resolution
    (NewSubfileType bit 1, the COG overview layout — or, leniently,
    any later directory strictly smaller than the main image; other
    pages are ignored like the reference's default single-dataset
    Open). Georef comes from the main IFD; each overview level gets
    the scaled geotransform."""
    bo, chain = read_ifd_chain(f)
    if not chain:
        raise ValueError("TIFF with no IFD")
    main = _level_from_tags(chain[0], bo)
    gt, srid, nodata = _georef_from_tags(chain[0])
    main["gt"] = gt
    levels = [main]
    for tags in chain[1:]:
        sub = int(tags.get(_T_NEW_SUBFILE_TYPE, [0])[0])
        try:
            lvl = _level_from_tags(tags, bo)
        except (ValueError, KeyError):
            continue
        reduced = (sub & 1) or (
            lvl["w"] < main["w"] and lvl["h"] < main["h"]
        )
        if not reduced:
            continue
        fx = main["w"] / lvl["w"]
        fy = main["h"] / lvl["h"]
        lvl["gt"] = (gt[0], gt[1] * fx, gt[2] * fx,
                     gt[3], gt[4] * fy, gt[5] * fy)
        levels.append(lvl)
    return levels, gt, srid, nodata


def parse_gtiff(buf: bytes):
    """TIFF bytes -> (array (h, w) or (h, w, c), geotransform tuple,
    srid int, nodata float|None). First IFD only."""
    import io

    f = io.BytesIO(buf)
    bo, big = _open_tiff(f)
    ifd_off = _first_ifd_offset(f, bo, big)
    tags, _ = _read_ifd_fh(f, bo, ifd_off, big)
    lvl = _level_from_tags(tags, bo)
    arr = read_gtiff_window(f, lvl, 0, 0, lvl["w"], lvl["h"])
    gt, srid, nodata = _georef_from_tags(tags)
    return arr, gt, srid, nodata


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

_W_COMP = {"none": _COMP_NONE, "deflate": _COMP_DEFLATE,
           "lzw": _COMP_LZW, "packbits": _COMP_PACKBITS,
           "jpeg": _COMP_JPEG}


def _ifd_section(a: np.ndarray, gt, srid: int, nodata: float | None,
                 compression: str, predictor: bool,
                 tile_size: int | None, ifd_off: int,
                 next_ifd: int | None, reduced: bool,
                 big: bool = False, jpeg_quality: int = 75) -> bytes:
    """One complete IFD section (directory + overflow values + pixel
    blocks) laid out to start at absolute offset ``ifd_off``. The
    next-IFD pointer is patched in by the caller via ``next_ifd``
    (``None`` means "unknown yet" and writes 0 — caller must know).
    ``reduced`` marks a COG overview directory (NewSubfileType=1, no
    georef tags — georef lives on the main IFD, as the reference
    writes it). ``big`` lays the directory out in the BigTIFF shape
    (LONG8 count/next pointer, 20-byte entries, LONG8 block offsets)."""
    h, w, spp = a.shape
    dt = a.dtype
    sfmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    a = a.astype(dt.newbyteorder("<"), copy=False)
    comp = _W_COMP[compression]
    bpp = dt.itemsize
    if comp == _COMP_JPEG:
        if dt != np.uint8:
            raise ValueError("JPEG compression requires uint8 samples")
        if spp not in (1, 3):
            raise ValueError(
                f"JPEG compression takes 1 or 3 bands, got {spp} "
                "(drop/flatten extra bands explicitly)"
            )
        if predictor:
            raise ValueError("predictor does not apply to JPEG")

    def pack_block(block: np.ndarray) -> bytes:
        if comp == _COMP_JPEG:
            from ..jpeg import encode_jpeg

            img = block[:, :, 0] if spp == 1 else block
            return encode_jpeg(np.ascontiguousarray(img),
                               quality=jpeg_quality)
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
                sub = a[ty:ty + bh, tx:tx + bw, :]
                if comp == _COMP_JPEG:
                    # edge-replicate the pad area: a hard zero edge
                    # rings (Gibbs) back into the valid pixels of the
                    # DCT blocks that straddle it
                    t = np.pad(sub, ((0, bh - sub.shape[0]),
                                     (0, bw - sub.shape[1]), (0, 0)),
                               mode="edge")
                else:
                    t = np.zeros((bh, bw, spp), dtype=a.dtype)
                    t[:sub.shape[0], :sub.shape[1], :] = sub
                blocks.append(pack_block(t))
    else:
        bw = w
        rps = max(1, 65536 // max(1, w * spp * bpp))
        if comp == _COMP_JPEG:
            # MCU-aligned strips (libtiff rounds RowsPerStrip to the
            # JPEG vertical sampling block — 16 for 4:2:0, 8 for gray)
            mcu = 16 if spp == 3 else 8
            rps = max(mcu, rps // mcu * mcu)
        bh = min(rps, h)
        for ty in range(0, h, bh):
            blocks.append(pack_block(a[ty:ty + bh, :, :]))

    # --- assemble tags (ascending id, as TIFF requires) ---
    entries: list[tuple[int, int, int, list]] = []  # (tag, type, count, vals)

    def add(tag, typ, vals):
        entries.append((tag, typ, len(vals), list(vals)))

    if reduced:
        add(_T_NEW_SUBFILE_TYPE, 4, [1])
    add(_T_IMAGE_WIDTH, 3, [w])
    add(_T_IMAGE_LENGTH, 3, [h])
    add(_T_BITS_PER_SAMPLE, 3, [bpp * 8] * spp)
    add(_T_COMPRESSION, 3, [comp])
    if comp == _COMP_JPEG and spp == 3:
        # the encoder writes 4:2:0 YCbCr streams — say so in the IFD
        add(_T_PHOTOMETRIC, 3, [6])
        add(_T_YCBCR_SUBSAMPLING, 3, [2, 2])
    else:
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
    if gt is not None and not reduced:
        if gt[2] or gt[4]:
            add(_T_MODEL_TRANSFORMATION, 12,
                [gt[1], gt[2], 0.0, gt[0], gt[4], gt[5], 0.0, gt[3],
                 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
        else:
            add(_T_MODEL_PIXEL_SCALE, 12, [gt[1], -gt[5], 0.0])
            add(_T_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])
    if srid and not reduced:
        from .geoparquet import _GEOGRAPHIC_EPSG

        geographic = int(srid) in _GEOGRAPHIC_EPSG
        gk = [1, 1, 0, 3,
              _GK_MODEL_TYPE, 0, 1, (2 if geographic else 1),
              _GK_RASTER_TYPE, 0, 1, 1]
        gk += ([_GK_GEOGRAPHIC_TYPE, 0, 1, int(srid)] if geographic
               else [_GK_PROJECTED_CS_TYPE, 0, 1, int(srid)])
        add(_T_GEO_KEY_DIRECTORY, 3, gk)
    if nodata is not None and not reduced:
        s = (f"{nodata:.17g}\x00").encode("ascii")
        entries.append((_T_GDAL_NODATA, 2, len(s), [s]))

    off_tag = _T_TILE_OFFSETS if tile_size else _T_STRIP_OFFSETS
    cnt_tag = _T_TILE_BYTE_COUNTS if tile_size else _T_STRIP_BYTE_COUNTS
    off_typ = 16 if big else 4  # LONG8 offsets are the point of BigTIFF
    off_letter = "Q" if big else "I"
    add(off_tag, off_typ, [0] * len(blocks))  # placeholder, patched below
    add(cnt_tag, off_typ, [len(b) for b in blocks])
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    esz, inl = (20, 8) if big else (12, 4)
    # overflow area starts after: count field + entries + next pointer
    data_off = ifd_off + (8 + n * esz + 8 if big else 2 + n * esz + 4)
    overflow = bytearray()
    fixed = []
    for tag, typ, cnt, vals in entries:
        letter, size = _TYPES[typ]
        if typ == 2:
            payload = vals[0]
        else:
            payload = struct.pack("<" + str(cnt) + letter, *vals)
        if len(payload) <= inl:
            fixed.append((tag, typ, cnt, payload.ljust(inl, b"\x00"), None))
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
            payload = struct.pack("<" + str(cnt) + off_letter, *offs)
            if len(payload) <= inl:
                fixed[i] = (tag, typ, cnt, payload.ljust(inl, b"\x00"), None)
            else:
                overflow[ovf:ovf + len(payload)] = payload

    out = bytearray()
    out += struct.pack("<Q" if big else "<H", n)
    for tag, typ, cnt, inline, ovf in fixed:
        out += struct.pack("<HHQ" if big else "<HHI", tag, typ, cnt)
        out += (inline if inline is not None
                else struct.pack("<Q" if big else "<I", data_off + ovf))
    out += struct.pack("<Q" if big else "<I", next_ifd or 0)
    out += overflow
    for b in blocks:
        out += b
    return bytes(out)


def format_gtiff(arr: np.ndarray, gt, srid: int = 0,
                 nodata: float | None = None, compression: str = "deflate",
                 predictor: bool = False, tile_size: int | None = None,
                 overviews: list[int] | None = None,
                 bigtiff: bool | str = "auto",
                 jpeg_quality: int = 75) -> bytes:
    """array (+ georef) -> little-endian GeoTIFF bytes: main IFD,
    chunky planar, strips (~64 KiB each, libtiff-style) or
    ``tile_size``-square tiles, Deflate by default. ``predictor`` turns
    on horizontal differencing (integer dtypes only). ``overviews``
    appends reduced-resolution IFDs at the given decimation factors
    (2x2-average resampled, NewSubfileType=1 — the COG overview
    layout), which :func:`gtiff_levels` / :func:`scan_gtiff_windowed`
    then expose as levels 1+. ``bigtiff`` selects the container:
    True/False force BigTIFF/classic, ``"auto"`` (the reference's
    ``BIGTIFF=IF_SAFER`` discipline, gtiffdataset.cpp semantics)
    switches to BigTIFF when the worst-case encoded size could
    overflow classic's 32-bit offsets."""
    from ..resample import resize_average

    a = np.ascontiguousarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, _spp = a.shape
    dt = a.dtype
    if dt.kind not in "uif" or dt.itemsize not in (1, 2, 4, 8):
        raise ValueError(f"dtype {dt} unsupported")
    if predictor and dt.kind == "f":
        raise ValueError("predictor=2 is for integer samples")

    if bigtiff == "auto":
        # worst-case codec expansion: LZW 1.5x, PackBits 129/128,
        # Deflate ~1.001x; 1.6x over raw (incl. 4/3 overview pyramid)
        # comfortably bounds all three
        raw = a.nbytes * (4 / 3 if overviews else 1)
        big = raw * 1.6 > (1 << 32) - (1 << 20)
    else:
        big = bool(bigtiff)

    images: list[tuple[np.ndarray, bool]] = [(a, False)]
    for fac in overviews or []:
        fac = int(fac)
        if fac < 2:
            raise ValueError(f"overview factor {fac} must be >= 2")
        oh = max(1, (h + fac - 1) // fac)
        ow = max(1, (w + fac - 1) // fac)
        ov = resize_average(a, oh, ow)
        if dt.kind in "ui":
            ov = np.rint(ov)
        images.append((np.ascontiguousarray(ov.astype(dt)), True))

    # lay sections out sequentially: each section's size is known once
    # built, so the next IFD's absolute offset is too
    if big:
        out = bytearray(b"II+\x00" + struct.pack("<HHQ", 8, 0, 16))
        cur = 16
    else:
        out = bytearray(b"II*\x00" + struct.pack("<I", 8))
        cur = 8
    sections: list[bytes] = []
    offsets = []
    for img, reduced in images:
        sec = _ifd_section(img, gt, srid, nodata, compression, predictor,
                           tile_size, cur, None, reduced, big,
                           jpeg_quality=jpeg_quality)
        offsets.append(cur)
        sections.append(sec)
        cur += len(sec)
    if not big and cur > (1 << 32) - 1:
        raise ValueError(
            f"classic TIFF would be {cur} bytes (> 4 GiB offsets); "
            "pass bigtiff=True"
        )
    for i, sec in enumerate(sections):
        if i + 1 < len(sections):
            # patch this section's next-IFD pointer (the pointer-sized
            # field after the count + entries)
            if big:
                (n,) = struct.unpack_from("<Q", sec, 0)
                ptr_at = 8 + 20 * n
                sec = (sec[:ptr_at] + struct.pack("<Q", offsets[i + 1])
                       + sec[ptr_at + 8:])
            else:
                (n,) = struct.unpack_from("<H", sec, 0)
                ptr_at = 2 + 12 * n
                sec = (sec[:ptr_at] + struct.pack("<I", offsets[i + 1])
                       + sec[ptr_at + 4:])
        out += sec
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


def plan_gtiff_windows(lvl: dict, target_bytes: int = 32 << 20):
    """Group consecutive block-rows of one level into row-band windows
    whose COMPRESSED input is ~``target_bytes`` each (from the IFD's
    per-block byte counts — no pixel bytes touched). Returns
    ``[(block_row_start, block_row_end, nbytes)]``; every window is at
    least one block-row, so a single giant strip still yields one
    (documented) unsplittable task."""
    across, down = lvl["across"], lvl["down"]
    per_plane = across * down
    nplanes = lvl["spp"] if lvl["planar"] == 2 else 1
    counts = lvl["counts"]
    row_bytes = [
        sum(
            counts[p * per_plane + by * across + bx]
            for p in range(nplanes)
            for bx in range(across)
        )
        for by in range(down)
    ]
    windows = []
    start, acc = 0, 0
    for by in range(down):
        if acc and acc + row_bytes[by] > target_bytes:
            windows.append((start, by, acc))
            start, acc = by, 0
        acc += row_bytes[by]
    windows.append((start, down, acc))
    return windows


def scan_gtiff_windowed(spark, path_glob: str, level: int = 0,
                        target_bytes: int = 32 << 20):
    """Distributed WINDOWED GeoTIFF read — the scale path for files too
    big for :func:`scan_gtiff`'s one-task-per-file shape (a 100 GB COG
    must not be one task). The driver reads only header/IFD bytes per
    file (:func:`read_ifd_chain`), plans ~``target_bytes`` row-band
    windows from the block byte counts, and fans out EXACTLY one task
    per window; each task seeks/reads/decodes only its own blocks and
    emits a standard images-table row with the window's shifted
    geotransform, so every downstream raster operator composes
    unchanged. ``level`` selects a reduced-resolution IFD (COG
    overview) — reading level k touches 1/4^k of the bytes.

    Window rows are named ``{stem}_w{k:03d}`` when a file splits
    (single-window files keep the plain stem, drop-in compatible with
    :func:`scan_gtiff`)."""
    import glob as _glob
    import json

    pat = local_path(path_glob)
    paths = (sorted(_glob.glob(pat))
             if any(ch in pat for ch in "*?[") else [pat])
    if not paths:
        raise FileNotFoundError(path_glob)

    tasks = []
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        with open(path, "rb") as f:
            levels, _gt, srid, nodata = gtiff_levels(f)
        if level >= len(levels):
            raise ValueError(
                f"{path}: level {level} requested, file has {len(levels)}"
            )
        lvl = levels[level]
        gtl = lvl["gt"]
        nplanes = lvl["spp"] if lvl["planar"] == 2 else 1
        per_plane = lvl["across"] * lvl["down"]
        wins = plan_gtiff_windows(lvl, target_bytes)
        many = len(wins) > 1
        for wi, (by0, by1, _nb) in enumerate(wins):
            y0 = by0 * lvl["bh"]
            wh = min(lvl["h"], by1 * lvl["bh"]) - y0
            # slice ONLY this window's block index into the task (the
            # full offsets array of a 100k-block file must not ride on
            # every task)
            sl_off, sl_cnt = [], []
            for p in range(nplanes):
                for by in range(by0, by1):
                    lo = p * per_plane + by * lvl["across"]
                    sl_off += lvl["offsets"][lo:lo + lvl["across"]]
                    sl_cnt += lvl["counts"][lo:lo + lvl["across"]]
            sub = {
                k: lvl.get(k)
                for k in ("bo", "w", "spp", "bits", "sfmt", "comp",
                          "planar", "pred", "tiled", "bw", "bh",
                          "across", "jtab")
            }
            sub.update(h=wh, down=by1 - by0, offsets=sl_off, counts=sl_cnt)
            tasks.append((
                path,
                f"{stem}_w{wi:03d}" if many else stem,
                json.dumps(sub),
                gtl[0] + y0 * gtl[2], gtl[1], gtl[2],
                gtl[3] + y0 * gtl[5], gtl[4], gtl[5],
                int(srid),
                float(nodata) if nodata is not None else None,
            ))

    # one slice per window: exactly one task per planned byte span
    # (repartition's round-robin can clump — same fix as the FGB scan)
    tdf = spark.createDataFrame(
        spark.sparkContext.parallelize(tasks, len(tasks)),
        "path string, image_id string, lvl string, gt0 double, "
        "gt1 double, gt2 double, gt3 double, gt4 double, gt5 double, "
        "srid int, nodata double",
    )

    def read_windows(batches):
        import json as _json

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                lvl = _json.loads(r.lvl)
                with open(r.path, "rb") as f:
                    arr = read_gtiff_window(f, lvl, 0, 0,
                                            lvl["w"], lvl["h"])
                if np.dtype(arr.dtype) not in codecs._DTYPE_CODES:
                    arr = arr.astype(
                        np.float64 if arr.dtype.kind in "uif" else arr.dtype
                    )
                rows.append({
                    "image_id": r.image_id,
                    "bytes": codecs.encode_raw(arr),
                    "w": arr.shape[1], "h": arr.shape[0], "fmt": "raw",
                    "gt0": r.gt0, "gt1": r.gt1, "gt2": r.gt2,
                    "gt3": r.gt3, "gt4": r.gt4, "gt5": r.gt5,
                    "srid": r.srid,
                    "nodata": None if pd.isna(r.nodata) else float(r.nodata),
                })
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "gt0", "gt1",
                         "gt2", "gt3", "gt4", "gt5", "srid", "nodata"],
            )

    return tdf.mapInPandas(read_windows, schema=OUT_SCHEMA)


def write_gtiff(df, out_dir: str, compression: str = "deflate",
                predictor: bool = False, tile_size: int | None = None,
                overviews: list[int] | None = None,
                bigtiff: bool | str = "auto", jpeg_quality: int = 75):
    """One .tif per row, written by the task that holds the row (the
    same distributed many-files layout as the AAIGrid sink).
    ``overviews`` embeds COG-style reduced-resolution IFDs;
    ``bigtiff`` as in :func:`format_gtiff` (default IF_SAFER auto)."""
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
                        tile_size=tile_size, overviews=overviews,
                        bigtiff=bigtiff, jpeg_quality=jpeg_quality,
                    ))
                names.append(path)
            yield pd.DataFrame({"path": names})

    return [
        r.path
        for r in df.mapInPandas(dump, schema="path string").collect()
    ]
