"""Image codecs in pure numpy (+zlib) — the engine's format "drivers".

The reference dispatches ~110 raster format drivers from GDALOpenEx
(gcore/gdaldataset.cpp:3642, frmts/gdalallregister.cpp). Here a "driver" is
a decode/encode function selected by the ``fmt`` column inside an Arrow
pandas UDF:

- ``png``: real PNG (RFC 2083) — 8/16-bit gray/LA/RGB/RGBA plus palette
  (color type 3, bit depths 1/2/4/8, PLTE->RGB with optional tRNS alpha,
  expanded pct2rgb-style), filters None/Sub/Up/Average/Paeth on decode,
  Sub on encode (Sub and Up unfilter as modular cumsums, so decode stays
  vectorized). Reference codec: frmts/png/pngdataset.cpp (filter set also
  in apps/gdalalg_raster_tile.cpp:481-505).
- ``raw``: trivial header + row-major pixels (uncompressed baseline).
- ``jpg``: our own lossy 8x8 block-DCT codec ("GSJ1"), quality-scaled
  quantization like baseline JPEG (frmts/jpeg/jpgdataset.cpp is the
  reference behavior); acceptance bar is PSNR >= 40 dB, not byte equality.

All codecs are deterministic bit-for-bit for a given input.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 4: 2, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode (h,w) or (h,w,c) uint8/uint16 array as PNG with Sub filter."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if arr.dtype == np.uint8:
        bitdepth, raw = 8, arr
    elif arr.dtype == np.uint16:
        bitdepth, raw = 16, arr.astype(">u2").view(np.uint8).reshape(h, w, c * 2)
    else:
        raise ValueError(f"PNG supports uint8/uint16, got {arr.dtype}")
    bpp = c * (bitdepth // 8)
    lines = raw.reshape(h, w * bpp)
    # Sub filter: out[x] = cur[x] - cur[x-bpp] (mod 256)
    filtered = lines.copy()
    filtered[:, bpp:] = lines[:, bpp:] - lines[:, :-bpp]
    scan = np.empty((h, 1 + w * bpp), dtype=np.uint8)
    scan[:, 0] = 1  # filter type Sub
    scan[:, 1:] = filtered
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, _COLOR_TYPE[c], 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), level)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a, b, c):
    p = int(a) + int(b) - int(c)
    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = bitdepth = color = None
    idat = []
    plte = trns = None
    n = len(buf)
    while off < n:
        (length,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4 : off + 8]
        data = buf[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if color == 3:
        # palette (frmts/png/pngdataset.cpp color-table path): indices ->
        # PLTE RGB, expanded pct2rgb-style; tRNS adds the alpha plane.
        # Sub-byte depths (1/2/4) are spec-required for palette images.
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        if bitdepth not in (1, 2, 4, 8):
            raise ValueError(f"bad palette PNG bit depth {bitdepth}")
        c = 1
        stride = (w * bitdepth + 7) // 8
        bpp = 1  # PNG filter bpp: bytes per pixel rounded UP to one
    else:
        if color not in _CHANNELS:
            raise ValueError(f"unsupported PNG color type {color}")
        if bitdepth < 8:
            raise ValueError(f"sub-byte PNG bit depth {bitdepth} unsupported")
        c = _CHANNELS[color]
        sample_bytes = bitdepth // 8
        bpp = c * sample_bytes
        stride = w * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + stride)
    ftypes = raw[:, 0]
    data = raw[:, 1:].astype(np.int64)  # headroom for modular adds

    # fast paths: homogeneous filter type over all rows (our encoder always
    # writes Sub, so this is the hot path — one vectorized op instead of a
    # per-row Python loop)
    if (ftypes == 0).all():
        out = raw[:, 1:].copy()
        return _png_finish(out, h, w, c, bitdepth, stride, plte, trns)
    if (ftypes == 1).all():  # Sub: prefix sum within each row per byte lane
        lanes = data.reshape(h, stride // bpp, bpp)
        out = (lanes.cumsum(axis=1) % 256).astype(np.uint8).reshape(h, stride)
        return _png_finish(out, h, w, c, bitdepth, stride, plte, trns)
    if (ftypes == 2).all():  # Up: prefix sum down columns
        out = (data.cumsum(axis=0) % 256).astype(np.uint8)
        return _png_finish(out, h, w, c, bitdepth, stride, plte, trns)

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = ftypes[y]
        line = data[y]
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: modular cumsum per byte lane
            cur = line.reshape(stride // bpp, bpp).cumsum(axis=0) % 256
            cur = cur.reshape(stride)
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft == 3:  # Average
            cur = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + _paeth(left, prev[x], ul)) % 256
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[y] = cur
        prev = cur
    return _png_finish(out, h, w, c, bitdepth, stride, plte, trns)


def _png_finish(out, h, w, c, bitdepth, stride, plte=None, trns=None):
    if plte is not None:
        # palette indices -> RGB(A). Sub-byte rows unpack MSB-first with
        # trailing pad bits dropped (PNG spec 7.2); the palette math is
        # the pct2rgb expansion.
        if bitdepth == 8:
            idx = out
        else:
            bits = np.unpackbits(out, axis=1).reshape(h, stride * 8 // bitdepth,
                                                      bitdepth)
            weights = 1 << np.arange(bitdepth - 1, -1, -1, dtype=np.uint8)
            idx = (bits * weights).sum(axis=2).astype(np.uint8)
        idx = idx[:, :w]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of PLTE range")
        rgb = plte[idx]
        if trns is None:
            return rgb
        alpha = np.full(len(plte), 255, dtype=np.uint8)
        alpha[: min(len(trns), len(plte))] = trns[: len(plte)]
        return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
    if bitdepth == 16:
        arr = out.reshape(h, w, c, 2).astype(np.uint16)
        arr = (arr[..., 0] << 8) | arr[..., 1]
    else:
        arr = out.reshape(h, w, c)
    return arr[:, :, 0] if c == 1 else arr


# ---------------------------------------------------------------------------
# RAW
# ---------------------------------------------------------------------------

_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.int16, 3: np.int32, 4: np.float32, 5: np.float64}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def encode_raw(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    code = _DTYPE_CODES[arr.dtype]
    return b"GSRW" + struct.pack("<IIIB", w, h, c, code) + np.ascontiguousarray(arr).tobytes()


def decode_raw(buf: bytes) -> np.ndarray:
    if buf[:4] != b"GSRW":
        raise ValueError("not a GSRW raw image")
    w, h, c, code = struct.unpack_from("<IIIB", buf, 4)
    arr = np.frombuffer(buf, dtype=_DTYPES[code], offset=17).reshape(h, w, c).copy()
    return arr[:, :, 0] if c == 1 else arr


# ---------------------------------------------------------------------------
# GSJ1 — lossy 8x8 block-DCT codec (our "jpg")
# ---------------------------------------------------------------------------

# Standard JPEG luminance quantization table (Annex K of ITU T.81) — public.
_QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0) * np.sqrt(2.0 / 8.0)
    C[0] /= np.sqrt(2.0)
    return C


_DCT = _dct_matrix()


def _qscale(quality: int) -> np.ndarray:
    # libjpeg-style quality scaling of the base table
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_QTABLE * s + 50) / 100.0)
    return np.clip(q, 1, 255)


def encode_gsj(arr: np.ndarray, quality: int = 92) -> bytes:
    """Lossy encode of an (h,w) or (h,w,c) uint8 array."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("GSJ1 encodes uint8 only")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(arr, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    q = _qscale(quality)
    planes = []
    for ch in range(c):
        blocks = (
            pad[:, :, ch]
            .astype(np.float64)
            .reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
        ) - 128.0
        coefs = np.einsum("ij,bcjk,lk->bcil", _DCT, blocks, _DCT)
        qc = np.round(coefs / q).astype(np.int16)
        planes.append(qc)
    payload = zlib.compress(np.stack(planes).tobytes(), 6)
    return b"GSJ1" + struct.pack("<IIIB", w, h, c, quality) + payload


def decode_gsj(buf: bytes) -> np.ndarray:
    if buf[:4] != b"GSJ1":
        raise ValueError("not a GSJ1 image")
    w, h, c, quality = struct.unpack_from("<IIIB", buf, 4)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    q = _qscale(quality)
    qc = np.frombuffer(zlib.decompress(buf[17:]), dtype=np.int16).reshape(
        c, ph // 8, pw // 8, 8, 8
    )
    out = np.empty((h, w, c), dtype=np.uint8)
    for ch in range(c):
        coefs = qc[ch].astype(np.float64) * q
        blocks = np.einsum("ji,bcjk,kl->bcil", _DCT, coefs, _DCT)
        plane = blocks.transpose(0, 2, 1, 3).reshape(ph, pw) + 128.0
        out[:, :, ch] = np.clip(np.round(plane[:h, :w]), 0, 255).astype(np.uint8)
    return out[:, :, 0] if c == 1 else out


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(buf)
    if fmt == "raw":
        return decode_raw(buf)
    if fmt in ("jpg", "jpeg"):
        # sniff: real JFIF/JPEG bytes (FFD8 SOI) vs our GSJ1 container —
        # a real image table carries libjpeg bytes, our sinks write GSJ1
        if len(buf) >= 2 and buf[0] == 0xFF and buf[1] == 0xD8:
            from gdal_spark.jpeg import decode_jpeg

            return decode_jpeg(buf)
        return decode_gsj(buf)
    if fmt in ("pnm", "pgm", "ppm"):
        return decode_pnm(buf)
    if fmt == "bmp":
        return decode_bmp(buf)
    raise ValueError(f"unknown image fmt {fmt!r}")


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(arr)
    if fmt == "raw":
        return encode_raw(arr)
    if fmt == "jpg":
        return encode_gsj(arr)
    if fmt == "jpeg":  # real baseline JFIF (interop sink)
        from gdal_spark.jpeg import encode_jpeg

        return encode_jpeg(arr)
    if fmt in ("pnm", "pgm", "ppm"):
        return encode_pnm(arr)
    if fmt == "bmp":
        return encode_bmp(arr)
    raise ValueError(f"unknown image fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


# ---------------------------------------------------------------------------
# PNM (PGM P5 / PPM P6) — reference frmts/pnm/pnmdataset.cpp; implemented
# from the Netpbm format spec: magic, whitespace/comment-separated width,
# height, maxval, then raw big-endian samples (1 byte if maxval < 256,
# else 2 bytes). GDAL writes no comments; we tolerate them on read.
# ---------------------------------------------------------------------------


def _pnm_header(buf: bytes):
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM: magic {buf[:2]!r}")
    vals, pos, n = [], 2, len(buf)
    while len(vals) < 3:
        while pos < n and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":  # comment to end of line
            while pos < n and buf[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < n and not buf[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    return buf[:2], vals[0], vals[1], vals[2], pos + 1  # single ws after maxval


def decode_pnm(buf: bytes) -> np.ndarray:
    magic, w, h, maxval, off = _pnm_header(buf)
    ch = 3 if magic == b"P6" else 1
    dt = ">u2" if maxval > 255 else np.uint8
    arr = np.frombuffer(buf, dtype=dt, count=w * h * ch, offset=off)
    arr = arr.astype(np.uint16 if maxval > 255 else np.uint8)
    arr = arr.reshape(h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


def encode_pnm(arr: np.ndarray) -> bytes:
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.ndim == 2:
        magic, ch = b"P5", 1
    elif a.ndim == 3 and a.shape[2] == 3:
        magic, ch = b"P6", 3
    else:
        raise ValueError(f"PNM supports gray or RGB, got shape {a.shape}")
    if a.dtype == np.uint16:
        maxval, body = 65535, a.astype(">u2").tobytes()
    else:
        maxval, body = 255, a.astype(np.uint8).tobytes()
    h, w = a.shape[:2]
    del ch
    return magic + f"\n{w} {h}\n{maxval}\n".encode() + body


# ---------------------------------------------------------------------------
# BMP — reference frmts/bmp/bmpdataset.cpp; implemented from the public
# Windows BITMAPFILEHEADER/BITMAPINFOHEADER layout: 'BM' magic, pixel-data
# offset at byte 10, 40-byte info header (width, signed height — positive
# means bottom-up rows), BI_RGB only, rows padded to 4 bytes, BGR order,
# 8-bit palette (BGRX quads) expanded to RGB like the palette-PNG path.
# ---------------------------------------------------------------------------


def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError(f"not a BMP: magic {buf[:2]!r}")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0:
        raise ValueError(f"only BI_RGB supported (compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    if bpp == 24:
        raw = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h,
                            offset=data_off)
        rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        out = rows[:, :, ::-1]  # BGR -> RGB
    elif bpp == 8:
        n_colors = struct.unpack_from("<I", buf, 46)[0] or 256
        pal = np.frombuffer(buf, dtype=np.uint8, count=4 * n_colors,
                            offset=14 + hdr_size).reshape(n_colors, 4)
        raw = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h,
                            offset=data_off)
        idx = raw.reshape(h, row_bytes)[:, :w]
        out = pal[idx][:, :, [2, 1, 0]]  # BGRX quads -> RGB
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    del planes
    return np.ascontiguousarray(out[::-1] if bottom_up else out)


def encode_bmp(arr: np.ndarray) -> bytes:
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.shape[2] == 1:
        a = np.repeat(a, 3, axis=2)
    if a.shape[2] != 3:
        raise ValueError(f"BMP encoder wants gray or RGB, got {a.shape}")
    h, w = a.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    )
    return header + data
