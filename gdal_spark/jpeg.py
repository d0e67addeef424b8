"""Baseline JFIF/JPEG codec in pure numpy — real-world image interop.

The engine's own lossy codec (GSJ1, ``codecs.encode_gsj``) satisfies the
PSNR gate, but any real image table carries actual JPEG bytes.  This module
implements ITU-T T.81 *baseline* sequential DCT:

- ``decode_jpeg``: SOI/APPn/DQT/DHT/SOF0/SOF1/DRI/SOS/RSTn/EOI parsing,
  canonical-Huffman entropy decode via a 16-bit peek LUT (O(1) per symbol),
  vectorized dequantize + 2-D IDCT over all blocks of a component at once,
  chroma upsampling, and YCbCr->RGB (BT.601) or Adobe-RGB passthrough.
  Reference behavior: frmts/jpeg/jpgdataset.cpp (which wraps libjpeg);
  the decode algorithm here is written from the public T.81 spec, not from
  any decoder source.
- ``encode_jpeg``: baseline JFIF writer using the public Annex K
  quantization + Huffman tables, libjpeg-style quality scaling, 4:4:4 or
  4:2:0 chroma subsampling.

Progressive (SOF2) decode is supported: multi-scan coefficient
accumulation with spectral selection and successive approximation (DC
first/refine, AC first with EOB runs, AC refinement with correction bits
— T.81 Annex G.1.2), both interleaved DC scans and the mandatory
single-component AC scans, restart markers resetting predictor + EOB run.
The refinement path is validated bit-exactly: a built-in progressive
encoder (encode_jpeg(..., progressive=True) — DC Al=1 + refinement, AC
first + refinement scans) must reproduce the IDENTICAL quantized
coefficients as the baseline encoding of the same image.

Out of scope (raised as explicit errors, mirroring SURVEY's honesty rule):
arithmetic coding, hierarchical, lossless (SOF3), 12-bit, CMYK/YCCK.

All constants below (zigzag order, Annex K quantization and Huffman
tables) are published in ITU-T T.81 itself — public-domain spec values.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: ZZ[i] = natural (row-major) position of the i-th
# zigzag-ordered coefficient (T.81 Figure 5).
ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 quantization tables (luminance, chrominance).
QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K.3 typical Huffman tables: (bits[1..16], values).
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0) * 0.5
    C[0] *= 1.0 / np.sqrt(2.0)
    return C


_DCT = _dct_matrix()  # orthonormal 8x8 DCT-II basis


class _HuffLUT:
    """Canonical Huffman decode table: 16-bit peek -> (symbol, code length)."""

    __slots__ = ("sym", "ln")

    def __init__(self, bits, vals):
        sym = np.zeros(65536, dtype=np.uint8)
        ln = np.zeros(65536, dtype=np.uint8)
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                sym[lo:hi] = vals[k]
                ln[lo:hi] = length
                code += 1
                k += 1
            code <<= 1
        self.sym, self.ln = sym, ln


def _unstuff(buf: bytes, start: int):
    """Strip byte stuffing from entropy data; split at RSTn markers.

    Returns (segments, end_offset) where each segment is a bytes object of
    pure entropy-coded data (0xFF00 collapsed to 0xFF) and end_offset points
    at the terminating marker (EOI or next SOS/other).
    """
    arr = np.frombuffer(buf, dtype=np.uint8)
    segments = []
    seg_start = start
    i = start
    n = len(buf)
    out_parts = []
    while True:
        # jump to next 0xFF from i
        nxt = np.flatnonzero(arr[i:n] == 0xFF)
        if nxt.size == 0:
            out_parts.append(buf[seg_start:n])
            i = n
            break
        j = i + int(nxt[0])
        m = buf[j + 1] if j + 1 < n else 0xD9
        if m == 0x00:
            out_parts.append(buf[seg_start : j + 1])  # keep the 0xFF
            i = j + 2
            seg_start = i
        elif 0xD0 <= m <= 0xD7:  # RSTn — segment boundary
            out_parts.append(buf[seg_start:j])
            segments.append(b"".join(out_parts))
            out_parts = []
            i = j + 2
            seg_start = i
        elif m == 0xFF:  # fill byte
            out_parts.append(buf[seg_start:j])
            i = j + 1
            seg_start = i
        else:  # real marker terminates the scan
            out_parts.append(buf[seg_start:j])
            i = j
            break
    segments.append(b"".join(out_parts))
    return segments, i


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes.

    Precomputes a 32-bit window per byte offset so that peeking 16 bits and
    extracting <=16 magnitude bits are O(1) array lookups.
    """

    __slots__ = ("w32", "pos", "nbits")

    def __init__(self, data: bytes):
        pad = np.frombuffer(data, dtype=np.uint8)
        self.nbits = len(pad) * 8
        pad = np.concatenate([pad, np.zeros(8, dtype=np.uint8)])
        w = pad.astype(np.uint32)
        self.w32 = (w[:-3] << 24) | (w[1:-2] << 16) | (w[2:-1] << 8) | w[3:]
        self.pos = 0

    def peek16(self) -> int:
        p = self.pos
        return int((self.w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF)

    def get(self, k: int) -> int:
        p = self.pos
        v = int((self.w32[p >> 3] >> (32 - (p & 7) - k)) & ((1 << k) - 1))
        self.pos = p + k
        return v


def _extend(v: int, s: int) -> int:
    # T.81 EXTEND: map s-bit magnitude to signed value.
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc", "ac", "blocks", "bx", "by")


def _alloc_blocks(comps, w, h):
    """Allocate per-component coefficient grids at the interleaved-MCU
    padded size (progressive scans accumulate into these across scans)."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c.bx = mcux * c.h
        c.by = mcuy * c.v
        c.blocks = np.zeros((c.by * c.bx, 64), dtype=np.int32)
    return mcux, mcuy, hmax, vmax


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode baseline JFIF/JPEG bytes to (h,w) uint8 or (h,w,3) uint8 RGB."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffLUT] = {}
    comps: list[_Component] = []
    w = h = 0
    restart_interval = 0
    adobe_transform = None
    jfif = False
    progressive = False
    allocated = False
    i = 2
    n = len(buf)
    got_scan = False
    while i < n - 1:
        if buf[i] != 0xFF:
            i += 1
            continue
        m = buf[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:  # EOI
            break
        if m == 0xFF:
            i += 1
            continue
        ln = (buf[i + 2] << 8) | buf[i + 3]
        seg = buf[i + 4 : i + 2 + ln]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tab = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.float64)
                    p += 128
                else:
                    tab = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.float64)
                    p += 64
                nat = np.empty(64, dtype=np.float64)
                nat[ZZ] = tab  # store in natural order
                qtabs[tq] = nat
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                htabs[(tc, th)] = _HuffLUT(bits, vals)
                p += 17 + cnt
        elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. sequential / progressive
            progressive = m == 0xC2
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported (8-bit only)")
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            nc = seg[5]
            if nc == 4:
                raise NotImplementedError("CMYK/YCCK JPEG unsupported")
            for c in range(nc):
                comp = _Component()
                comp.cid = seg[6 + 3 * c]
                comp.h = seg[7 + 3 * c] >> 4
                comp.v = seg[7 + 3 * c] & 15
                comp.tq = seg[8 + 3 * c]
                comps.append(comp)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{m:02x} unsupported (baseline + progressive only)"
            )
        elif m == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif m == 0xE0 and seg[:5] == b"JFIF\x00":
            jfif = True
        elif m == 0xEE and seg[:5] == b"Adobe":
            adobe_transform = seg[11] if len(seg) > 11 else 0
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15
                comp = next(cc for cc in comps if cc.cid == cs)
                comp.dc, comp.ac = td, ta
                scan_comps.append(comp)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            if not allocated:
                _alloc_blocks(comps, w, h)
                allocated = True
            segments, i = _unstuff(buf, i + 2 + ln)
            try:
                if progressive:
                    _decode_scan_progressive(
                        comps, scan_comps, htabs, segments, restart_interval,
                        w, h, ss, se, ah, al,
                    )
                else:
                    if ns != len(comps):
                        raise NotImplementedError(
                            "multi-scan sequential JPEG unsupported"
                        )
                    _decode_scan(comps, htabs, segments, restart_interval, w, h)
            except IndexError as ex:
                # the bit reader ran past its zero padding — the entropy
                # data ends before the block grid does
                raise ValueError("truncated JPEG: entropy data exhausted") from ex
            got_scan = True
            continue
        i += 2 + ln
    if not got_scan:
        raise ValueError("no SOS scan found")
    return _assemble(None, comps, qtabs, w, h, adobe_transform, jfif)


def _decode_block_seq(br, dc_lut, ac_lut, pred):
    """One sequential 8x8 block: DC diff + AC run-lengths. Returns
    (coefs, new_pred)."""
    coefs = np.zeros(64, dtype=np.int32)
    idx = br.peek16()
    s = int(dc_lut.sym[idx])
    l = int(dc_lut.ln[idx])
    if l == 0:
        raise ValueError("corrupt JPEG: bad DC code")
    br.pos += l
    diff = _extend(br.get(s), s) if s else 0
    pred += diff
    coefs[0] = pred
    k = 1
    while k < 64:
        idx = br.peek16()
        rs = int(ac_lut.sym[idx])
        l = int(ac_lut.ln[idx])
        if l == 0:
            raise ValueError("corrupt JPEG: bad AC code")
        br.pos += l
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC run overflow")
        coefs[k] = _extend(br.get(s), s)
        k += 1
    return coefs, pred


def _decode_scan(comps, htabs, segments, restart_interval, w, h):
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — the
        # data unit is one 8x8 block over the component's own
        # ceil(size/8) grid, and the declared sampling factors do NOT
        # make MCUs (a grayscale JPEG with 2x2 factors still codes
        # ceil(w/8) x ceil(h/8) blocks)
        c = comps[0]
        dc_lut = htabs[(0, c.dc)]
        ac_lut = htabs[(1, c.ac)]
        nbx = (w + 7) // 8
        nby = (h + 7) // 8
        pred = 0
        seg_idx = 0
        br = _BitReader(segments[0])
        for u in range(nbx * nby):
            if restart_interval and u > 0 and u % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("truncated JPEG: missing restart segment")
                br = _BitReader(segments[seg_idx])
                pred = 0
            by, bx = divmod(u, nbx)
            coefs, pred = _decode_block_seq(br, dc_lut, ac_lut, pred)
            c.blocks[by * c.bx + bx] = coefs
        if br.pos > br.nbits:
            raise ValueError("truncated JPEG: scan consumed past entropy data")
        return
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcux * mcuy
    preds = [0] * len(comps)
    seg_idx = 0
    br = _BitReader(segments[0])
    for mcu in range(n_mcus):
        if restart_interval and mcu > 0 and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("truncated JPEG: missing restart segment")
            br = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            dc_lut = htabs[(0, c.dc)]
            ac_lut = htabs[(1, c.ac)]
            for v in range(c.v):
                for hh in range(c.h):
                    coefs, preds[ci] = _decode_block_seq(
                        br, dc_lut, ac_lut, preds[ci]
                    )
                    by = my * c.v + v
                    bx = mx * c.h + hh
                    c.blocks[by * c.bx + bx] = coefs
    if br.pos > br.nbits:
        raise ValueError("truncated JPEG: scan consumed past entropy data")
    return True


def _ac_first(br, coefs, lut, ss, se, al, state):
    """Progressive AC scan, Ah=0 (T.81 G.1.2.2): EOB-run decoding of the
    Al-point-transformed band."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        idx = br.peek16()
        rs = int(lut.sym[idx])
        l = int(lut.ln[idx])
        if l == 0:
            raise ValueError("corrupt JPEG: bad AC code (progressive)")
        br.pos += l
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.get(r)
            break
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC run overflow (progressive)")
        coefs[k] = _extend(br.get(s), s) << al
        k += 1


def _refine_nonzero(br, coefs, k, se, p1):
    """Correction bits for already-nonzero coefficients in [k, se]."""
    for j in range(k, se + 1):
        c = int(coefs[j])
        if c != 0 and br.get(1) and (c & p1) == 0:
            coefs[j] = c + (p1 if c > 0 else -p1)


def _ac_refine(br, coefs, lut, ss, se, al, state):
    """Progressive AC refinement, Ah>0 (T.81 G.1.2.3): one new magnitude
    bit per already-nonzero coefficient, newly-significant coefficients
    inserted at +-2^Al, EOB runs carrying correction bits."""
    p1 = 1 << al
    k = ss
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        _refine_nonzero(br, coefs, k, se, p1)
        return
    while k <= se:
        idx = br.peek16()
        rs = int(lut.sym[idx])
        l = int(lut.ln[idx])
        if l == 0:
            raise ValueError("corrupt JPEG: bad AC code (refinement)")
        br.pos += l
        r, s = rs >> 4, rs & 15
        newval = 0
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.get(r)
                _refine_nonzero(br, coefs, k, se, p1)
                return
            # ZRL: skip 16 zero-history positions
        else:
            if s != 1:
                raise ValueError("corrupt JPEG: refinement size != 1")
            newval = p1 if br.get(1) else -p1
        while k <= se:
            c = int(coefs[k])
            if c != 0:
                if br.get(1) and (c & p1) == 0:
                    coefs[k] = c + (p1 if c > 0 else -p1)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            coefs[k] = newval
        k += 1


def _decode_scan_progressive(
    comps, scan_comps, htabs, segments, restart_interval, w, h, ss, se, ah, al
):
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    interleaved = len(scan_comps) > 1
    if ss != 0 and interleaved:
        raise ValueError("corrupt JPEG: interleaved progressive AC scan")
    if interleaved:
        units = mcux * mcuy
    else:
        # non-interleaved: blocks row-major over the component's own
        # ceil(size/8) grid (T.81 A.2.2 — NOT the MCU-padded grid)
        c = scan_comps[0]
        cw = -(-w * c.h // hmax)
        ch = -(-h * c.v // vmax)
        bw_ = -(-cw // 8)
        bh_ = -(-ch // 8)
        units = bw_ * bh_
    state = {"eobrun": 0}
    preds = {c.cid: 0 for c in scan_comps}
    seg_idx = 0
    br = _BitReader(segments[0])
    for u in range(units):
        if restart_interval and u > 0 and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("truncated JPEG: missing restart segment")
            br = _BitReader(segments[seg_idx])
            preds = {c.cid: 0 for c in scan_comps}
            state["eobrun"] = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            blocks = [
                (c, (my * c.v + v) * c.bx + (mx * c.h + hh))
                for c in scan_comps
                for v in range(c.v)
                for hh in range(c.h)
            ]
        else:
            c = scan_comps[0]
            by, bx = divmod(u, bw_)
            blocks = [(c, by * c.bx + bx)]
        for c, bi in blocks:
            coefs = c.blocks[bi]
            if ss == 0:  # DC scan
                if ah == 0:
                    dc_lut = htabs[(0, c.dc)]
                    idx = br.peek16()
                    s = int(dc_lut.sym[idx])
                    l = int(dc_lut.ln[idx])
                    if l == 0:
                        raise ValueError("corrupt JPEG: bad DC code (progressive)")
                    br.pos += l
                    diff = _extend(br.get(s), s) if s else 0
                    preds[c.cid] += diff
                    coefs[0] = preds[c.cid] << al
                else:
                    if br.get(1):
                        coefs[0] = int(coefs[0]) + (1 << al)
            else:
                lut = htabs[(1, c.ac)]
                if ah == 0:
                    _ac_first(br, coefs, lut, ss, se, al, state)
                else:
                    _ac_refine(br, coefs, lut, ss, se, al, state)


def _assemble(_, comps, qtabs, w, h, adobe_transform, jfif):
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        q = qtabs[c.tq]
        nat = np.zeros((len(c.blocks), 64), dtype=np.float64)
        nat[:, ZZ] = c.blocks  # de-zigzag
        nat *= q[None, :]
        blocks = nat.reshape(-1, 8, 8)
        # IDCT: X = C^T S C for each block (orthonormal basis)
        pix = np.einsum("ji,bjk,kl->bil", _DCT, blocks, _DCT) + 128.0
        grid = pix.reshape(c.by, c.bx, 8, 8).transpose(0, 2, 1, 3).reshape(
            c.by * 8, c.bx * 8
        )
        cw = -(-w * c.h // hmax)  # ceil(w * h_i / hmax)
        ch = -(-h * c.v // vmax)
        plane = grid[:ch, :cw]
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, a, b = planes
    ids = tuple(c.cid for c in comps)
    rgb_space = adobe_transform == 0 if adobe_transform is not None else (
        ids == (82, 71, 66) and not jfif  # component ids 'R','G','B'
    )
    if rgb_space:
        out = np.stack([y, a, b], axis=-1)
    else:
        cb, cr = a - 128.0, b - 128.0
        out = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _qscale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * s + 50) / 100.0)
    return np.clip(q, 1, 255)


def _enc_table(bits, vals):
    """code/size arrays indexed by symbol for encoding."""
    codes = np.zeros(256, dtype=np.uint32)
    sizes = np.zeros(256, dtype=np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = code
            sizes[vals[k]] = length
            code += 1
            k += 1
        code <<= 1
    return codes, sizes


class _BitWriter:
    __slots__ = ("out", "acc", "nb")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, code: int, size: int):
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nb += size
        while self.nb >= 8:
            self.nb -= 8
            byte = (self.acc >> self.nb) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nb) - 1

    def flush(self):
        if self.nb:  # pad remaining bits with 1s to the byte boundary
            pad = 8 - self.nb
            self.put((1 << pad) - 1, pad)


def _marker(m: int, payload: bytes) -> bytes:
    return bytes([0xFF, m]) + struct.pack(">H", len(payload) + 2) + payload


def _write_block(bw, zz_coefs, pred, dc_codes, dc_sizes, ac_codes, ac_sizes):
    dc = int(zz_coefs[0])
    diff = dc - pred
    if diff == 0:
        bw.put(int(dc_codes[0]), int(dc_sizes[0]))
    else:
        mag = abs(diff)
        s = mag.bit_length()
        bw.put(int(dc_codes[s]), int(dc_sizes[s]))
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.flatnonzero(zz_coefs[1:])
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz_coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(int(ac_codes[0xF0]), int(ac_sizes[0xF0]))  # ZRL
            run -= 16
        mag = abs(v)
        s = mag.bit_length()
        rs = (run << 4) | s
        bw.put(int(ac_codes[rs]), int(ac_sizes[rs]))
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        bw.put(int(ac_codes[0x00]), int(ac_sizes[0x00]))  # EOB
    return dc


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:2:0",
    progressive: bool = False,
) -> bytes:
    """Encode (h,w) gray or (h,w,3) RGB uint8 as JFIF JPEG.

    ``progressive=True`` writes SOF2 with a 4-stage scan script (DC
    Al=1 -> per-component AC 1-63 Al=1 -> DC refinement -> per-component
    AC refinement). Because successive approximation is lossless over the
    quantized coefficients, decoding the progressive stream MUST yield
    bit-identical pixels to the baseline stream of the same image — the
    round-trip test that validates the decoder's refinement path."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg takes uint8")
    # JFIF has no alpha: LA keeps the luma channel, RGBA keeps RGB —
    # explicit policy instead of an IndexError (LA) / silent mystery
    if arr.ndim == 3 and arr.shape[2] == 2:
        arr = arr[:, :, 0]
    elif arr.ndim == 3 and arr.shape[2] == 4:
        arr = arr[:, :, :3]
    elif arr.ndim == 3 and arr.shape[2] not in (1, 3):
        raise ValueError(f"encode_jpeg: unsupported channel count {arr.shape[2]}")
    gray = arr.ndim == 2 or arr.shape[2] == 1
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    h, w = arr.shape[:2]
    ql = _qscale(QT_LUM, quality)
    qc = _qscale(QT_CHROMA, quality)
    if gray:
        samp = [(1, 1)]
        planes = [arr.astype(np.float64)]
        qsel = [0]
    else:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        if subsampling == "4:2:0":
            samp = [(2, 2), (1, 1), (1, 1)]
            # box-average 2x2 for chroma (pad to even first)
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        elif subsampling == "4:4:4":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '4:2:0' or '4:4:4'")
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its MCU-aligned block grid and quantize
    zz_per_comp = []
    for plane, (sh, sv) in zip(planes, samp):
        bh, bw_ = mcuy * sv * 8, mcux * sh * 8
        ph, pw = plane.shape
        pp = np.pad(plane, ((0, bh - ph), (0, bw_ - pw)), mode="edge")
        q = ql if qsel[len(zz_per_comp)] == 0 else qc
        blocks = pp.reshape(bh // 8, 8, bw_ // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coefs = np.einsum("ij,bjk,lk->bil", _DCT, blocks - 128.0, _DCT).reshape(-1, 64)
        qz = np.round(coefs / q[None, :]).astype(np.int32)
        zz_per_comp.append((qz[:, ZZ], bw_ // 8))  # zigzag order, blocks-per-row
    # headers
    out = bytearray(b"\xff\xd8")
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_lum = ql[ZZ].astype(np.uint8).tobytes()
    out += _marker(0xDB, b"\x00" + zz_lum)
    if not gray:
        out += _marker(0xDB, b"\x01" + qc[ZZ].astype(np.uint8).tobytes())
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += _marker(0xC2 if progressive else 0xC0, sof)
    tables = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not gray:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tid, (bits, vals) in tables:
        out += _marker(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    dc_l = _enc_table(*DC_LUM)
    ac_l = _enc_table(*AC_LUM)
    dc_c = _enc_table(*DC_CHROMA)
    ac_c = _enc_table(*AC_CHROMA)
    if progressive:
        out += _write_progressive_scans(
            zz_per_comp, samp, mcux, mcuy, w, h,
            (dc_l, dc_c), (ac_l, ac_c), nc,
        )
        out += b"\xff\xd9"
        return bytes(out)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _marker(0xDA, sos)
    # entropy-coded data
    bw2 = _BitWriter()
    preds = [0] * nc
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            zz, bpr = zz_per_comp[ci]
            dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            for v in range(sv):
                for hh in range(sh):
                    bi = (my * sv + v) * bpr + (mx * sh + hh)
                    preds[ci] = _write_block(
                        bw2, zz[bi], preds[ci], dct[0], dct[1], act[0], act[1]
                    )
    bw2.flush()
    out += bw2.out
    out += b"\xff\xd9"
    return bytes(out)


def _sos_header(comp_specs, ss, se, ah, al) -> bytes:
    sos = bytes([len(comp_specs)])
    for cid, tbl in comp_specs:
        sos += bytes([cid, tbl])
    return _marker(0xDA, sos + bytes([ss, se, (ah << 4) | al]))


def _write_progressive_scans(zz_per_comp, samp, mcux, mcuy, w, h, dcs, acs, nc):
    """4-stage scan script: DC(Al=1) -> AC first(Al=1) per comp ->
    DC refine -> AC refine per comp. EOB runs are not accumulated across
    blocks (EOB0 per block), which the standard Annex K tables encode."""
    out = bytearray()
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def comp_blocks(ci):
        """Block indices of component ci in row-major ceil-grid order
        (the non-interleaved scan order of T.81 A.2.2)."""
        sh, sv = samp[ci]
        zz, bpr = zz_per_comp[ci]
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        bw_ = -(-cw // 8)
        bh_ = -(-ch // 8)
        return [by * bpr + bx for by in range(bh_) for bx in range(bw_)]

    # --- scan 1: DC first, interleaved, Al=1 ---------------------------
    out += _sos_header([(ci + 1, 0x00 if ci == 0 else 0x10) for ci in range(nc)],
                       0, 0, 0, 1)
    bw2 = _BitWriter()
    preds = [0] * nc
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            zz, bpr = zz_per_comp[ci]
            codes, sizes = dcs[0] if ci == 0 else dcs[1]
            for v in range(sv):
                for hh in range(sh):
                    bi = (my * sv + v) * bpr + (mx * sh + hh)
                    val = int(zz[bi][0]) >> 1  # arithmetic point transform
                    diff = val - preds[ci]
                    preds[ci] = val
                    if diff == 0:
                        bw2.put(int(codes[0]), int(sizes[0]))
                    else:
                        s = abs(diff).bit_length()
                        bw2.put(int(codes[s]), int(sizes[s]))
                        bw2.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    bw2.flush()
    out += bw2.out

    # --- scans 2..: AC first, per component, Al=1 ----------------------
    for ci in range(nc):
        out += _sos_header([(ci + 1, 0x00 if ci == 0 else 0x11)], 1, 63, 0, 1)
        codes, sizes = acs[0] if ci == 0 else acs[1]
        zz, _bpr = zz_per_comp[ci]
        bw2 = _BitWriter()
        for bi in comp_blocks(ci):
            blk = zz[bi]
            run = 0
            emitted_any = False
            for k in range(1, 64):
                c = int(blk[k])
                t = (abs(c) >> 1)
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    bw2.put(int(codes[0xF0]), int(sizes[0xF0]))
                    run -= 16
                s = t.bit_length()
                bw2.put(int(codes[(run << 4) | s]), int(sizes[(run << 4) | s]))
                tv = t if c > 0 else -t
                bw2.put(tv if tv > 0 else tv + (1 << s) - 1, s)
                run = 0
                emitted_any = True
            if run > 0 or not emitted_any:
                bw2.put(int(codes[0x00]), int(sizes[0x00]))  # EOB0
        bw2.flush()
        out += bw2.out

    # --- DC refinement (no Huffman: one raw bit per block) -------------
    out += _sos_header([(ci + 1, 0x00) for ci in range(nc)], 0, 0, 1, 0)
    bw2 = _BitWriter()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            zz, bpr = zz_per_comp[ci]
            for v in range(sv):
                for hh in range(sh):
                    bi = (my * sv + v) * bpr + (mx * sh + hh)
                    bw2.put(int(zz[bi][0]) & 1, 1)
    bw2.flush()
    out += bw2.out

    # --- AC refinement, per component, Ah=1 Al=0 -----------------------
    for ci in range(nc):
        out += _sos_header([(ci + 1, 0x00 if ci == 0 else 0x11)], 1, 63, 1, 0)
        codes, sizes = acs[0] if ci == 0 else acs[1]
        zz, _bpr = zz_per_comp[ci]
        bw2 = _BitWriter()
        for bi in comp_blocks(ci):
            blk = zz[bi]
            absv = [abs(int(blk[k])) for k in range(64)]
            eob = 0  # position after the last newly-significant coef
            for k in range(1, 64):
                if absv[k] == 1:
                    eob = k
            run = 0
            pending: list[int] = []
            for k in range(1, 64):
                t = absv[k]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    bw2.put(int(codes[0xF0]), int(sizes[0xF0]))
                    run -= 16
                    for b in pending:
                        bw2.put(b, 1)
                    pending = []
                if t > 1:  # history-nonzero: buffer the correction bit
                    pending.append(t & 1)
                    continue
                bw2.put(int(codes[(run << 4) | 1]), int(sizes[(run << 4) | 1]))
                bw2.put(1 if int(blk[k]) > 0 else 0, 1)
                for b in pending:
                    bw2.put(b, 1)
                pending = []
                run = 0
            if run > 0 or pending:
                bw2.put(int(codes[0x00]), int(sizes[0x00]))  # EOB0
                for b in pending:
                    bw2.put(b, 1)
        bw2.flush()
        out += bw2.out
    return bytes(out)


def is_jfif(buf: bytes) -> bool:
    """True for real JPEG bytes (SOI marker), False for GSJ1/other."""
    return len(buf) >= 2 and buf[0] == 0xFF and buf[1] == 0xD8
