"""NASA/JPL VICAR image driver.

Reference semantics: frmts/pds/vicardataset.cpp (the published VICAR
file format, https://www-mipl.jpl.nasa.gov/external/VICAR_file_fmt.pdf):

- the label is a stream of ``KEY=VALUE`` tokens separated by spaces;
  values are bare words, ``'quoted strings'`` (with ``''`` doubling),
  or ``(comma,lists)``; ``LBLSIZE`` comes first and gives the label
  byte length. ``PROPERTY='NAME'`` / ``TASK='NAME'`` switch the
  current group, so later keys address as ``NAME.KEY`` (the
  reference's ``GetKeyword("MAP.MAP_SCALE")`` style). ``EOL=1``
  appends a second label at ``LBLSIZE + RECSIZE*(NLB + N2*N3)``
  merged first-wins under the primary;
- dims NL/NS/NB with ORG BSQ / BIL / BIP; ``RECSIZE = NBB +
  N1*itemsize`` where NBB is a per-record binary prefix and NLB
  whole binary-header records precede the pixels;
- FORMAT BYTE/HALF(WORD)/FULL(LONG)/REAL/DOUB/COMP with INTFMT
  LOW/HIGH, REALFMT RIEEE (little) / IEEE (big) / VAX (VAX F- and
  D-float, converted on read; COMP = two reals per pixel);
- truncated files zero-fill past EOF (RawRasterBand semantics — the
  test_vicar_truncated georef fixture is 97% missing);
- COMPRESS BASIC / BASIC2: per-record bit-packed delta/run coding
  (vicardataset.cpp basic_decode, re-derived): 3-bit codes 0..6 are
  deltas -3..+3 off the running value, code 7 + 1 bit selects an
  8-bit literal (0) or (1) a run whose length is 4 bits, escaping to
  4+8 bits (run 15 -> +15), then to 24 bits (255), followed by the
  repeated value (3-bit delta or 8-bit literal); multi-byte types
  code each byte plane separately within the record (wid =
  itemsize). BASIC prefixes every record with its uint32 LE size
  (self-inclusive); BASIC2 packs all record sizes right after the
  label;
- georef from the MAP property via the same published offset
  pipeline as PDS3 (shift 0.5, sample mult -1, line mult +1):
  ``gt0 = (SAMPLE_PROJECTION_OFFSET+0.5) * scale * -1`` with
  ``scale = MAP_SCALE*1000``; projection/target/radii carried as a
  structured metadata string (georef = columns by design);
- nodata only for known instruments (BLTYPE M94_HRSC or
  INSTRUMENT_ID FC2): 0 / -32768 / -32768.0 by type; DTM products
  override via DTM.DTM_MISSING_DN and carry DTM_SCALING_FACTOR /
  DTM_OFFSET as band scale/offset; HRSC scale/offset come from
  DLRTO8.REFLECTANCE_SCALING_FACTOR falling back to HRCAL.

Spark shape: one task per file both ways (VICAR products are
single-file artifacts); the sink is the usual task-per-row writer
emitting uncompressed BSQ with the label padded to a RECSIZE
multiple.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ._util import local_path

_FORMATS = {
    "BYTE": ("u1", 1), "HALF": ("i2", 2), "WORD": ("i2", 2),
    "FULL": ("i4", 4), "LONG": ("i4", 4), "REAL": ("f4", 4),
    "DOUB": ("f8", 8), "COMP": ("c8", 8), "COMPLEX": ("c8", 8),
}


def _tokenize(text: str):
    """VICAR label text -> (key, value) pairs. Values keep their
    quotes stripped ('' -> ')."""
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i] in " \t\r\n\0":
            i += 1
        if i >= n:
            break
        eq = text.find("=", i)
        if eq < 0:
            break
        key = text[i:eq].strip()
        i = eq + 1
        while i < n and text[i] in " \t":
            i += 1
        if i >= n:
            break
        c = text[i]
        if c == "'":
            # quoted, '' doubles
            j = i + 1
            out = []
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        out.append("'")
                        j += 2
                        continue
                    j += 1
                    break
                out.append(text[j])
                j += 1
            val = "".join(out)
            i = j
        elif c == "(":
            depth = 0
            j = i
            while j < n:
                if text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                elif text[j] == "'":
                    k = text.find("'", j + 1)
                    j = k if k > 0 else n - 1
                j += 1
            val = text[i:j]
            i = j
        else:
            j = i
            while j < n and text[j] not in " \t\r\n\0":
                j += 1
            val = text[i:j]
            i = j
        if key:
            yield key, val


def parse_vicar_label(buf: bytes):
    """Primary (+EOL) label -> flat {dotted.key: value} dict, first
    wins. Group-less system keys are stored bare; PROPERTY/TASK keys
    get their group name as prefix."""
    head = buf[:200].decode("ascii", "replace")
    if not head.startswith("LBLSIZE"):
        raise ValueError("not a VICAR file (no LBLSIZE)")
    lblsize = int(head.split("=", 1)[1].split()[0])
    kv: dict[str, str] = {}
    prefix = ""
    for key, val in _tokenize(
            buf[:lblsize].decode("ascii", "replace")):
        ku = key.upper()
        if ku in ("PROPERTY", "TASK"):
            prefix = val.strip().upper()
            continue
        kv.setdefault(prefix + "." + ku if prefix else ku, val)
    return kv, lblsize


def _merge_eol(kv, lblsize, buf):
    if kv.get("EOL", "0").strip() != "1":
        return kv
    recsize = int(kv.get("RECSIZE", "0"))
    nlb = int(kv.get("NLB", "0"))
    n2 = int(kv.get("N2", "0"))
    n3 = int(kv.get("N3", "1"))
    off = lblsize + recsize * (nlb + n2 * n3)
    if off >= len(buf) or not buf[off:off + 7] == b"LBLSIZE":
        return kv
    ekv, _ = parse_vicar_label(buf[off:])
    for k, v in ekv.items():
        kv.setdefault(k, v)
    return kv


def _vax_f(words: np.ndarray) -> np.ndarray:
    """uint16 word pairs (w0, w1) -> float64 (VAX F-float)."""
    v = (words[0::2].astype(np.uint32) << 16) | words[1::2]
    sign = np.where(v >> 31, -1.0, 1.0)
    exp = (v >> 23) & 0xFF
    man = (v & 0x7FFFFF).astype(np.float64)
    out = sign * (0.5 + man / (1 << 24)) * np.exp2(
        exp.astype(np.float64) - 128.0)
    return np.where(exp == 0, 0.0, out)


def _vax_d(words: np.ndarray) -> np.ndarray:
    """uint16 word quads -> float64 (VAX D-float)."""
    v = ((words[0::4].astype(np.uint64) << 48)
         | (words[1::4].astype(np.uint64) << 32)
         | (words[2::4].astype(np.uint64) << 16)
         | words[3::4].astype(np.uint64))
    sign = np.where(v >> np.uint64(63), -1.0, 1.0)
    exp = ((v >> np.uint64(55)) & np.uint64(0xFF)).astype(np.float64)
    man = (v & np.uint64((1 << 55) - 1)).astype(np.float64)
    out = sign * (0.5 + man / float(1 << 56)) * np.exp2(exp - 128.0)
    return np.where(exp == 0, 0.0, out)


class _BitReader:
    __slots__ = ("buf", "pos", "bit")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.bit = 0

    def grab(self, nbit: int) -> int:
        buf, pos, bit = self.buf, self.pos, self.bit
        shift = 8 - nbit - bit
        if pos >= len(buf):
            raise ValueError("BASIC: out of decoding buffer")
        mask = (1 << nbit) - 1
        if shift > 0:
            self.bit = bit + nbit
            return (buf[pos] >> shift) & mask
        if shift < 0:
            v1 = buf[pos] & ((1 << (nbit + shift)) - 1)
            pos += 1
            if pos >= len(buf):
                raise ValueError("BASIC: out of decoding buffer")
            v2 = (buf[pos] >> (8 + shift)) & ((1 << -shift) - 1)
            self.pos = pos
            self.bit = -shift
            return ((v1 << -shift) + v2) & 0xFF
        self.pos = pos + 1
        self.bit = 0
        return buf[pos] & mask


_DELTAS = (-3, -2, -1, 0, 1, 2, 3)


def basic_decode(code: bytes, ns: int, wid: int) -> bytearray:
    """One compressed record -> ns*wid raw little-endian bytes
    (byte-plane interleaved decode, re-derived from the published
    algorithm in vicardataset.cpp basic_decode)."""
    buf = bytearray(ns * wid)
    rd = _BitReader(code)
    run = -3
    nval = 999999
    old = 0
    ptop = ns * wid
    for iw in range(wid):
        for ip in range(iw, ptop, wid):
            if run > -3:
                buf[ip] = nval & 0xFF
                run -= 1
                continue
            val = rd.grab(3)
            if val < 7:
                nval = (old + _DELTAS[val]) & 0xFFFFFFFF
                buf[ip] = nval & 0xFF
                old = nval
                continue
            if rd.grab(1):
                rc = rd.grab(4)
                if rc == 15:
                    rc = rd.grab(8)
                    if rc == 255:
                        run = (rd.grab(8) | (rd.grab(8) << 8)
                               | (rd.grab(8) << 16))
                    else:
                        run = rc + 15
                else:
                    run = rc
                val = rd.grab(3)
                if val < 7:
                    nval = (old + _DELTAS[val]) & 0xFFFFFFFF
                else:
                    nval = rd.grab(8)
                buf[ip] = nval & 0xFF
                old = nval
            else:
                val = rd.grab(8)
                buf[ip] = val
                old = val
    return buf


def _read_basic(buf, kv, lblsize, nl, ns, nb, itemsize, compress):
    """BASIC / BASIC2 compressed records -> raw (nb, nl, ns*itemsize)
    little-endian bytes."""
    recsize = int(kv.get("RECSIZE", "0"))
    nlb = int(kv.get("NLB", "0"))
    img_off = lblsize + nlb * recsize
    nrec = nl * nb
    out = bytearray(nrec * ns * itemsize)
    if compress == "BASIC":
        off = img_off
        for rec in range(nrec):
            size = struct.unpack_from("<I", buf, off)[0]
            data = buf[off + 4:off + size]
            out[rec * ns * itemsize:(rec + 1) * ns * itemsize] = (
                basic_decode(data, ns, itemsize))
            off += size
    else:  # BASIC2
        sizes = np.frombuffer(buf, "<u4", count=nrec, offset=img_off)
        off = img_off + 4 * nrec
        for rec in range(nrec):
            data = buf[off:off + int(sizes[rec])]
            out[rec * ns * itemsize:(rec + 1) * ns * itemsize] = (
                basic_decode(data, ns, itemsize))
            off += int(sizes[rec])
    return bytes(out)


def _num(kv, key, default=0.0):
    v = kv.get(key)
    if v is None or v == "":
        return default
    try:
        return float(v)
    except ValueError:
        return default


def parse_vicar(buf: bytes):
    """VICAR bytes -> (arr (h, w) or (h, w, nb) north-up native
    dtype, gt-or-None, nodata, scale, offset, proj-string)."""
    kv, lblsize = parse_vicar_label(buf)
    kv = _merge_eol(kv, lblsize, buf)
    nl = int(kv.get("NL", "0"))
    ns = int(kv.get("NS", "0"))
    nb = int(kv.get("NB", "1") or "1")
    if nl <= 0 or ns <= 0 or nb <= 0:
        raise ValueError("VICAR: bad NL/NS/NB")
    fmt = kv.get("FORMAT", "").strip().upper()
    if fmt not in _FORMATS:
        raise ValueError(f"VICAR: unknown FORMAT {fmt!r}")
    code, itemsize = _FORMATS[fmt]
    org = kv.get("ORG", "BSQ").strip().upper() or "BSQ"
    intfmt = kv.get("INTFMT", "LOW").strip().upper() or "LOW"
    realfmt = kv.get("REALFMT", "VAX").strip().upper() or "VAX"
    compress = (kv.get("COMPRESS", "NONE").strip().upper()
                or "NONE")
    is_int = fmt in ("BYTE", "HALF", "WORD", "FULL", "LONG")
    vax = (not is_int) and realfmt == "VAX"
    if is_int:
        endian = "<" if intfmt == "LOW" else ">"
    else:
        # RIEEE = little-endian IEEE, IEEE = big-endian IEEE
        endian = "<" if realfmt == "RIEEE" else ">"

    nbb = int(kv.get("NBB", "0"))
    nlb = int(kv.get("NLB", "0"))
    n1 = int(kv.get("N1", "0")) or {
        "BSQ": ns, "BIL": ns, "BIP": nb}[org]
    recsize = int(kv.get("RECSIZE", "0")) or (nbb + n1 * itemsize)

    if compress in ("BASIC", "BASIC2"):
        if org != "BSQ":
            raise ValueError("VICAR BASIC compression requires BSQ")
        raw = _read_basic(buf, kv, lblsize, nl, ns, nb, itemsize,
                          compress)
        flat = np.frombuffer(raw, "<" + code if itemsize > 1 else code)
        arr = flat.reshape(nb, nl, ns).transpose(1, 2, 0)
    else:
        # records of recsize bytes; zero-fill truncated files
        nrec = {"BSQ": nb * nl, "BIL": nl * nb, "BIP": nl * ns}[org]
        start = lblsize + nlb * recsize
        need = nrec * recsize
        data = buf[start:start + need]
        if len(data) < need:
            data = data + b"\0" * (need - len(data))
        rows = np.frombuffer(data, np.uint8).reshape(nrec, recsize)
        # dims come from NL/NS/NB; RECSIZE may be wider than the
        # pixel payload (the reference reads NS pixels per record
        # regardless — pinned by test_vicar_truncated's N1 != NS)
        rec_items = {"BSQ": ns, "BIL": ns, "BIP": nb}[org]
        body = rows[:, nbb:nbb + rec_items * itemsize]
        if vax:
            words = np.ascontiguousarray(body).reshape(-1).view("<u2")
            if fmt == "REAL":
                flat = _vax_f(words).astype(np.float32)
            elif fmt == "DOUB":
                flat = _vax_d(words)
            elif fmt == "COMP":
                f = _vax_f(words).astype(np.float32)
                flat = f[0::2] + 1j * f[1::2]
            else:
                raise ValueError("VICAR: VAX integer format")
        else:
            flat = np.ascontiguousarray(body).reshape(-1).view(
                endian + code)
        if org == "BSQ":
            arr = flat.reshape(nb, nl, ns).transpose(1, 2, 0)
        elif org == "BIL":
            arr = flat.reshape(nl, nb, ns).transpose(0, 2, 1)
        else:  # BIP
            arr = flat.reshape(nl, ns, nb)
    arr = np.ascontiguousarray(arr[:, :, 0] if nb == 1 else arr)
    if arr.dtype.byteorder not in ("=", "|"):
        arr = arr.astype(arr.dtype.newbyteorder("="))

    # georef from the MAP property (PDS default offset pipeline)
    gt = None
    scale_v = _num(kv, "MAP.MAP_SCALE", 0.0)
    if scale_v:
        dim = scale_v * 1000.0
        samp = _num(kv, "MAP.SAMPLE_PROJECTION_OFFSET", None)
        line = _num(kv, "MAP.LINE_PROJECTION_OFFSET", None)
        if samp is not None and line is not None:
            ulx = (samp + 0.5) * dim * -1.0
            uly = (line + 0.5) * dim * 1.0
            gt = (ulx, dim, 0.0, uly, 0.0, -dim)
    proj = "|".join([
        kv.get("MAP.MAP_PROJECTION_TYPE", "").strip(),
        kv.get("MAP.TARGET_NAME", "").strip(),
        kv.get("MAP.A_AXIS_RADIUS", "").strip(),
        kv.get("MAP.C_AXIS_RADIUS", "").strip(),
        kv.get("MAP.CENTER_LONGITUDE", "").strip(),
        kv.get("MAP.CENTER_LATITUDE", "").strip(),
    ])

    # nodata / band scaling (instrument-gated like the reference)
    nodata = None
    bltype = kv.get("BLTYPE", "").strip().upper()
    inst = kv.get("INSTRUMENT_ID", "").strip().upper()
    if bltype == "M94_HRSC" or inst == "FC2":
        nodata = {"u1": 0.0, "i2": -32768.0, "f4": -32768.0}.get(code)
    bscale, boffset = 1.0, 0.0
    if kv.get("DTM.DTM_OFFSET") is not None:
        bscale = _num(kv, "DTM.DTM_SCALING_FACTOR", 1.0)
        boffset = _num(kv, "DTM.DTM_OFFSET", 0.0)
        nd = kv.get("DTM.DTM_MISSING_DN")
        if nd is not None:
            nodata = float(nd)
    elif bltype == "M94_HRSC":
        bscale = _num(kv, "DLRTO8.REFLECTANCE_SCALING_FACTOR", -1.0)
        if bscale < 0:
            bscale = _num(kv, "HRCAL.REFLECTANCE_SCALING_FACTOR", 1.0)
        boffset = _num(kv, "DLRTO8.REFLECTANCE_OFFSET", -1.0)
        if boffset < 0:
            boffset = _num(kv, "HRCAL.REFLECTANCE_OFFSET", 0.0)
    return arr, gt, nodata, bscale, boffset, proj


_WFORMATS = {"u1": "BYTE", "i2": "HALF", "i4": "FULL",
             "f4": "REAL", "f8": "DOUB"}


def format_vicar(arr: np.ndarray, gt=None, target: str = "MARS") -> bytes:
    """North-up (h, w[, nb]) array -> uncompressed BSQ VICAR bytes
    (little-endian, LBLSIZE padded to a RECSIZE multiple like the
    reference writer)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    code = arr.dtype.str.lstrip("<>=|")
    if code not in _WFORMATS:
        raise ValueError(f"VICAR writer: unsupported dtype {arr.dtype}")
    fmt = _WFORMATS[code]
    itemsize = arr.dtype.itemsize
    recsize = w * itemsize
    items = [
        "FORMAT='%s'" % fmt, "TYPE='IMAGE'", "BUFSIZ=%d" % (recsize,),
        "DIM=3", "EOL=0", "RECSIZE=%d" % recsize, "ORG='BSQ'",
        "NL=%d" % h, "NS=%d" % w, "NB=%d" % nb,
        "N1=%d" % w, "N2=%d" % h, "N3=%d" % nb, "N4=0",
        "NBB=0", "NLB=0", "HOST='X86-64-LINX'", "INTFMT='LOW'",
        "REALFMT='RIEEE'", "BHOST='X86-64-LINX'", "BINTFMT='LOW'",
        "BREALFMT='RIEEE'", "BLTYPE=''", "COMPRESS='NONE'",
        "EOCI1=0", "EOCI2=0",
    ]
    if gt is not None and gt[1]:
        if gt[2] or gt[4] or gt[5] >= 0:
            raise ValueError("VICAR writer: north-up grids only")
        dim = float(gt[1])
        samp = -float(gt[0]) / dim - 0.5
        line = float(gt[3]) / dim - 0.5
        items += [
            "PROPERTY='MAP'",
            "TARGET_NAME='%s'" % target,
            "MAP_PROJECTION_TYPE='SINUSOIDAL'",
            "MAP_SCALE=%r" % (dim / 1000.0,),
            "CENTER_LONGITUDE=0.0", "CENTER_LATITUDE=0.0",
            "SAMPLE_PROJECTION_OFFSET=%r" % samp,
            "LINE_PROJECTION_OFFSET=%r" % line,
        ]
    body = "  ".join(items)
    # LBLSIZE=x is itself part of the label; pad to recsize multiple
    for guess in range(1, 100):
        lblsize = guess * recsize
        head = "LBLSIZE=%d" % lblsize + "  " + body
        if len(head) <= lblsize:
            break
    else:
        raise ValueError("VICAR writer: label does not fit")
    label = head.ljust(lblsize, " ").encode("ascii")
    data = np.ascontiguousarray(
        arr.transpose(2, 0, 1)).astype(
            "<" + code, copy=False).tobytes()
    return label + data


def scan_vicar(spark, path_glob: str, srid: int = 0):
    """Glob of .vic files -> images-table rows, one task per file.
    Extra columns: scale / offset / proj (planetary CRS carried as
    structured metadata, georef = columns by design)."""
    import glob as _glob

    import pandas as pd

    from .. import codecs

    pat = local_path(path_glob)
    paths = (sorted(_glob.glob(pat))
             if any(ch in pat for ch in "*?[") else [pat])
    if not paths:
        raise FileNotFoundError(path_glob)
    tdf = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in paths],
                                       len(paths)),
        "path string",
    )
    schema = ("image_id string, bytes binary, w int, h int, "
              "fmt string, gt0 double, gt1 double, gt2 double, "
              "gt3 double, gt4 double, gt5 double, srid int, "
              "nodata double, scale double, offset double, "
              "proj string")

    def read_files(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                with open(r.path, "rb") as f:
                    buf = f.read()
                arr, gt, nodata, bscale, boffset, proj = parse_vicar(buf)
                if np.iscomplexobj(arr):
                    # complex -> 2-channel (re, im) float32 raster
                    arr = np.stack([arr.real, arr.imag],
                                   axis=-1).astype(np.float32)
                if gt is None:
                    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
                stem = os.path.splitext(os.path.basename(r.path))[0]
                rows.append({
                    "image_id": stem,
                    "bytes": codecs.encode_raw(arr),
                    "w": arr.shape[1], "h": arr.shape[0], "fmt": "raw",
                    "gt0": gt[0], "gt1": gt[1], "gt2": gt[2],
                    "gt3": gt[3], "gt4": gt[4], "gt5": gt[5],
                    "srid": int(srid), "nodata": nodata,
                    "scale": bscale, "offset": boffset, "proj": proj,
                })
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "gt0",
                         "gt1", "gt2", "gt3", "gt4", "gt5", "srid",
                         "nodata", "scale", "offset", "proj"],
            )

    return tdf.mapInPandas(read_files, schema=schema)


def write_vicar(df, out_dir: str, target: str = "MARS") -> list[str]:
    """Images-table rows -> one uncompressed BSQ .vic per row,
    written by the task that holds the row."""
    import pandas as pd

    from .. import codecs

    out_dir = local_path(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def dump(batches):
        for pdf in batches:
            names = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                gt = tuple(float(getattr(r, f"gt{i}")) for i in range(6))
                path = os.path.join(out_dir, f"{r.image_id}.vic")
                with open(path, "wb") as f:
                    f.write(format_vicar(arr, gt, target=target))
                names.append(path)
            yield pd.DataFrame({"path": names})

    return [
        r.path
        for r in df.mapInPandas(dump, schema="path string").collect()
    ]
