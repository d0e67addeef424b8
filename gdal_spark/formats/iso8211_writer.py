"""ISO/IEC 8211 writer (the counterpart of ``formats.iso8211``).

Emits spec-conformant DDF files from the same (labels, formats)
field model the reader parses: a DDR whose data descriptive fields
carry field controls, names, ``!``-separated labels and format
controls, followed by DRs with computed leaders/directories. Binary
subfields use the same ``b1w``/``b2w`` little-endian forms and
``B(n)`` bitfields; ASCII subfields are unit-terminated when
variable. Lexical level 2 strings are UCS-2LE with the two-byte
0x1F00 terminator (as the reader expects).

Reference parity target: frmts/iso8211 DDFModule write support —
re-derived from the ISO/IEC 8211:1994 standard, no reference code.
"""

from __future__ import annotations

FT = b"\x1e"
UT = b"\x1f"


class FieldSpec:
    """One data descriptive field: tag + name + subfield model."""

    def __init__(self, tag, name, labels, formats, repeating=False,
                 controls="1600;&   "):
        self.tag = tag
        self.name = name
        self.labels = labels      # list of label strings
        self.formats = formats    # format-control string "(...)"
        self.repeating = repeating
        self.controls = controls


def _leader(reclen, leader_id, field_control_len, base, sizes):
    sl, sp, st = sizes
    ldr = (f"{reclen:05d}".encode() +
           (b"3" if leader_id == b"L" else b" ") +
           leader_id +
           (b"E" if leader_id == b"L" else b" ") +
           b"1" +
           b" " +
           (f"{field_control_len:02d}".encode() if leader_id == b"L"
            else b"  ") +
           f"{base:05d}".encode() +
           b" ! " +
           str(sl).encode() + str(sp).encode() + b"0" +
           str(st).encode())
    assert len(ldr) == 24
    return ldr


def _directory(entries, sizes):
    sl, sp, st = sizes
    out = b""
    for tag, length, pos in entries:
        out += (tag.ljust(st).encode() +
                f"{length:0{sl}d}".encode() +
                f"{pos:0{sp}d}".encode())
    return out + FT


def _dir_sizes(entries):
    maxlen = max((ln for _, ln, _ in entries), default=0)
    maxpos = max((p for _, _, p in entries), default=0)
    sl = max(len(str(maxlen)), 1)
    sp = max(len(str(maxpos)), 1)
    return sl, sp, 4


def build_ddr(field_specs, field_tree):
    """FieldSpec list + (parent, child) tag pairs -> DDR bytes."""
    # field 0000: file control field
    tree = b"".join(p.ljust(4).encode() + c.ljust(4).encode()
                    for p, c in field_tree)
    f0000 = b"0000;&   " + UT + tree + FT
    fields = [("0000", f0000)]
    for fs in field_specs:
        body = (fs.controls.encode() + fs.name.encode() + UT +
                (("*" if fs.repeating else "") +
                 "!".join(fs.labels)).encode() + UT +
                fs.formats.encode() + FT)
        fields.append((fs.tag, body))
    entries = []
    pos = 0
    for tag, body in fields:
        entries.append((tag, len(body), pos))
        pos += len(body)
    sizes = _dir_sizes(entries)
    dirbytes = _directory(entries, sizes)
    base = 24 + len(dirbytes)
    total = base + pos
    return (_leader(total, b"L", 9, base, sizes) + dirbytes +
            b"".join(b for _, b in fields))


def encode_subfields(spec: FieldSpec, groups, lexical=1):
    """List of value dicts -> field data bytes (incl. trailing FT)."""
    from .iso8211 import parse_format_controls

    fmts = parse_format_controls(spec.formats)
    out = bytearray()
    for gi, g in enumerate(groups):
        for label, (kind, width) in zip(spec.labels, fmts):
            v = g.get(label)
            if kind == "A":
                s = "" if v is None else str(v)
                if lexical >= 2:
                    b = s.encode("utf-16-le")
                    if width is None:
                        out += b + UT + b"\x00"
                    else:
                        out += b[:width * 2].ljust(width * 2, b" ")
                else:
                    b = s.encode("latin-1", "replace")
                    if width is None:
                        out += b + UT
                    else:
                        out += b[:width].ljust(width, b" ")
            elif kind == "B":
                b = bytes(v or b"")
                out += b[:width].ljust(width, b"\x00")
            else:
                iv = int(v or 0)
                out += iv.to_bytes(width, "little",
                                   signed=(kind == "bs"))
        if not spec.repeating:
            break
    out += FT
    return bytes(out)


def build_dr(field_data):
    """[(tag, bytes)] -> one DR."""
    entries = []
    pos = 0
    for tag, body in field_data:
        entries.append((tag, len(body), pos))
        pos += len(body)
    sizes = _dir_sizes(entries)
    dirbytes = _directory(entries, sizes)
    base = 24 + len(dirbytes)
    total = base + pos
    return (_leader(total, b"D", 0, base, sizes) + dirbytes +
            b"".join(b for _, b in field_data))
