"""Deterministic image augmentation for training-data pipelines.

The vision-training counterpart of the text-side curation operators
(quality metrics, dedup, packing): multiply the images table by a list of
augmentation ops — flips, quarter rotations, seeded crops — in ONE
Arrow pass per partition (decode once, apply every op, re-encode). The
reference has no augmentation; this is a beyond-reference LLM-pipeline
component, but it reuses the engine's own codecs and checksum oracle.

Determinism contract (the property a 10^12-row pipeline needs for
resumability): "random" crops are seeded by xxhash-style mixing of
(image_id, seed) — re-running the job, at any parallelism, reproduces
byte-identical outputs, so snapshot resume and golden checksums work.

Scale shape: a narrow mapInPandas stage (no shuffle, no driver state);
output is one row per (image, op) — the fan-out is explicit in the row
count, never in duplicated bytes before the transform.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .. import codecs
from ..checksum import gdal_checksum

OPS = ("identity", "flip_h", "flip_v", "rot90", "rot180", "rot270",
       "random_crop", "center_crop")

OUT_SCHEMA = (
    "image_id string, op string, bytes binary, w int, h int, fmt string, "
    "checksum int"
)


def _crop_offsets(image_id: str, seed: int, max_y: int, max_x: int):
    """Deterministic pseudo-random crop origin from (image_id, seed)."""
    d = hashlib.sha256(f"{image_id}|{seed}".encode()).digest()
    oy = int.from_bytes(d[:8], "little") % (max_y + 1)
    ox = int.from_bytes(d[8:16], "little") % (max_x + 1)
    return oy, ox


def apply_op(arr: np.ndarray, op: str, image_id: str = "", seed: int = 0,
             crop: tuple[int, int] | None = None) -> np.ndarray:
    """One augmentation on an (h, w[, c]) array. Flips/rotations are
    numpy views; crops validate bounds loudly."""
    if op == "identity":
        return arr
    if op == "flip_h":
        return arr[:, ::-1]
    if op == "flip_v":
        return arr[::-1]
    if op == "rot90":
        return np.rot90(arr, 1)
    if op == "rot180":
        return np.rot90(arr, 2)
    if op == "rot270":
        return np.rot90(arr, 3)
    if op in ("random_crop", "center_crop"):
        if crop is None:
            raise ValueError(f"{op} requires crop=(h, w)")
        ch, cw = crop
        h, w = arr.shape[:2]
        if ch > h or cw > w:
            raise ValueError(f"crop {crop} exceeds image ({h}, {w})")
        if op == "center_crop":
            oy, ox = (h - ch) // 2, (w - cw) // 2
        else:
            oy, ox = _crop_offsets(image_id, seed, h - ch, w - cw)
        return arr[oy:oy + ch, ox:ox + cw]
    raise ValueError(f"unknown augmentation op {op!r} (choose from {OPS})")


def augment_images(images, ops=("flip_h", "rot90"), crop=None, seed: int = 0,
                   out_fmt: str = "png"):
    """One output row per (image, op): decode once, apply every op,
    re-encode, with the engine's GDAL checksum per result (band 0)."""
    for op in ops:
        if op not in OPS:
            raise ValueError(f"unknown augmentation op {op!r}")
    ops = tuple(ops)

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                squeeze = arr.ndim == 2
                if squeeze:
                    arr = arr[:, :, None]
                for op in ops:
                    out = apply_op(arr, op, str(r.image_id), seed, crop)
                    out = np.ascontiguousarray(out)
                    enc = codecs.encode_image(
                        out[:, :, 0] if squeeze else out, out_fmt
                    )
                    # the checksum contract is decode(bytes) -> checksum
                    # (what a resume verifier recomputes); for lossy
                    # out_fmt that differs from the pre-encode array, so
                    # checksum what the STORED bytes decode to
                    if out_fmt in ("jpg", "jpeg"):
                        ck_arr = codecs.decode_image(enc, out_fmt)
                        if ck_arr.ndim == 2:
                            ck_arr = ck_arr[:, :, None]
                    else:
                        ck_arr = out
                    rows.append({
                        "image_id": r.image_id,
                        "op": op,
                        "bytes": enc,
                        "w": int(out.shape[1]),
                        "h": int(out.shape[0]),
                        "fmt": out_fmt,
                        "checksum": int(
                            gdal_checksum(ck_arr[:, :, 0].astype(np.float64))
                        ),
                    })
            yield pd.DataFrame(
                rows,
                columns=["image_id", "op", "bytes", "w", "h", "fmt",
                         "checksum"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        do, schema=OUT_SCHEMA
    )
