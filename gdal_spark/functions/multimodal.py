"""Multimodal binary columns: typed metadata + decode/transform plumbing.

Images (our own png/raw/jpg codecs) decode for real; external formats the
container lacks libraries for (jpeg via libjpeg, audio, video) are STUBBED
behind NotImplementedError or a deterministic fake — the Spark-side
contract (schema, Arrow batch shape, partitioning) is real and tested, so
swapping a real decoder in changes one function body, not the pipeline.

All transforms run in mapInPandas: one Arrow batch of binary payloads in,
one batch out; batch size is capped by session.py's
arrow.maxRecordsPerBatch so a batch of 256x256 RGB rows stays ~25 MB.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import codecs

METADATA_SCHEMA = (
    "modality string, width int, height int, channels int, "
    "n_bytes long, ok boolean"
)


def probe_metadata(buf: bytes, fmt: str) -> dict:
    """Header-only probe (no full decode) — the GDALOpenEx identify step
    (gcore/gdaldataset.cpp:3642 driver probing)."""
    try:
        if fmt == "png" and buf[:8] == codecs.PNG_SIG:
            w, h, depth, color = struct.unpack(">IIBB", buf[16:26])
            c = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
            return dict(modality="image", fmt=fmt, width=w, height=h, channels=c,
                        n_bytes=len(buf), ok=True)
        if fmt == "raw" and buf[:4] == b"GSRW":
            w, h, c, _ = struct.unpack_from("<IIIB", buf, 4)
            return dict(modality="image", fmt=fmt, width=w, height=h, channels=c,
                        n_bytes=len(buf), ok=True)
        if fmt == "jpg" and buf[:4] == b"GSJ1":
            w, h, c, _ = struct.unpack_from("<IIIB", buf, 4)
            return dict(modality="image", fmt=fmt, width=w, height=h, channels=c,
                        n_bytes=len(buf), ok=True)
        if fmt in ("wav", "mp3", "flac"):
            return dict(modality="audio", fmt=fmt, width=0, height=0, channels=0,
                        n_bytes=len(buf), ok=True)
        if fmt in ("mp4", "webm", "mkv"):
            return dict(modality="video", fmt=fmt, width=0, height=0, channels=0,
                        n_bytes=len(buf), ok=True)
    except Exception:
        pass
    return dict(modality="unknown", fmt=fmt, width=0, height=0, channels=0,
                n_bytes=len(buf), ok=False)


def decode_any(buf: bytes, fmt: str) -> np.ndarray:
    """Decode dispatch. External formats raise NotImplementedError — STUB:
    a real deployment plugs libjpeg/ffmpeg here; the Spark plumbing
    (batching, schema, partitioning) is identical either way."""
    if fmt in ("png", "raw", "jpg"):
        return codecs.decode_image(buf, fmt)
    raise NotImplementedError(
        f"decoder for fmt={fmt!r} not available in this container (stub)"
    )


def fake_audio_features(buf: bytes, n_mels: int = 16) -> np.ndarray:
    """Deterministic fake audio feature extractor (STUB for a mel
    spectrogram): statistics of the raw bytes, reproducible anywhere."""
    b = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    if len(b) == 0:
        return np.zeros(n_mels)
    chunks = np.array_split(b, n_mels)
    return np.array([c.mean() for c in chunks])


def with_metadata(df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt"):
    """Attach typed metadata struct columns via one Arrow pass."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    full_schema = schema + ", " + METADATA_SCHEMA

    def probe(batches):
        for pdf in batches:
            metas = [
                probe_metadata(bytes(b), f)
                for b, f in zip(pdf[bytes_col], pdf[fmt_col])
            ]
            mdf = pd.DataFrame(metas).drop(columns=["fmt"])  # source has fmt
            yield pd.concat([pdf.reset_index(drop=True), mdf], axis=1)

    return df.mapInPandas(probe, schema=full_schema)


def image_resize(
    df: DataFrame,
    out_w: int,
    out_h: int,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    resampling: str = "bilinear",
    out_fmt: str = "png",
):
    """Uniform thumbnail/resize over a mixed-format image table — the
    standard pre-training normalization pass. Narrow stage, one decode +
    resize + encode per row inside Arrow batches."""
    from ..resample import resize as _resize

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def do(batches):
        for pdf in batches:
            new_bytes = []
            new_fmt = []
            for b, f in zip(pdf[bytes_col], pdf[fmt_col]):
                try:
                    arr = decode_any(bytes(b), f)
                except NotImplementedError:
                    new_bytes.append(None)
                    new_fmt.append(f)
                    continue
                out = _resize(arr.astype(np.float64), out_h, out_w, resampling)
                out = np.clip(np.round(out), 0, 255).astype(np.uint8)
                if out_fmt == "jpg" and out.ndim == 3 and out.shape[2] == 4:
                    out = out[:, :, :3]
                new_bytes.append(codecs.encode_image(out, out_fmt))
                new_fmt.append(out_fmt)
            pdf = pdf.copy()
            pdf[bytes_col] = new_bytes
            pdf[fmt_col] = new_fmt
            if "w" in pdf.columns:
                pdf["w"] = out_w
            if "h" in pdf.columns:
                pdf["h"] = out_h
            yield pdf

    return df.mapInPandas(do, schema=schema)


def frame_sample_plumbing(
    df: DataFrame, every_n: int = 30, bytes_col: str = "bytes"
):
    """Video frame-sampling PLUMBING: emits one row per sampled frame with
    a deterministic fake frame payload (decode stub). Demonstrates the
    1->N explode shape (row group stays in one Arrow batch)."""
    schema = "video_id string, frame_idx int, frame binary"

    def do(batches):
        for pdf in batches:
            rows = []
            id_col = "image_id" if "image_id" in pdf.columns else pdf.columns[0]
            for vid, b in zip(pdf[id_col], pdf[bytes_col]):
                n = max(1, len(bytes(b)) // (every_n * 1024))
                for i in range(min(n, 8)):
                    # STUB: a real impl decodes frame i*every_n via ffmpeg
                    fake = bytes(np.frombuffer(bytes(b)[:64], dtype=np.uint8))
                    rows.append({"video_id": str(vid), "frame_idx": i * every_n,
                                 "frame": fake})
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "frame"])

    return df.mapInPandas(do, schema=schema)
