"""Multimodal binary columns: typed metadata + decode/transform plumbing.

Images (our own png/raw/jpg codecs) and WAV audio (own RIFF/PCM16 codec
+ FFT band features, below) decode FOR REAL; formats needing external
libraries the container lacks (libjpeg jpeg, mp3/flac, video containers)
are STUBBED behind NotImplementedError or a deterministic fake — the
Spark-side contract (schema, Arrow batch shape, partitioning) is real
and tested, so swapping a real decoder in changes one function body,
not the pipeline.

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


# ---------------------------------------------------------------------------
# WAV (RIFF / PCM16) — a real audio codec, pure struct + numpy
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """PCM16 WAV writer. samples: (n,) or (n, channels) int16/float
    (floats in [-1, 1] are scaled)."""
    s = np.asarray(samples)
    if s.dtype.kind == "f":
        s = np.clip(np.round(s * 32767.0), -32768, 32767)
    s = s.astype("<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, c = s.shape
    data = s.tobytes()
    byte_rate = rate * c * 2
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, c, rate, byte_rate, c * 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(buf: bytes):
    """PCM16 WAV reader -> (samples (n, channels) int16, rate). Walks
    RIFF chunks, so extra chunks (LIST etc.) are tolerated."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos = 12
    rate = None
    channels = None
    bits = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_tag != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    s = np.frombuffer(data, dtype="<i2")
    return s.reshape(-1, channels), int(rate)


def audio_features(buf: bytes, n_bands: int = 16) -> dict:
    """REAL audio features from a PCM16 WAV: duration, RMS, zero-crossing
    rate, and log band energies from an rFFT magnitude spectrum split
    into ``n_bands`` equal bands (the mel-spectrogram stand-in, fully
    deterministic numpy)."""
    samples, rate = decode_wav(buf)
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    dur = n / rate if rate else 0.0
    rms = float(np.sqrt((mono**2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    if n:
        mag = np.abs(np.fft.rfft(mono))
        bands = np.array_split(mag, n_bands)
        band_energy = np.log1p(np.array([float((b**2).sum()) for b in bands]))
    else:
        band_energy = np.zeros(n_bands)
    return {
        "rate": rate, "n_samples": n, "channels": samples.shape[1],
        "duration": dur, "rms": rms, "zcr": zcr,
        "band_energy": band_energy,
    }

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
        if fmt in ("jpg", "jpeg") and buf[:4] == b"GSJ1":
            w, h, c, _ = struct.unpack_from("<IIIB", buf, 4)
            return dict(modality="image", fmt=fmt, width=w, height=h, channels=c,
                        n_bytes=len(buf), ok=True)
        if fmt in ("jpg", "jpeg") and buf[:2] == b"\xff\xd8":
            # real JFIF/JPEG: walk markers to SOFn for dims (header-only)
            i = 2
            while i < len(buf) - 9:
                if buf[i] != 0xFF:
                    i += 1
                    continue
                m = buf[i + 1]
                if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7 or m == 0xFF:
                    i += 2 if m != 0xFF else 1
                    continue
                if m in (0xC0, 0xC1, 0xC2):
                    h = (buf[i + 5] << 8) | buf[i + 6]
                    w = (buf[i + 7] << 8) | buf[i + 8]
                    c = buf[i + 9]
                    return dict(modality="image", fmt=fmt, width=w, height=h,
                                channels=c, n_bytes=len(buf), ok=True)
                if m in (0xDA, 0xD9):
                    break
                i += 2 + ((buf[i + 2] << 8) | buf[i + 3])
            return dict(modality="image", fmt=fmt, width=0, height=0, channels=0,
                        n_bytes=len(buf), ok=False)
        if fmt == "wav" and buf[:4] == b"RIFF":
            # real header parse: channels from fmt chunk, width=n_samples
            pos = 12
            channels = 0
            nsamp = 0
            while pos + 8 <= len(buf):
                cid = buf[pos : pos + 4]
                (size,) = struct.unpack_from("<I", buf, pos + 4)
                if cid == b"fmt ":
                    _t, channels = struct.unpack_from("<HH", buf, pos + 8)
                elif cid == b"data" and channels:
                    nsamp = size // (2 * channels)
                pos += 8 + size + (size & 1)
            return dict(modality="audio", fmt=fmt, width=nsamp, height=1,
                        channels=channels, n_bytes=len(buf), ok=True)
        if fmt in ("mp3", "flac"):
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
    """Decode dispatch. png/raw/jpg images and wav audio decode for
    real; the rest raise NotImplementedError — STUB: a real deployment
    plugs libjpeg/ffmpeg here; the Spark plumbing (batching, schema,
    partitioning) is identical either way."""
    if fmt in ("png", "raw", "jpg", "jpeg"):
        return codecs.decode_image(buf, fmt)
    if fmt == "wav":
        samples, _rate = decode_wav(buf)
        return samples
    raise NotImplementedError(
        f"decoder for fmt={fmt!r} not available in this container (stub)"
    )


def fake_audio_features(buf: bytes, n_mels: int = 16) -> np.ndarray:
    """Deterministic fake feature extractor for NON-wav audio formats
    (mp3/flac decode needs external libs — stub): statistics of the raw
    bytes, reproducible anywhere. For wav use :func:`audio_features`."""
    b = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    if len(b) == 0:
        return np.zeros(n_mels)
    chunks = np.array_split(b, n_mels)
    return np.array([c.mean() for c in chunks])


AUDIO_FEATURES_SCHEMA = (
    "rate int, n_samples long, channels int, duration double, rms double, "
    "zcr double, band_energy array<double>"
)


def with_audio_features(
    df: DataFrame, bytes_col: str = "bytes", n_bands: int = 16
) -> DataFrame:
    """Real per-row WAV feature extraction in one Arrow pass: appends
    rate/n_samples/channels/duration/rms/zcr/band_energy columns."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    full_schema = schema + ", " + AUDIO_FEATURES_SCHEMA

    def do(batches):
        for pdf in batches:
            feats = []
            for b in pdf[bytes_col]:
                f = audio_features(bytes(b), n_bands)
                f["band_energy"] = f["band_energy"].tolist()
                feats.append(f)
            yield pd.concat(
                [pdf.reset_index(drop=True), pd.DataFrame(feats)], axis=1
            )

    return df.mapInPandas(do, schema=full_schema)


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
                except Exception:
                    # data-cleaning semantics: one corrupt/truncated
                    # buffer (or a stub format) null-pads its row rather
                    # than failing the whole normalization pass
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
