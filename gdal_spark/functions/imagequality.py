"""Image quality metrics + perceptual DCT hash — the image-side
curation operators of a training-data pipeline (blur/exposure/contrast
gating before captioning or CLIP scoring, and the pHash column the
near-dup blocking joins on).

Kernels are pure numpy (documented formulas, validated by closed-form
cases in tests); the distributed path is ONE mapInPandas pass that
decodes each image once and emits every metric together — at 10^12
images the decode dominates, so metrics that share the decode are free.

Metrics (per image):
- brightness      mean of the BT.601 luma (0..255)
- rms_contrast    std of the luma (Peli 1990's RMS contrast, unnormalized)
- laplacian_var   variance of the 4-neighbour Laplacian of the luma —
                  the standard blur detector (higher = sharper)
- entropy_bits    Shannon entropy of the 256-bin luma histogram
- colorfulness    Hasler & Süsstrunk 2003 metric M3:
                  sqrt(σ_rg²+σ_yb²) + 0.3·sqrt(μ_rg²+μ_yb²); 0 for gray
- phash           64-bit perceptual DCT hash: luma -> 32x32 block-mean
                  resize -> orthonormal 2-D DCT-II -> 8x8 low-frequency
                  block minus DC -> median threshold -> bits, MSB first
                  (row-major), returned as SIGNED int64 (matches the
                  input-table phash column convention)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def to_gray(arr: np.ndarray) -> np.ndarray:
    """BT.601 luma as float64; band 0 for single-band images."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2 or a.shape[2] == 1:
        return a if a.ndim == 2 else a[:, :, 0]
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def laplacian_var(gray: np.ndarray) -> float:
    """Variance of the 4-neighbour Laplacian over the interior (valid
    convolution region); 0.0 for images smaller than 3x3."""
    g = np.asarray(gray, dtype=np.float64)
    if g.shape[0] < 3 or g.shape[1] < 3:
        return 0.0
    lap = (
        g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:]
        - 4.0 * g[1:-1, 1:-1]
    )
    return float(lap.var())


def entropy_bits(gray: np.ndarray) -> float:
    """Shannon entropy (bits) of the 256-bin histogram of the luma
    rounded to integers (clipped to [0, 255])."""
    q = np.clip(np.rint(np.asarray(gray, dtype=np.float64)), 0, 255)
    counts = np.bincount(q.astype(np.int64).ravel(), minlength=256)
    p = counts[counts > 0] / counts.sum()
    return float(-(p * np.log2(p)).sum())


def colorfulness(arr: np.ndarray) -> float:
    """Hasler & Süsstrunk (SPIE 2003) colorfulness M3. 0 for <3 bands."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2 or a.shape[2] < 3:
        return 0.0
    rg = a[:, :, 0] - a[:, :, 1]
    yb = 0.5 * (a[:, :, 0] + a[:, :, 1]) - a[:, :, 2]
    return float(
        np.hypot(rg.std(), yb.std())
        + 0.3 * np.hypot(rg.mean(), yb.mean())
    )


def _block_mean_32(gray: np.ndarray) -> np.ndarray:
    """32x32 block-mean resize (area average over the integer pixel
    grid — each output cell averages its [floor] index range, matching
    the fixtures.phash64 block construction)."""
    g = np.asarray(gray, dtype=np.float64)
    h, w = g.shape
    ys = (np.arange(33) * h) // 32
    xs = (np.arange(33) * w) // 32
    out = np.empty((32, 32))
    for by in range(32):
        y0, y1 = ys[by], max(ys[by] + 1, ys[by + 1])
        row = g[y0:y1]
        for bx in range(32):
            x0, x1 = xs[bx], max(xs[bx] + 1, xs[bx + 1])
            out[by, bx] = row[:, x0:x1].mean()
    return out


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2.0 * i + 1.0) * k / (2.0 * n))
        m *= np.sqrt(2.0 / n)
        m[0] *= np.sqrt(0.5)
        _DCT32 = m
    return _DCT32


def dct_phash(arr: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64)."""
    small = _block_mean_32(to_gray(arr))
    m = _dct_matrix(32)
    d = m @ small @ m.T
    block = d[:8, :8].copy().ravel()
    vals = block[1:]  # drop the DC term from the median, standard pHash
    med = np.median(vals)
    bits = block > med
    bits[0] = False  # DC bit pinned (excluded from comparison energy)
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def quality_record(arr: np.ndarray, round_to: int = 4) -> dict:
    """All metrics of one decoded image (the shared-decode kernel)."""
    g = to_gray(arr)
    return {
        "brightness": round(float(g.mean()), round_to),
        "rms_contrast": round(float(g.std()), round_to),
        "laplacian_var": round(laplacian_var(g), round_to),
        "entropy_bits": round(entropy_bits(g), round_to),
        "colorfulness": round(colorfulness(arr), round_to),
        "phash": dct_phash(arr),
    }


_SCHEMA = (
    "image_id string, brightness double, rms_contrast double, "
    "laplacian_var double, entropy_bits double, colorfulness double, "
    "phash long"
)


def image_quality(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    round_to: int = 4,
) -> DataFrame:
    """One row per image with every metric — ONE Arrow pass, one decode
    per image, no shuffle (narrow stage over the source scan)."""
    import pandas as pd

    cols = [id_col, bytes_col, fmt_col]

    def run(batches):
        from gdal_spark import codecs

        for pdf in batches:
            rows = []
            for iid, buf, fmt in zip(
                pdf[id_col], pdf[bytes_col], pdf[fmt_col]
            ):
                arr = codecs.decode_image(bytes(buf), str(fmt))
                rec = quality_record(np.atleast_3d(arr), round_to)
                rec["image_id"] = str(iid)
                rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "brightness", "rms_contrast",
                    "laplacian_var", "entropy_bits", "colorfulness", "phash",
                ],
            )

    return df.select(*cols).mapInPandas(run, schema=_SCHEMA)
