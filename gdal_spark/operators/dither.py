"""Median-cut palette + Floyd-Steinberg dither (rgb2pct / pct2rgb).

Reference: alg/gdalmediancut.cpp (GDALComputeMedianCutPCT) +
alg/gdaldither.cpp (GDALDitherRGB2PCT, Floyd-Steinberg error
diffusion with the 7/16, 3/16, 5/16, 1/16 kernel).

Palette computation is a global operation: the distributed form samples
colors per partition (one Arrow pass), merges the (tiny) per-partition
histograms on the driver, and broadcasts the palette — the standard
two-phase global-statistic shape. Quantization/dither then runs per
image in a narrow pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs
from ..checksum import gdal_checksum


def median_cut_palette(colors: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """Median-cut over an (n, 3) color sample -> (k, 3) uint8 palette.
    Boxes split on their widest channel at the median until ``n_colors``
    boxes exist; each box yields its mean color."""
    c = np.asarray(colors, dtype=np.float64).reshape(-1, 3)
    if len(c) == 0:
        return np.zeros((1, 3), dtype=np.uint8)
    boxes = [c]
    while len(boxes) < n_colors:
        # split the box with the largest (count * widest-range) first
        widths = [b.ptp(axis=0).max() if len(b) > 1 else 0.0 for b in boxes]
        i = int(np.argmax([w * len(b) for w, b in zip(widths, boxes)]))
        b = boxes[i]
        if len(b) < 2 or widths[i] == 0:
            break
        ch = int(b.ptp(axis=0).argmax())
        order = np.argsort(b[:, ch], kind="stable")
        half = len(b) // 2
        boxes[i] = b[order[:half]]
        boxes.insert(i + 1, b[order[half:]])
    pal = np.array([b.mean(axis=0) for b in boxes if len(b)])
    return np.clip(np.round(pal), 0, 255).astype(np.uint8)


def nearest_palette_index(pixels: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Index of the nearest palette entry per pixel (squared-distance
    argmin, vectorized)."""
    p = np.asarray(pixels, dtype=np.float64).reshape(-1, 3)
    pal = np.asarray(palette, dtype=np.float64)
    d = ((p[:, None, :] - pal[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def dither_array(rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Floyd-Steinberg error diffusion to palette indices — the serpentine-
    free left-to-right scan of gdaldither.cpp with the classic
    7/16 right, 3/16 down-left, 5/16 down, 1/16 down-right kernel."""
    img = np.asarray(rgb, dtype=np.float64).copy()
    h, w = img.shape[:2]
    pal = np.asarray(palette, dtype=np.float64)
    out = np.zeros((h, w), dtype=np.uint8)
    # error flows rightward within a row, so the scan is inherently
    # serial per pixel (the reference's C loop has the same dependency)
    for y in range(h):
        for x in range(w):
            old = img[y, x]
            i = int(((old[None, :] - pal) ** 2).sum(axis=1).argmin())
            out[y, x] = i
            err = old - pal[i]
            if x + 1 < w:
                img[y, x + 1] += err * (7 / 16)
            if y + 1 < h:
                if x > 0:
                    img[y + 1, x - 1] += err * (3 / 16)
                img[y + 1, x] += err * (5 / 16)
                if x + 1 < w:
                    img[y + 1, x + 1] += err * (1 / 16)
    return out


def quantize_array(rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Nearest-color quantization (no dithering) to palette indices."""
    h, w = rgb.shape[:2]
    return nearest_palette_index(rgb, palette).reshape(h, w).astype(np.uint8)


def compute_palette(
    images: DataFrame, n_colors: int = 256, sample_per_image: int = 2048
) -> np.ndarray:
    """Distributed palette: sample pixels per image in one Arrow pass
    (deterministic stride sampling), merge samples, median-cut on the
    driver (GDALComputeMedianCutPCT over the whole table)."""

    def sample(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 2:
                    arr = np.repeat(arr[:, :, None], 3, axis=2)
                flat = arr[:, :, :3].reshape(-1, 3)
                step = max(1, len(flat) // sample_per_image)
                for px in flat[::step][:sample_per_image]:
                    rows.append(
                        {"r": int(px[0]), "g": int(px[1]), "b": int(px[2])}
                    )
            yield pd.DataFrame(rows, columns=["r", "g", "b"])

    sampled = images.mapInPandas(sample, schema="r int, g int, b int")
    pdf = sampled.toPandas()
    return median_cut_palette(pdf[["r", "g", "b"]].to_numpy(), n_colors)


def rgb_to_pct(
    images: DataFrame,
    palette: np.ndarray,
    dither: bool = True,
) -> DataFrame:
    """Quantize every image to the (broadcast) palette, with or without
    Floyd-Steinberg dithering; emits index rasters + checksums."""
    pal = np.asarray(palette, dtype=np.uint8)

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 2:
                    arr = np.repeat(arr[:, :, None], 3, axis=2)
                rgb = arr[:, :, :3]
                idx = dither_array(rgb, pal) if dither else quantize_array(rgb, pal)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(idx.shape[1]), "h": int(idx.shape[0]),
                        "data": idx.tobytes(),
                        "checksum": gdal_checksum(idx.astype(np.float64)),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "w", "h", "data", "checksum"]
            )

    return images.mapInPandas(
        do, schema="image_id string, w int, h int, data binary, checksum int"
    )


def pct_to_rgb(index_rasters: DataFrame, palette: np.ndarray) -> DataFrame:
    """Expand palette-index rasters back to RGB (pct2rgb analog): one
    fancy-index per image inside an Arrow pass; emits PNG bytes +
    per-band checksum sum. Inverse of :func:`rgb_to_pct` up to the
    palette quantization error."""
    pal = np.asarray(palette, dtype=np.uint8)

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                idx = np.frombuffer(bytes(r.data), dtype=np.uint8).reshape(
                    int(r.h), int(r.w)
                )
                rgb = pal[idx]
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(r.w), "h": int(r.h),
                        "bytes": codecs.encode_png(rgb),
                        "checksum": int(
                            sum(gdal_checksum(rgb[:, :, c].astype(np.float64))
                                for c in range(3)) % 65536
                        ),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "w", "h", "bytes", "checksum"]
            )

    return index_rasters.mapInPandas(
        do, schema="image_id string, w int, h int, bytes binary, checksum int"
    )
