"""gdalcompare analog: distributed golden-vs-new raster comparison.

Reference: swig/python/gdal-utils/osgeo_utils/gdalcompare.py —
``compare_band`` checks size, then the GDAL checksum; only when checksums
differ does it scan pixels to report ``Pixels Differing`` (count of
non-zero golden-new deltas, computed in float64) and ``Maximum Pixel
Difference`` (max |delta|).  ``find_diff`` returns the total number of
differences found.  This module re-expresses that as ONE cogrouped Arrow
pass: both tables are grouped by image id, each group decodes its golden
and new payload once, and emits one row per band — no pixel bytes ever
cross a shuffle boundary (only the two source scans), so the comparison
of 10^12 images is a single co-partitioned pass.

Additions over the reference: a PSNR column (the north-rule lossy gate is
PSNR>=40, so the comparator should measure it natively) and explicit
match booleans so downstream filters stay in Catalyst.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum

OUT_SCHEMA = (
    "image_id string, band int, w_golden int, h_golden int, "
    "w_new int, h_new int, size_match boolean, "
    "checksum_golden long, checksum_new long, checksum_match boolean, "
    "diff_count long, max_diff double, psnr double, found_diff int"
)

_COLS = [f.split(" ")[0] for f in OUT_SCHEMA.split(", ")]


def _bands(arr: np.ndarray):
    """Yield (band_index, 2-D band) for a (h,w) or (h,w,b) array."""
    if arr.ndim == 2:
        yield 1, arr
        return
    for b in range(arr.shape[2]):
        yield b + 1, arr[:, :, b]


def compare_arrays(golden: np.ndarray, new: np.ndarray) -> list[dict]:
    """Local kernel: per-band comparison rows (gdalcompare.compare_band
    semantics). Band counts may differ — extra bands on either side are
    reported as found_diff rows with the missing side nulled."""
    g = {b: band for b, band in _bands(np.asarray(golden))}
    n = {b: band for b, band in _bands(np.asarray(new))}
    rows = []
    for b in sorted(set(g) | set(n)):
        gb, nb = g.get(b), n.get(b)
        row = dict.fromkeys(_COLS)
        row["band"] = b
        found = 0
        if gb is not None:
            row["h_golden"], row["w_golden"] = (int(v) for v in gb.shape)
            row["checksum_golden"] = gdal_checksum(gb)
        if nb is not None:
            row["h_new"], row["w_new"] = (int(v) for v in nb.shape)
            row["checksum_new"] = gdal_checksum(nb)
        if gb is None or nb is None:
            row["size_match"] = row["checksum_match"] = False
            row["found_diff"] = 1
            rows.append(row)
            continue
        row["size_match"] = gb.shape == nb.shape
        if not row["size_match"]:
            found += 1
        row["checksum_match"] = row["checksum_golden"] == row["checksum_new"]
        if not row["checksum_match"]:
            found += 1
        if row["size_match"]:
            # float64 delta scan, as compare_image_pixels does line-wise
            d = gb.astype(np.float64) - nb.astype(np.float64)
            row["diff_count"] = int(np.count_nonzero(d))
            row["max_diff"] = float(np.abs(d).max()) if d.size else 0.0
            row["psnr"] = codecs.psnr(gb, nb)
        row["found_diff"] = found
        rows.append(row)
    return rows


def compare_images(
    golden_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "image_id",
) -> DataFrame:
    """Distributed comparison of two image tables on (id_col, bytes, fmt).

    Cogroup brings each image's golden and new payload to one task
    exactly once (no bytes-vs-bytes join row duplication); decode happens
    Arrow-batch-side; the output is a narrow per-band stats table that
    aggregates/filters entirely in the JVM.  Scale: one shuffle per
    input on id_col, output rows ~ 4x image count.
    """
    g = golden_df.select(id_col, "bytes", "fmt")
    n = new_df.select(id_col, "bytes", "fmt")

    def compare_group(gpdf: pd.DataFrame, npdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        # ids are expected unique per table; if a duplicate sneaks in,
        # keep the FIRST occurrence deterministically (dict insertion
        # order preserves the frame order) rather than an arbitrary one
        gmap, nmap = {}, {}
        for r in gpdf.itertuples(index=False):
            gmap.setdefault(r.image_id, (bytes(r.bytes), r.fmt))
        for r in npdf.itertuples(index=False):
            nmap.setdefault(r.image_id, (bytes(r.bytes), r.fmt))
        for iid in sorted(set(gmap) | set(nmap)):
            if iid not in gmap or iid not in nmap:
                row = dict.fromkeys(_COLS)
                row.update(image_id=iid, band=0, size_match=False,
                           checksum_match=False, found_diff=1)
                rows.append(row)
                continue
            gbuf, gfmt = gmap[iid]
            nbuf, nfmt = nmap[iid]
            # a format difference is ONE image-level finding (counted on
            # the first band row only), matching find_diff's single
            # driver/format difference — not one per band
            fmt_diff = 0 if gfmt == nfmt else 1
            for row in compare_arrays(
                codecs.decode_image(gbuf, gfmt), codecs.decode_image(nbuf, nfmt)
            ):
                row["image_id"] = iid
                row["found_diff"] += fmt_diff
                fmt_diff = 0
                rows.append(row)
        return pd.DataFrame(rows, columns=_COLS)

    gg = g.withColumnRenamed(id_col, "image_id")
    nn = n.withColumnRenamed(id_col, "image_id")
    return (
        gg.groupBy("image_id")
        .cogroup(nn.groupBy("image_id"))
        .applyInPandas(compare_group, schema=OUT_SCHEMA)
    )
