"""Buffer: polygon dilation/erosion by a distance.

Reference: OGRGeometry::Buffer -> GEOS buffer (exact arc construction).
This engine computes a GRID-APPROXIMATE buffer: rasterize the feature
onto a local grid at ``resolution``, take the exact Euclidean distance
transform, threshold at the buffer distance, and polygonize the result
back to rings. The boundary error is bounded by ~1 grid cell
(``resolution``), uniformly — pick resolution = |dist| / 16 (default)
for ~6% worst-case radial error, or pass a finer one.

Positive dist dilates (round joins fall out of the EDT disc by
construction); negative dist erodes. Runs per feature in a narrow
mapInPandas pass — no shuffle; the grid is local to the feature's
envelope, so memory is O(((w + 2d) / res)^2) per feature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import geom
from ..booleans import assemble_polygons
from .distance import edt
from .polygonize import boundary_segments, chain_rings, label_components
from .rasterize import fill_spans

MAX_GRID = 2048


def buffer_polys(polys, dist: float, resolution: float | None = None):
    """Grid-approximate buffer of one polygon list. Returns a polygon
    list (ring lists) or [] if the result is empty."""
    if not polys:
        return []
    allc = np.vstack([r for rings in polys for r in rings])
    minx, miny = allc[:, 0].min(), allc[:, 1].min()
    maxx, maxy = allc[:, 0].max(), allc[:, 1].max()
    pad = abs(dist) * 1.5 + 1e-9
    if resolution is None:
        resolution = max(abs(dist) / 16.0, (maxx - minx + maxy - miny + 2 * pad) / MAX_GRID)
    res = float(resolution)
    gx0, gy1 = minx - pad, maxy + pad
    w = min(MAX_GRID, int(np.ceil((maxx - minx + 2 * pad) / res)) + 1)
    h = min(MAX_GRID, int(np.ceil((maxy - miny + 2 * pad) / res)) + 1)
    gt = (gx0, res, 0.0, gy1, 0.0, -res)

    mask = np.zeros((h, w), dtype=bool)
    for rings in polys:
        rings_px = [
            np.stack(
                [(r[:, 0] - gt[0]) / gt[1], (r[:, 1] - gt[3]) / gt[5]], axis=1
            )
            for r in rings
        ]
        mask |= fill_spans(rings_px, h, w)
    if dist >= 0:
        if mask.any():
            d = edt(mask)
            keep = mask | (d * res <= dist)
        else:
            return []
    else:
        if not mask.any():
            return []
        d = edt(~mask)
        keep = mask & (d * res > -dist)
    if not keep.any():
        return []
    labels, n = label_components(keep.astype(np.uint8), exclude=(0,))
    segs = boundary_segments(labels)
    rings = []
    for lab in range(1, n + 1):
        rings.extend(chain_rings(segs[lab]))
    geo_rings = []
    for r in rings:
        x = gt[0] + r[:, 0] * gt[1]
        y = gt[3] + r[:, 1] * gt[5]
        gr = np.stack([x, y], axis=1)[::-1].copy()  # restore orientation (y flip)
        geo_rings.append(gr)
    return assemble_polygons(geo_rings)


def buffer_features(
    df: DataFrame, dist: float, resolution: float | None = None
) -> DataFrame:
    """ogr2ogr/`gdal vector buffer` analog: buffer every feature; fully
    eroded features drop. Schema preserved + refreshed envelopes."""

    def do(batches):
        for pdf in batches:
            keep_idx = []
            wkbs = []
            envs = []
            for i, b in enumerate(pdf["wkb"]):
                g = geom.parse_wkb(bytes(b))
                out = buffer_polys(g.polygons(), dist, resolution)
                if not out:
                    continue
                keep_idx.append(i)
                wkbs.append(geom.wkb_multipolygon(out))
                allc = np.vstack([r for rings in out for r in rings])
                envs.append(
                    (float(allc[:, 0].min()), float(allc[:, 1].min()),
                     float(allc[:, 0].max()), float(allc[:, 1].max()))
                )
            sub = pdf.iloc[keep_idx].copy()
            sub["wkb"] = wkbs
            if envs:
                e = np.array(envs)
                sub["minx"], sub["miny"], sub["maxx"], sub["maxy"] = (
                    e[:, 0], e[:, 1], e[:, 2], e[:, 3]
                )
            yield sub

    from pyspark.sql.types import StructType

    return df.mapInPandas(do, schema=StructType(df.schema.fields))
