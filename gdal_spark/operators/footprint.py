"""Data-driven footprint: valid-data mask -> polygon, per image.

Reference: apps/gdal_footprint_lib.cpp:88-183 (gdal footprint): build a
0/1 mask from the alpha band (or nodata test on a band), polygonize it,
optionally densify/simplify, output in a target CRS.

Spark shape: a footprint is strictly per-image, so this is a NARROW
mapInPandas pass (no shuffle at all): decode once, mask, label the mask
with the polygonize union-find, chain boundary rings, transform corners
through the image geotransform. min_ring_area and simplify_tolerance
mirror -minringarea / -simplify of the reference CLI.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs, geom
from ..booleans import assemble_polygons
from .polygonize import boundary_segments, chain_rings, label_components, _px_ring_to_geo
from .vector import simplify_ring

OUT_SCHEMA = (
    "image_id string, n_regions int, wkb binary, minx double, miny double, "
    "maxx double, maxy double, area double, valid_frac double"
)


def footprint_array(
    arr: np.ndarray,
    alpha: np.ndarray | None,
    gt,
    nodata: float | None = None,
    min_ring_area: float = 0.0,
    simplify_tolerance: float | None = None,
    convex_hull: bool = False,
):
    """Footprint polygons of one decoded image. Mask rule: alpha > 0 if
    an alpha plane exists, else band0 != nodata (nodata defaults to 0).

    Returns (polys, n_regions, valid_frac)."""
    if alpha is not None:
        mask = alpha > 0
    else:
        nd = 0.0 if nodata is None else float(nodata)
        band0 = arr[:, :, 0] if arr.ndim == 3 else arr
        mask = band0 != nd
    valid_frac = float(mask.mean()) if mask.size else 0.0
    if not mask.any():
        return [], 0, valid_frac
    labels, n = label_components(mask.astype(np.uint8), exclude=(0,))
    segs = boundary_segments(labels)
    rings = []
    for lab in range(1, n + 1):
        rings.extend(chain_rings(segs[lab]))
    geo_rings = []
    for r in rings:
        gr = _px_ring_to_geo(r, gt)
        if simplify_tolerance is not None:
            gr = simplify_ring(gr, simplify_tolerance)
        a, _c = geom.ring_area_centroid(gr)
        if abs(a) >= min_ring_area and len(gr) >= 4:
            geo_rings.append(gr)
    polys = assemble_polygons(geo_rings)
    if convex_hull and polys:
        # gdal footprint -convex_hull (apps/gdal_footprint_lib.cpp:88-183):
        # hull of the assembled footprint geometry, holes discarded
        from .hull import convex_hull_xy

        h = convex_hull_xy(np.vstack([r for rings in polys for r in rings]))
        if len(h) >= 3:
            polys = [[np.vstack([h, h[:1]])]]
    return polys, n, valid_frac


def footprint_images(
    images: DataFrame,
    nodata: float | None = None,
    min_ring_area: float = 0.0,
    simplify_tolerance: float | None = None,
    convex_hull: bool = False,
) -> DataFrame:
    """One footprint row per image (narrow stage, no shuffle)."""

    def do(batches):
        cols = [
            "image_id", "n_regions", "wkb", "minx", "miny", "maxx", "maxy",
            "area", "valid_frac",
        ]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                alpha = arr[:, :, 3] if arr.shape[2] == 4 else None
                gt = (r.gt0, r.gt1, r.gt2, r.gt3, r.gt4, r.gt5)
                polys, n, vf = footprint_array(
                    arr, alpha, gt, nodata, min_ring_area, simplify_tolerance,
                    convex_hull,
                )
                if not polys:
                    continue
                area, _c = geom.polygon_area_centroid(polys)
                allc = np.vstack([rr for rings in polys for rr in rings])
                rows.append(
                    {
                        "image_id": r.image_id,
                        "n_regions": int(n),
                        "wkb": geom.wkb_multipolygon(polys),
                        "minx": float(allc[:, 0].min()),
                        "miny": float(allc[:, 1].min()),
                        "maxx": float(allc[:, 0].max()),
                        "maxy": float(allc[:, 1].max()),
                        "area": float(area),
                        "valid_frac": vf,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return images.mapInPandas(do, schema=OUT_SCHEMA)
