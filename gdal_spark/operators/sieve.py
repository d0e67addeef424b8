"""Sieve filter: remove raster polygons smaller than a threshold.

Reference: alg/gdalsievefilter.cpp (GDALSieveFilter): connected regions
(4/8) smaller than ``threshold`` pixels merge into their largest
neighbouring polygon, repeating until no small polygon remains (the
reference's "merge into largest neighbour" rule, gdalsievefilter.cpp
comment block + RPolygon merge logic).

``sieve_array`` is the exact single-array kernel; ``sieve_images`` runs
it per image row (narrow mapInPandas — images are whole rows in the
table, so no cross-tile state is needed). For tiled rasters, compose
the polygonize global-labeling pass with a driver-side merge of the
(tiny) region graph — the building blocks live in operators/polygonize.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs
from ..checksum import gdal_checksum
from .polygonize import label_components


def _region_adjacency(labels: np.ndarray, connect8: bool):
    adj: dict[int, set] = defaultdict(set)

    def link(a: np.ndarray, b: np.ndarray):
        diff = a != b
        for x, y in zip(a[diff].ravel(), b[diff].ravel()):
            adj[int(x)].add(int(y))
            adj[int(y)].add(int(x))

    link(labels[:, :-1], labels[:, 1:])
    link(labels[:-1, :], labels[1:, :])
    if connect8:
        link(labels[:-1, :-1], labels[1:, 1:])
        link(labels[:-1, 1:], labels[1:, :-1])
    return adj


def sieve_array(
    arr: np.ndarray, threshold: int, connect8: bool = False
) -> np.ndarray:
    """Exact sieve of one array: small regions merge into their largest
    neighbour until none below ``threshold`` remain."""
    labels, n = label_components(arr, connect8, exclude=None)
    if n <= 1:
        return np.asarray(arr).copy()
    sizes = np.bincount(labels.ravel(), minlength=n + 1).astype(np.int64)
    adj = _region_adjacency(labels, connect8)
    # region -> current merge target (path-compressed)
    target = list(range(n + 1))

    def find(x: int) -> int:
        while target[x] != x:
            target[x] = target[target[x]]
            x = target[x]
        return x

    # process smallest regions first (the reference iterates smallest-up)
    changed = True
    while changed:
        changed = False
        order = sorted(
            (int(sizes[find(r)]), find(r)) for r in range(1, n + 1)
        )
        seen = set()
        for sz, r in order:
            if r in seen or sz >= threshold:
                continue
            seen.add(r)
            # neighbours in the CURRENT merged graph
            neigh = {find(x) for x in adj[r]} - {r}
            if not neigh:
                continue
            best = max(neigh, key=lambda x: (int(sizes[x]), -x))
            sizes[best] += sizes[r]
            sizes[r] = 0
            target[r] = best
            adj[best] |= adj[r]
            changed = True

    final = np.array([find(r) for r in range(n + 1)], dtype=np.int64)
    merged = final[labels]
    # value of each surviving region = value of any of its original pixels
    out = np.asarray(arr).copy()
    # pick one representative pixel per surviving region
    flat_lab = merged.ravel()
    flat_val = np.asarray(arr).ravel()
    rep_val = {}
    # representative = value at the FIRST pixel (row-major) of the
    # surviving region's own (pre-merge) area
    own = final[labels] == labels  # pixels whose region survived as itself
    oy, ox = np.nonzero(own)
    seen_lab = set()
    for y, x in zip(oy, ox):
        L = merged[y, x]
        if L not in seen_lab:
            rep_val[L] = np.asarray(arr)[y, x]
            seen_lab.add(L)
    out = np.array([rep_val[L] for L in flat_lab]).reshape(merged.shape)
    return out.astype(np.asarray(arr).dtype)


def sieve_images(
    images: DataFrame, threshold: int, connect8: bool = False
) -> DataFrame:
    """Per-image sieve (narrow stage): band 0, re-emitted with checksum."""

    def do(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_image(bytes(r.bytes), r.fmt)
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                out = sieve_array(arr, threshold, connect8)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(out.shape[1]), "h": int(out.shape[0]),
                        "data": out.astype(np.float64).tobytes(),
                        "checksum": gdal_checksum(out.astype(np.float64)),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "w", "h", "data", "checksum"]
            )

    return images.mapInPandas(
        do, schema="image_id string, w int, h int, data binary, checksum int"
    )
