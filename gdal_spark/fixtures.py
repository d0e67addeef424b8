"""Deterministic synthetic fixtures: the images table, vector features, kNN
points. Every pixel is recomputable from ``image_id`` alone (FIXTURES.md §1),
so correctness checks never need stored goldens for decode parity.

Modeled on the reference's canonical fixtures:
- ``autotest/gcore/data/byte.tif`` (20x20 uint8, UTM-ish geotransform
  (440720, 60, 0, 3751320, 0, -60)) -> index 1 of the table
- ``autotest/gdrivers/data/small_world.tif`` (400x200 RGB, global extent)
  -> index 0 ("world image", gt = (-180, 0.9, 0, 90, 0, -0.9), EPSG:4326)

The canonical *join space* is EPSG:3857 meters: every image row carries its
footprint envelope (minx..maxy) in meters regardless of its own srid, so
tile assignment and spatial joins are pure column predicates.

Generation is distributed (``spark.range(n).mapInPandas``) — no driver-side
materialization, which is what lets the same generator scale from 64 rows
to the bench tier and beyond.
"""

from __future__ import annotations

import zlib

import numpy as np

from . import codecs
from .grid import MercatorGrid

SEED = 42
_MERC = MercatorGrid()

# (w, h, channels) mixtures per tier — FIXTURES.md §1
T2_SIZES = [(20, 20, 1), (256, 256, 3), (400, 200, 3), (513, 257, 4)]
BENCH_SIZES = [(20, 20, 1), (64, 64, 3), (64, 64, 3), (128, 128, 3), (256, 256, 3)]
FMTS = ["png", "raw", "jpg"]

# hot-spot tile (~20% of images) to exercise salting/skew: z=4 TMS tile
HOT_TILE = (4, 5, 9)
_HOT_BOUNDS = tuple(float(v) for v in _MERC.tile_bounds(HOT_TILE[1], HOT_TILE[2], HOT_TILE[0]))

IMAGE_COLUMNS = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
    "gt5 double, srid int, minx double, miny double, maxx double, maxy double"
)


def image_id_of(i: int) -> str:
    return f"img{i:08d}"


def _rng_for(image_id: str) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(zlib.crc32(image_id.encode()) ^ SEED))


def image_spec(i: int, tier: str = "t2") -> dict:
    """All generation parameters for row i, derived from the id alone."""
    image_id = image_id_of(i)
    rng = _rng_for(image_id)
    # draws happen in a fixed order — do not reorder
    ax, ay = rng.uniform(0.5, 3.0, size=2)
    period = int(rng.choice([8, 16, 32]))
    amp = rng.uniform(16, 64)
    offsets = rng.integers(0, 96, size=4)
    sizes = BENCH_SIZES if tier == "bench" else T2_SIZES
    w, h, c = sizes[int(rng.integers(0, len(sizes)))]
    fmt = FMTS[int(rng.integers(0, len(FMTS)))]
    if fmt == "jpg" and c == 4:
        c = 3  # lossy codec has no alpha path
    hot = rng.uniform() < 0.20
    if hot:
        cx = rng.uniform(_HOT_BOUNDS[0], _HOT_BOUNDS[2])
        cy = rng.uniform(_HOT_BOUNDS[1], _HOT_BOUNDS[3])
    else:
        cx = rng.uniform(-20037508.0, 20037508.0)
        cy = rng.uniform(-19000000.0, 19000000.0)
    # ground size 50-500 km -> pixel size in meters
    extent = rng.uniform(5e4, 5e5)
    px_size = extent / max(w, h)
    srid = 3857

    if i == 0:  # world image (small_world.tif analog)
        w, h, c = 400, 200, 3
        fmt, srid = "png", 4326
        gt = (-180.0, 0.9, 0.0, 90.0, 0.0, -0.9)
    elif i == 1:  # byte.tif analog
        w, h, c = 20, 20, 1
        fmt, srid = "png", 3857
        gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    else:
        minx = cx - w * px_size / 2.0
        maxy = cy + h * px_size / 2.0
        gt = (minx, px_size, 0.0, maxy, 0.0, -px_size)

    caption = f"caption {i} — ünïcodé 北京 {zlib.crc32(image_id.encode()):08x}"
    return {
        "i": i,
        "image_id": image_id,
        "w": w,
        "h": h,
        "c": c,
        "fmt": fmt,
        "srid": srid,
        "gt": gt,
        "caption": caption,
        "ax": float(ax),
        "ay": float(ay),
        "period": period,
        "amp": float(amp),
        "offsets": [int(o) for o in offsets],
    }


def pattern_array(spec: dict) -> np.ndarray:
    """Deterministic pixels: gradient + checkerboard + per-band offsets."""
    w, h, c = spec["w"], spec["h"], spec["c"]
    x = np.arange(w, dtype=np.float64)[None, :]
    y = np.arange(h, dtype=np.float64)[:, None]
    base = spec["ax"] * x + spec["ay"] * y
    checker = (((x // spec["period"]) + (y // spec["period"])) % 2) * spec["amp"]
    bands = []
    for b in range(c):
        v = base + checker + spec["offsets"][b % 4] + 31.0 * b
        bands.append(np.mod(v, 256.0))
    arr = np.stack(bands, axis=2).astype(np.uint8)
    return arr[:, :, 0] if c == 1 else arr


def phash64(arr: np.ndarray) -> int:
    """64-bit average-hash: 8x8 block means of band 0 vs their mean."""
    a = arr if arr.ndim == 2 else arr[:, :, 0]
    h, w = a.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for by in range(8):
        for bx in range(8):
            blocks[by, bx] = a[ys[by] : max(ys[by] + 1, ys[by + 1]), xs[bx] : max(xs[bx] + 1, xs[bx + 1])].mean()
    bits = (blocks > blocks.mean()).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v  # to signed int64


def footprint_meters(gt, w: int, h: int, srid: int):
    """(minx, miny, maxx, maxy) of the image footprint in EPSG:3857
    meters — ALWAYS mercator meters, whatever the source CRS (the
    schema contract every tile-range/assignment consumer relies on).

    North-up affine corners per apps/gdaltindex_lib.cpp:1112-1124; 4326
    corners go through the closed-form mercator transform; any other
    supported CRS (UTM/LCC/AEA/PS) routes through geo_transform_points.
    Corner-only envelopes slightly under-cover curved edges, the same
    caveat gdaltindex has.
    """
    xs = np.array([0.0, w, 0.0, w])
    ys = np.array([0.0, 0.0, h, h])
    X = gt[0] + xs * gt[1] + ys * gt[2]
    Y = gt[3] + xs * gt[4] + ys * gt[5]
    if srid == 4326:
        lat = np.clip(Y, -85.05112878, 85.05112878)
        X, Y = _MERC.latlon_to_meters(lat, X)
    elif srid != 3857:
        from .operators.warp import geo_transform_points

        lon, lat = geo_transform_points(X, Y, srid, 4326)
        lat = np.clip(lat, -85.05112878, 85.05112878)
        X, Y = _MERC.latlon_to_meters(lat, lon)
    return float(X.min()), float(Y.min()), float(X.max()), float(Y.max())


def image_record(i: int, tier: str = "t2") -> dict:
    spec = image_spec(i, tier)
    arr = pattern_array(spec)
    buf = codecs.encode_image(arr, spec["fmt"])
    minx, miny, maxx, maxy = footprint_meters(spec["gt"], spec["w"], spec["h"], spec["srid"])
    gt = spec["gt"]
    return {
        "image_id": spec["image_id"],
        "bytes": buf,
        "w": spec["w"],
        "h": spec["h"],
        "fmt": spec["fmt"],
        "caption": spec["caption"],
        "phash": phash64(arr),
        "gt0": gt[0],
        "gt1": gt[1],
        "gt2": gt[2],
        "gt3": gt[3],
        "gt4": gt[4],
        "gt5": gt[5],
        "srid": spec["srid"],
        "minx": minx,
        "miny": miny,
        "maxx": maxx,
        "maxy": maxy,
    }


def images_df(spark, n: int, tier: str = "t2", partitions: int | None = None):
    """Distributed deterministic images table: one generator task per
    partition slice, no driver-side pixel materialization."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [image_record(int(i), tier) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    parts = partitions or max(8, n // 2048)
    rng_df = spark.range(0, n, 1, parts)
    return rng_df.mapInPandas(gen, schema=IMAGE_COLUMNS)


# ---------------------------------------------------------------------------
# vector features (join target) + kNN points
# ---------------------------------------------------------------------------

FEATURE_COLUMNS = (
    "fid long, name string, kind string, pop long, wkb binary, "
    "minx double, miny double, maxx double, maxy double"
)

KINDS = ["admin", "water", "park"]


def feature_record(fid: int) -> dict:
    from . import geom

    rng = np.random.Generator(np.random.PCG64(SEED * 1_000_003 + fid))
    cx = rng.uniform(-18000000.0, 18000000.0)
    cy = rng.uniform(-16000000.0, 16000000.0)
    radius = rng.uniform(1e5, 2e6)

    if fid == 0:
        # rectangle exactly equal to its envelope (fast-accept path,
        # ogr/ogrlayer.cpp:2287-2293)
        wkb = geom.wkb_rect(cx - radius, cy - radius, cx + radius, cy + radius)
    elif fid == 1:
        # polygon with a hole (ogr/ogrpolygon.cpp:780-812 semantics)
        outer = _convex_ring(rng, cx, cy, radius, 10)
        hole = _convex_ring(rng, cx, cy, radius * 0.3, 6)
        wkb = geom.wkb_polygon([outer, hole])
    elif fid == 2:
        # degenerate ring < 4 points: must never match
        # (ogr/ogrlinearring.cpp:480-481)
        ring = np.array([[cx, cy], [cx + radius, cy], [cx, cy]])
        wkb = geom.wkb_polygon([ring[:3]])
    elif fid == 3:
        # hugs the antimeridian clamp boundary
        wkb = geom.wkb_rect(20037508.342789244 - 2e6, cy - radius, 20037508.342789244, cy + radius)
    else:
        nverts = int(rng.integers(5, 13))
        wkb = geom.wkb_polygon([_convex_ring(rng, cx, cy, radius, nverts)])

    g = geom.parse_wkb(wkb)
    minx, miny, maxx, maxy = g.envelope()
    return {
        "fid": fid,
        "name": f"zone{fid}",
        "kind": KINDS[fid % 3],
        "pop": int(rng.integers(0, 10_000_000)),
        "wkb": wkb,
        "minx": minx,
        "miny": miny,
        "maxx": maxx,
        "maxy": maxy,
    }


def _convex_ring(rng, cx, cy, radius, nverts):
    angles = np.sort(rng.uniform(0, 2 * np.pi, size=nverts))
    rr = radius * rng.uniform(0.6, 1.0, size=nverts)
    xs = cx + rr * np.cos(angles)
    ys = cy + rr * np.sin(angles)
    return np.stack([xs, ys], axis=1)


def features_df(spark, n: int = 512):
    import pandas as pd

    pdf = pd.DataFrame([feature_record(f) for f in range(n)])
    return spark.createDataFrame(pdf, schema=FEATURE_COLUMNS)


POINT_COLUMNS = "pid long, x double, y double, z double"


def point_record(pid: int) -> dict:
    rng = np.random.Generator(np.random.PCG64(SEED * 7_000_037 + pid))
    return {
        "pid": pid,
        "x": float(rng.uniform(-2e7, 2e7)),
        "y": float(rng.uniform(-1.9e7, 1.9e7)),
        "z": float(rng.uniform(0, 1000)),
    }


def points_df(spark, n: int = 4096, partitions: int = 8):
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([point_record(int(i)) for i in pdf["id"]])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=POINT_COLUMNS)
