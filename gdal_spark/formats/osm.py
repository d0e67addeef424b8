"""OpenStreetMap PBF driver — THE web-scale vector interchange file
(planet.osm.pbf is ~80 GB of blobs; a continent extract is tens of GB).

Reference driver: ogr/ogrsf_frmts/osm (osm2osm / ogrosmdatasource.cpp —
semantics only; this is a from-scratch implementation of the published
OSM PBF format: fileformat.proto / osmformat.proto wire layout, decoded
with a from-scratch protobuf-lite reader, no protobuf library).

Supported subset:

- the Blob framing (4-byte big-endian BlobHeader length, BlobHeader
  {type, datasize}, Blob {raw | zlib_data + raw_size}); OSMHeader +
  OSMData blobs; lzma/lz4/zstd blob codecs rejected clearly;
- PrimitiveBlock: string table, granularity / lat_offset / lon_offset
  scaling (lat = 1e-9 * (offset + granularity * raw)), DenseNodes
  (delta-coded ids/lats/lons, 0-separated keys_vals), plain Nodes,
  Ways (delta-coded refs), Relations (roles_sid / delta memids /
  types);
- the reference's layer semantics re-expressed relationally:
  `points` = tagged nodes, `lines` = ways joined to their node
  locations — which on Spark is a JOIN, not an in-process node cache
  (ogrosmdatasource.cpp builds a custom node database precisely
  because a single process cannot hold planet-scale nodes; a shuffle
  join is the distributed answer to the same problem).

Conformance is pinned against reference autotest DATA files (see
tests/data/README.md): test.pbf (node 3 "Some interesting point" at
POINT(3 49.5); way 1 LINESTRING(2 49,3 50) highway=motorway; way 6
closed ring; 3 relations), the uncompressed dense/non-dense variants,
and two_points.pbf.

Spark shape: a .pbf is a sequence of INDEPENDENT compressed blobs
(~8k primitives each), so the unit of parallelism is the BLOB.
:func:`osm_blob_spans` walks only the framing headers on the driver
(~32 bytes read per multi-MB blob — the byte pattern an object-store
range reader wants), :func:`scan_osm` fans out exactly one task per
OSMData blob, and each task inflates + parses only its own blob.
:func:`osm_way_lines` then assembles way geometry with a plain
posexplode -> join -> sort-collect pipeline over the node and way
DataFrames — Catalyst picks broadcast vs shuffle by size, AQE handles
the hot-node skew, and nothing ever materializes a node cache.
:func:`write_osm_pbf` is the inverse: every task serializes its own
partition as a self-contained framed blob, and the driver only
concatenates framed bytes after one OSMHeader — valid by construction
because blobs are independent.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np

from ._util import local_path

# ---------------------------------------------------------------------------
# protobuf-lite wire reader (from the public protobuf encoding spec)
# ---------------------------------------------------------------------------


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes) -> dict[int, list]:
    """Decode one message into {field_number: [values]} — varints stay
    ints, length-delimited stay bytes (caller knows the schema)."""
    out: dict[int, list] = {}
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, i)[0]
            i += 4
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        else:
            raise ValueError(f"protobuf wire type {wt} unsupported")
        out.setdefault(fno, []).append(v)
    return out


def _packed_varints(chunks: list, signed: bool = False) -> list[int]:
    vals = []
    for c in chunks:
        if isinstance(c, int):  # non-packed spelling is legal too
            vals.append(c)
            continue
        i = 0
        while i < len(c):
            v, i = _varint(c, i)
            vals.append(v)
    if signed:
        vals = [_zigzag(v) for v in vals]
    return vals


def _delta(vals: list[int]) -> np.ndarray:
    return np.cumsum(np.asarray(vals, dtype=np.int64))


# ---------------------------------------------------------------------------
# blob framing
# ---------------------------------------------------------------------------


def osm_blob_spans(path: str) -> list[tuple[int, int, str]]:
    """Walk the file's framing only: per blob, the 4-byte length +
    BlobHeader (tens of bytes) are read, the payload is SEEKED OVER.
    Returns [(payload_offset, payload_len, blob_type)]."""
    spans = []
    with open(local_path(path), "rb") as f:
        while True:
            hd = f.read(4)
            if len(hd) < 4:
                break
            (hlen,) = struct.unpack(">I", hd)
            header = _fields(f.read(hlen))
            btype = header[1][0].decode("utf-8")
            datasize = header[3][0]
            off = f.tell()
            spans.append((off, int(datasize), btype))
            f.seek(off + datasize)
    return spans


def _blob_payload(raw: bytes) -> bytes:
    blob = _fields(raw)
    if 1 in blob:
        return blob[1][0]
    if 3 in blob:
        return zlib.decompress(blob[3][0])
    for fno, name in ((4, "lzma"), (6, "lz4"), (7, "zstd")):
        if fno in blob:
            raise ValueError(f"OSM blob codec {name} unsupported "
                             "(raw/zlib)")
    raise ValueError("OSM blob with no known payload field")


# ---------------------------------------------------------------------------
# PrimitiveBlock
# ---------------------------------------------------------------------------


def parse_primitive_block(payload: bytes) -> dict:
    """One OSMData payload -> {'nodes': [(id, lon, lat, tags)],
    'ways': [(id, refs, tags)], 'relations': [(id, members, tags)]}
    with tags as dicts and members as (type, ref, role) triples."""
    blk = _fields(payload)
    strings = [s.decode("utf-8", "replace")
               for s in _fields(blk[1][0]).get(1, [])]
    gran = blk.get(17, [100])[0]
    lat_off = blk.get(19, [0])[0]
    lon_off = blk.get(20, [0])[0]

    def coord(off, raw):
        # divide by 1e9 (one correctly-rounded op) rather than
        # multiplying by the inexact 1e-9 constant: a stored 12.5
        # must come back exactly 12.5
        return (off + gran * int(raw)) / 1e9

    nodes, ways, rels = [], [], []
    for g in blk.get(2, []):
        grp = _fields(g)
        for nb in grp.get(1, []):  # plain Nodes
            nf = _fields(nb)
            nid = _zigzag(nf[1][0])
            keys = _packed_varints(nf.get(2, []))
            vals = _packed_varints(nf.get(3, []))
            tags = {strings[k]: strings[v] for k, v in zip(keys, vals)}
            nodes.append((nid, coord(lon_off, _zigzag(nf[9][0])),
                          coord(lat_off, _zigzag(nf[8][0])), tags))
        for db in grp.get(2, []):  # DenseNodes
            df = _fields(db)
            ids = _delta(_packed_varints(df.get(1, []), signed=True))
            lats = _delta(_packed_varints(df.get(8, []), signed=True))
            lons = _delta(_packed_varints(df.get(9, []), signed=True))
            kv = _packed_varints(df.get(10, []))
            ki = 0
            for j in range(len(ids)):
                tags = {}
                while ki < len(kv) and kv[ki] != 0:
                    tags[strings[kv[ki]]] = strings[kv[ki + 1]]
                    ki += 2
                ki += 1  # the 0 separator
                nodes.append((int(ids[j]), coord(lon_off, lons[j]),
                              coord(lat_off, lats[j]), tags))
        for wb in grp.get(3, []):  # Ways
            wf = _fields(wb)
            wid = wf[1][0]
            keys = _packed_varints(wf.get(2, []))
            vals = _packed_varints(wf.get(3, []))
            refs = _delta(_packed_varints(wf.get(8, []), signed=True))
            ways.append((int(wid),
                         [int(r) for r in refs],
                         {strings[k]: strings[v]
                          for k, v in zip(keys, vals)}))
        for rb in grp.get(4, []):  # Relations
            rf = _fields(rb)
            rid = rf[1][0]
            keys = _packed_varints(rf.get(2, []))
            vals = _packed_varints(rf.get(3, []))
            roles = _packed_varints(rf.get(8, []))
            mids = _delta(_packed_varints(rf.get(9, []), signed=True))
            types = _packed_varints(rf.get(10, []))
            members = [
                (("node", "way", "relation")[t], int(m), strings[r])
                for t, m, r in zip(types, mids, roles)
            ]
            rels.append((int(rid), members,
                         {strings[k]: strings[v]
                          for k, v in zip(keys, vals)}))
    return {"nodes": nodes, "ways": ways, "relations": rels}


def read_osm(path: str) -> dict:
    """Materialize a whole file locally (tests / oracle replicas —
    the scale path is :func:`scan_osm`)."""
    out = {"nodes": [], "ways": [], "relations": []}
    with open(local_path(path), "rb") as f:
        for off, ln, btype in osm_blob_spans(path):
            if btype != "OSMData":
                continue
            f.seek(off)
            blk = parse_primitive_block(_blob_payload(f.read(ln)))
            for k in out:
                out[k] += blk[k]
    return out


# ---------------------------------------------------------------------------
# distributed scan: one task per blob
# ---------------------------------------------------------------------------

_SCHEMAS = {
    "nodes": "osm_id long, lon double, lat double, tags string",
    "ways": "osm_id long, refs array<long>, tags string",
    "relations": ("osm_id long, member_types array<string>, "
                  "member_refs array<long>, member_roles array<string>, "
                  "tags string"),
}


def scan_osm(spark, path: str, kind: str = "nodes"):
    """Distributed .pbf read: the driver walks only the blob framing
    (:func:`osm_blob_spans`), fans out ONE task per OSMData blob, and
    each task seeks/inflates/parses only its own blob — a planet file
    with ~40k blobs is ~40k independent tasks. ``kind`` selects which
    primitive stream the scan emits (nodes / ways / relations); tags
    ride as a JSON string column (`F.get_json_object` / from_json
    downstream)."""
    import pandas as pd

    if kind not in _SCHEMAS:
        raise ValueError(f"kind {kind!r} (nodes/ways/relations)")
    p = local_path(path)
    spans = [(p, off, ln) for off, ln, t in osm_blob_spans(p)
             if t == "OSMData"]
    if not spans:
        raise ValueError(f"{path}: no OSMData blobs")
    tdf = spark.createDataFrame(
        spark.sparkContext.parallelize(spans, len(spans)),
        "path string, off long, len long",
    )

    def read_blobs(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                with open(r.path, "rb") as f:
                    f.seek(r.off)
                    blk = parse_primitive_block(
                        _blob_payload(f.read(r.len)))
                if kind == "nodes":
                    for nid, lon, lat, tags in blk["nodes"]:
                        rows.append((nid, lon, lat,
                                     json.dumps(tags) if tags else None))
                elif kind == "ways":
                    for wid, refs, tags in blk["ways"]:
                        rows.append((wid, refs,
                                     json.dumps(tags) if tags else None))
                else:
                    for rid, members, tags in blk["relations"]:
                        rows.append((
                            rid,
                            [m[0] for m in members],
                            [m[1] for m in members],
                            [m[2] for m in members],
                            json.dumps(tags) if tags else None,
                        ))
            cols = {
                "nodes": ["osm_id", "lon", "lat", "tags"],
                "ways": ["osm_id", "refs", "tags"],
                "relations": ["osm_id", "member_types", "member_refs",
                              "member_roles", "tags"],
            }[kind]
            yield pd.DataFrame(rows, columns=cols)

    return tdf.mapInPandas(read_blobs, schema=_SCHEMAS[kind])


def osm_points(spark, path: str):
    """The reference's `points` layer: nodes that carry tags (untagged
    nodes are geometry-only vertices), as (osm_id, wkt, tags)."""
    from pyspark.sql import functions as F  # noqa: N812

    return (
        scan_osm(spark, path, "nodes")
        .where(F.col("tags").isNotNull())
        .select(
            "osm_id",
            F.concat(
                F.lit("POINT ("),
                F.col("lon").cast("string"), F.lit(" "),
                F.col("lat").cast("string"), F.lit(")"),
            ).alias("wkt"),
            "tags",
        )
    )


def osm_way_lines(spark, path: str):
    """The reference's `lines` layer, Spark-first: ways joined to their
    node coordinates. ogrosmdatasource.cpp builds a custom on-disk
    node database because one process cannot hold planet-scale nodes —
    here that lookup IS the equi-join (posexplode refs -> join nodes
    on id -> re-assemble in ref order), so Catalyst/AQE pick broadcast
    vs shuffle and handle skew, and the node table never concentrates
    anywhere. Returns (osm_id, wkt LINESTRING, tags)."""
    from pyspark.sql import functions as F  # noqa: N812

    nodes = scan_osm(spark, path, "nodes").select("osm_id", "lon", "lat")
    ways = scan_osm(spark, path, "ways")
    exploded = ways.select(
        F.col("osm_id").alias("way_id"), "tags",
        F.posexplode("refs").alias("pos", "ref"),
    )
    joined = exploded.join(
        nodes.withColumnRenamed("osm_id", "ref"), "ref", "inner"
    )
    pts = joined.groupBy("way_id", "tags").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "lon", "lat"))
                ),
                lambda s: F.concat(
                    s["lon"].cast("string"), F.lit(" "),
                    s["lat"].cast("string"),
                ),
            ),
            ",",
        ).alias("coords"),
        F.count("*").alias("n"),
    )
    return (
        pts.where(F.col("n") >= 2)
        .select(
            F.col("way_id").alias("osm_id"),
            F.concat(F.lit("LINESTRING ("), "coords",
                     F.lit(")")).alias("wkt"),
            "tags",
        )
    )


# ---------------------------------------------------------------------------
# write: tasks build framed blobs, the driver concatenates
# ---------------------------------------------------------------------------


def _enc_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zigzag(v: int) -> bytes:
    return _enc_varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)


def _enc_field(fno: int, wt: int, payload) -> bytes:
    key = _enc_varint((fno << 3) | wt)
    if wt == 0:
        return key + _enc_varint(payload)
    return key + _enc_varint(len(payload)) + payload


def _enc_packed_sint(vals) -> bytes:
    return b"".join(_enc_zigzag(int(v)) for v in vals)


def _frame_blob(btype: str, payload: bytes) -> bytes:
    blob = (_enc_field(2, 0, len(payload))
            + _enc_field(3, 2, zlib.compress(payload, 6)))
    header = (_enc_field(1, 2, btype.encode())
              + _enc_field(3, 0, len(blob)))
    return struct.pack(">I", len(header)) + header + blob


def _encode_block(nodes, ways) -> bytes:
    """(id, lon, lat, tags) nodes + (id, refs, tags) ways -> one
    PrimitiveBlock payload (granularity 100, DenseNodes)."""
    strings: list[bytes] = [b""]
    sidx: dict[str, int] = {}

    def s(t: str) -> int:
        if t not in sidx:
            sidx[t] = len(strings)
            strings.append(t.encode())
        return sidx[t]

    groups = b""
    if nodes:
        ids = [n[0] for n in nodes]
        lons = [round(n[1] * 1e9 / 100) for n in nodes]
        lats = [round(n[2] * 1e9 / 100) for n in nodes]
        kv = []
        for n in nodes:
            for k, v in (n[3] or {}).items():
                kv += [s(k), s(v)]
            kv.append(0)
        dense = (
            _enc_field(1, 2, _enc_packed_sint(np.diff([0] + ids)))
            + _enc_field(8, 2, _enc_packed_sint(np.diff([0] + lats)))
            + _enc_field(9, 2, _enc_packed_sint(np.diff([0] + lons)))
            + _enc_field(10, 2,
                         b"".join(_enc_varint(x) for x in kv))
        )
        groups += _enc_field(2, 2, _enc_field(2, 2, dense))
    if ways:
        wmsgs = b""
        for wid, refs, tags in ways:
            keys = b"".join(_enc_varint(s(k)) for k in (tags or {}))
            vals = b"".join(_enc_varint(s(v))
                            for v in (tags or {}).values())
            w = _enc_field(1, 0, int(wid))
            if keys:
                w += _enc_field(2, 2, keys) + _enc_field(3, 2, vals)
            w += _enc_field(8, 2,
                            _enc_packed_sint(np.diff([0] + list(refs))))
            wmsgs += _enc_field(3, 2, w)
        groups += _enc_field(2, 2, wmsgs)
    st = b"".join(_enc_field(1, 2, t) for t in strings)
    return _enc_field(1, 2, st) + groups


def write_osm_pbf(nodes_df, ways_df, path: str) -> int:
    """Distributed .pbf sink: every TASK serializes its partition as a
    complete zlib-framed OSMData blob (string table and delta coding
    are per-blob state, so partitions need no coordination), and the
    driver concatenates the framed byte strings after one OSMHeader —
    valid by construction. Returns the blob count. Node partitions
    must be id-sorted within themselves for best delta coding; any
    order is still VALID (deltas may just be larger)."""

    def node_blobs(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("osm_id")
            nodes = [
                (int(r.osm_id), float(r.lon), float(r.lat),
                 json.loads(r.tags) if r.tags else {})
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(
                {"blob": [_frame_blob("OSMData",
                                      _encode_block(nodes, []))]})

    def way_blobs(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("osm_id")
            ways = [
                (int(r.osm_id), [int(x) for x in r.refs],
                 json.loads(r.tags) if r.tags else {})
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(
                {"blob": [_frame_blob("OSMData",
                                      _encode_block([], ways))]})

    blobs = [
        bytes(r.blob)
        for r in nodes_df.select("osm_id", "lon", "lat", "tags")
        .mapInPandas(node_blobs, schema="blob binary").collect()
    ]
    blobs += [
        bytes(r.blob)
        for r in ways_df.select("osm_id", "refs", "tags")
        .mapInPandas(way_blobs, schema="blob binary").collect()
    ]
    header = _enc_field(4, 2, b"DenseNodes")  # required_features
    out_path = local_path(path)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(_frame_blob("OSMHeader", header))
        for b in blobs:
            f.write(b)
    return len(blobs)
