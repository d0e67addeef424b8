"""Zarr v2 driver tests — conformance on reference autotest DATA stores
(byte-identical copies, see tests/data/README.md) plus distributed
scan/sink round-trips. Reference behavior: frmts/zarr/zarr_array.cpp;
expected values quoted from autotest/gdrivers/zarr_driver.py."""

import json
import os
import re

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import zarr as Z

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestConformance:
    def test_gzip_and_zlib(self):
        # test_zarr_read_compression_methods: Read() == [1, 2]
        assert Z.read_zarr_array(os.path.join(DATA, "gzip.zarr")).tolist() \
            == [1, 2]
        assert Z.read_zarr_array(os.path.join(DATA, "zlib.zarr")).tolist() \
            == [1, 2]

    def test_fortran_order(self):
        # test_zarr_read_fortran_order: C-order read gives 0..15
        a = Z.read_zarr_array(os.path.join(DATA, "order_f_u1.zarr"))
        assert a.shape == (4, 4)
        assert a.ravel().tolist() == list(range(16))

    def test_delta_filter(self):
        # test_zarr_read_filters: Read() == 0..9
        a = Z.read_zarr_array(os.path.join(DATA, "delta_filter_i4.zarr"))
        assert a.dtype == np.int32 and a.tolist() == list(range(10))

    def test_big_endian_float16(self):
        a = Z.read_zarr_array(os.path.join(DATA, "f2_be.zarr"))
        assert a.dtype == np.float16
        assert a[0] == 1.5 and np.isnan(a[1])

    def test_byte_cf1_pixels_and_georef(self):
        # the 20x20 byte image as a CF-convention zarr group: pixels
        # must checksum 4672 (byte.tif's quoted value) after the
        # ascending-y bottom-up flip, geotransform re-derived from the
        # x/y center coordinates, SRID from the CF transverse_mercator
        # parameters (test_zarr_read_cf1 pins proj4 +proj=utm +zone=11
        # +ellps=clrk66 == EPSG:26711)
        rs = Z.zarr_rasters(os.path.join(DATA, "byte_cf1.zarr"))
        assert len(rs) == 1
        nm, band, a, gt, srid, nodata = rs[0]
        assert nm == "Band1" and a.shape == (20, 20)
        assert gdal_checksum(a) == 4672
        assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        assert srid == 26711 and nodata is None

    def test_unsupported_compressor_and_filter_rejected(self, tmp_path):
        d = tmp_path / "a.zarr"
        d.mkdir()
        meta = {"zarr_format": 2, "shape": [2], "chunks": [2],
                "dtype": "|u1", "compressor": {"id": "blosc"},
                "fill_value": 0, "filters": None, "order": "C"}
        (d / ".zarray").write_text(json.dumps(meta))
        # the reference also refuses stores whose codec the build lacks
        with pytest.raises(ValueError, match="blosc"):
            Z.read_zarray(str(d))
        meta["compressor"] = None
        meta["filters"] = [{"id": "quantize"}]
        (d / ".zarray").write_text(json.dumps(meta))
        with pytest.raises(ValueError, match="quantize"):
            Z.read_zarray(str(d))

    def test_v3_rejected(self, tmp_path):
        d = tmp_path / "a.zarr"
        d.mkdir()
        (d / ".zarray").write_text(json.dumps(
            {"zarr_format": 3, "shape": [1], "chunks": [1],
             "dtype": "|u1"}))
        with pytest.raises(ValueError, match="v2 only"):
            Z.read_zarray(str(d))


class TestLocalIO:
    def _mk(self, tmp_path, arr, chunks, sep=".", comp=None, fill=0,
            order="C"):
        d = tmp_path / "a.zarr"
        d.mkdir(exist_ok=True)
        meta = {"zarr_format": 2, "shape": list(arr.shape),
                "chunks": list(chunks), "dtype": arr.dtype.str,
                "compressor": ({"id": comp, "level": 6} if comp else None),
                "fill_value": fill, "filters": None, "order": order,
                "dimension_separator": sep}
        (d / ".zarray").write_text(json.dumps(meta))
        m = Z.read_zarray(str(d))
        gy = -(-arr.shape[0] // chunks[0])
        gx = -(-arr.shape[1] // chunks[1])
        for cy in range(gy):
            for cx in range(gx):
                full = np.full(chunks, fill, dtype=arr.dtype)
                sub = arr[cy * chunks[0]:(cy + 1) * chunks[0],
                          cx * chunks[1]:(cx + 1) * chunks[1]]
                full[:sub.shape[0], :sub.shape[1]] = sub
                p = Z._chunk_path(str(d), "", m, (cy, cx))
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "wb") as f:
                    f.write(Z.encode_zarr_chunk(full, m))
        return str(d)

    def test_edge_crop_and_slash_separator(self, tmp_path):
        a = np.arange(7 * 5, dtype=np.int16).reshape(7, 5)
        d = self._mk(tmp_path, a, [4, 3], sep="/", comp="zlib")
        assert np.array_equal(Z.read_zarr_array(d), a)

    def test_missing_chunk_is_fill(self, tmp_path):
        a = np.ones((4, 4), np.uint8)
        d = self._mk(tmp_path, a, [2, 2], fill=7)
        os.unlink(os.path.join(d, "1.1"))
        out = Z.read_zarr_array(d)
        assert out[:2, :2].tolist() == [[1, 1], [1, 1]]
        assert out[2:, 2:].tolist() == [[7, 7], [7, 7]]

    def test_fortran_order_roundtrip(self, tmp_path):
        a = np.arange(24, dtype=np.uint32).reshape(4, 6)
        d = self._mk(tmp_path, a, [4, 6], order="F", comp="gzip")
        assert np.array_equal(Z.read_zarr_array(d), a)
        # the chunk file really is F-order on disk
        import gzip as _g
        raw = _g.decompress(open(os.path.join(d, "0.0"), "rb").read())
        assert np.array_equal(
            np.frombuffer(raw, np.uint32).reshape(4, 6, order="F"), a)

    def test_nan_fill_spelling(self, tmp_path):
        d = tmp_path / "a.zarr"
        d.mkdir()
        (d / ".zarray").write_text(json.dumps(
            {"zarr_format": 2, "shape": [2, 2], "chunks": [2, 2],
             "dtype": "<f4", "compressor": None, "fill_value": "NaN",
             "filters": None, "order": "C"}))
        out = Z.read_zarr_array(str(d))  # no chunk file at all
        assert np.isnan(out).all()


class TestSpark:
    def test_scan_byte_cf1(self, spark):
        rows = Z.scan_zarr(spark, os.path.join(DATA, "byte_cf1.zarr")) \
            .collect()
        assert len(rows) == 1
        r = rows[0]
        a = codecs.decode_image(bytes(r.bytes), r.fmt)
        assert gdal_checksum(a) == 4672
        assert (r.gt0, r.gt1, r.gt3, r.gt5) == (440720.0, 60.0,
                                                3751320.0, -60.0)
        assert r.srid == 26711

    def _tiles(self, spark, gy, gx, h, w):
        tiles = []
        for cy in range(gy):
            for cx in range(gx):
                base = (np.arange(h * w, dtype=np.uint16).reshape(h, w)
                        + 1000 * (cy * gx + cx))
                tiles.append((
                    f"t{cy}{cx}", codecs.encode_raw(base), w, h, "raw",
                    100.0 + cx * (w * 2.0), 2.0, 0.0,
                    500.0 - cy * (h * 2.0), 0.0, -2.0, 32633, None,
                ))
        return spark.createDataFrame(
            tiles,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
            "gt5 double, srid int, nodata double",
        ).repartition(4)

    def test_sink_scan_roundtrip(self, spark, tmp_path):
        df = self._tiles(spark, 2, 3, 8, 16)
        store = str(tmp_path / "out.zarr")
        info = Z.write_zarr(df, store, array="band1", compressor="zlib")
        assert info["shape"] == [16, 48] and info["n_chunks"] == 6
        back = Z.scan_zarr(spark, store).collect()
        assert len(back) == 6
        for r in back:
            a = codecs.decode_image(bytes(r.bytes), r.fmt)
            cy, cx = map(int, re.match(
                r"band1_cy(\d+)_cx(\d+)", r.image_id).groups())
            exp = (np.arange(128, dtype=np.uint16).reshape(8, 16)
                   + 1000 * (cy * 3 + cx))
            assert np.array_equal(a, exp)
            assert (r.gt0, r.gt3) == (100.0 + cx * 32.0, 500.0 - cy * 16.0)
            assert r.srid == 32633
        # the store is spec-shape on disk: group + array + coords
        assert json.load(open(os.path.join(store, ".zgroup"))) \
            == {"zarr_format": 2}
        za = json.load(open(os.path.join(store, "band1", ".zarray")))
        assert za["shape"] == [16, 48] and za["chunks"] == [8, 16]
        xs = np.frombuffer(
            open(os.path.join(store, "x", "0"), "rb").read(), "<f8")
        assert xs[0] == 101.0 and len(xs) == 48  # center of first cell

    def test_sparse_grid_missing_chunks(self, spark, tmp_path):
        df = self._tiles(spark, 2, 2, 4, 4).where("image_id != 't01'")
        store = str(tmp_path / "s.zarr")
        info = Z.write_zarr(df, store, compressor=None, fill_value=9)
        assert info["n_chunks"] == 3
        back = {r.image_id: r for r in Z.scan_zarr(spark, store).collect()}
        assert len(back) == 4  # the hole scans as a fill chunk
        a = codecs.decode_image(
            bytes(back["band1_cy0_cx1"].bytes), "raw")
        assert (a == 9).all()
        assert back["band1_cy0_cx1"].nodata == 9.0

    def test_alignment_validation(self, spark):
        df = self._tiles(spark, 1, 2, 8, 16)
        bad = df.withColumn(
            "gt0",
            df.gt0 + (df.image_id == "t01").cast("int") * 3.0,
        )
        with pytest.raises(ValueError, match="chunk-aligned"):
            Z.write_zarr(bad, "/tmp/never.zarr")

    def test_scan_flip_bottom_up_store(self, spark, tmp_path):
        # ascending y coordinates: the plane is stored bottom-up; the
        # distributed scan must flip PER CHUNK and re-anchor each
        # chunk's geotransform so reassembly is north-up
        d = tmp_path / "b.zarr"
        arr = np.arange(8 * 4, dtype=np.uint8).reshape(8, 4)  # bottom-up
        (d / "v").mkdir(parents=True)
        (d / "v" / ".zarray").write_text(json.dumps(
            {"zarr_format": 2, "shape": [8, 4], "chunks": [4, 4],
             "dtype": "|u1", "compressor": None, "fill_value": 0,
             "filters": None, "order": "C"}))
        (d / "v" / ".zattrs").write_text(json.dumps(
            {"_ARRAY_DIMENSIONS": ["y", "x"]}))
        m = Z.read_zarray(str(d), "v")
        for cy in range(2):
            p = Z._chunk_path(str(d), "v", m, (cy, 0))
            with open(p, "wb") as f:
                f.write(arr[cy * 4:(cy + 1) * 4].tobytes())
        for nm, vals in (("x", [0.5, 1.5, 2.5, 3.5]),
                         ("y", [0.5, 1.5, 2.5, 3.5,
                                4.5, 5.5, 6.5, 7.5])):  # ASCENDING
            (d / nm).mkdir()
            (d / nm / ".zarray").write_text(json.dumps(
                {"zarr_format": 2, "shape": [len(vals)],
                 "chunks": [len(vals)], "dtype": "<f8",
                 "compressor": None, "fill_value": None,
                 "filters": None, "order": "C"}))
            (d / nm / "0").write_bytes(
                np.asarray(vals, "<f8").tobytes())
        rows = {r.image_id: r
                for r in Z.scan_zarr(spark, str(d), array="v").collect()}
        assert len(rows) == 2
        north = np.vstack([
            codecs.decode_image(bytes(rows["v_cy1_cx0"].bytes), "raw"),
            codecs.decode_image(bytes(rows["v_cy0_cx0"].bytes), "raw"),
        ])
        assert np.array_equal(north, arr[::-1])  # north-up whole
        # chunk cy1 holds stored rows 4..7 = the TOP after flip
        assert rows["v_cy1_cx0"].gt3 == 8.0
        assert rows["v_cy0_cx0"].gt3 == 4.0
        local = Z.zarr_rasters(str(d), "v")[0][2]
        assert np.array_equal(local, arr[::-1])

    def test_crs_url_fallback(self, spark, tmp_path):
        # a SRID outside the WKT registry round-trips via the url
        # spelling of _CRS (the reference accepts both forms)
        df = self._tiles(spark, 1, 1, 4, 4).withColumn(
            "srid", df_lit_3857())
        store = str(tmp_path / "u.zarr")
        Z.write_zarr(df, store)
        attrs = json.load(open(os.path.join(store, "band1", ".zattrs")))
        assert attrs["_CRS"]["url"].endswith("EPSG/0/3857")
        assert Z.scan_zarr(spark, store).collect()[0].srid == 3857


def df_lit_3857():
    from pyspark.sql import functions as F
    return F.lit(3857)
