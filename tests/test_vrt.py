"""VRT driver tests: XML parse, painter semantics, SrcRect/DstRect
window composition, ComplexSource scale/NODATA, nested VRT, the
distributed scan vs an independent numpy replay, and the
write_vrt -> scan_vrt gdalbuildvrt round-trip."""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.formats import (
    materialize_vrt,
    parse_vrt,
    scan_vrt,
    write_vrt,
)
from gdal_spark.formats.gtiff import format_gtiff


def _write_tif(path, arr, gt=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0), srid=0):
    with open(path, "wb") as f:
        f.write(format_gtiff(arr, gt, srid=srid, compression="deflate"))


def _vrt_two_sources(tmp, with_rects=False):
    a = (np.arange(64, dtype=np.uint8).reshape(8, 8) + 10)
    b = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 2)
    _write_tif(os.path.join(tmp, "a.tif"), a)
    _write_tif(os.path.join(tmp, "b.tif"), b)
    if with_rects:
        body = """
    <SimpleSource>
      <SourceFilename relativeToVRT="1">a.tif</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="2" yOff="2" xSize="4" ySize="4"/>
      <DstRect xOff="0" yOff="0" xSize="8" ySize="8"/>
    </SimpleSource>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">b.tif</SourceFilename>
      <SrcRect xOff="0" yOff="0" xSize="6" ySize="6"/>
      <DstRect xOff="6" yOff="6" xSize="6" ySize="6"/>
    </SimpleSource>"""
    else:
        body = """
    <SimpleSource>
      <SourceFilename relativeToVRT="1">a.tif</SourceFilename>
    </SimpleSource>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">b.tif</SourceFilename>
      <SrcRect xOff="0" yOff="0" xSize="8" ySize="8"/>
      <DstRect xOff="4" yOff="4" xSize="8" ySize="8"/>
    </SimpleSource>"""
    xml = f"""<VRTDataset rasterXSize="12" rasterYSize="12">
  <SRS>EPSG:32611</SRS>
  <GeoTransform>100.0, 1.0, 0.0, 200.0, 0.0, -1.0</GeoTransform>
  <VRTRasterBand dataType="Byte" band="1">{body}
  </VRTRasterBand>
</VRTDataset>
"""
    path = os.path.join(tmp, "mosaic.vrt")
    with open(path, "w") as f:
        f.write(xml)
    return path, a, b


class TestParse:
    def test_parse_fields(self, tmp_path):
        p, _, _ = _vrt_two_sources(str(tmp_path))
        d = parse_vrt(open(p).read(), str(tmp_path))
        assert (d["w"], d["h"], d["srid"]) == (12, 12, 32611)
        assert d["gt"] == (100.0, 1.0, 0.0, 200.0, 0.0, -1.0)
        assert len(d["bands"]) == 1
        assert [s["kind"] for s in d["bands"][0]["sources"]] == [
            "simple", "simple"]

    def test_srs_forms(self):
        from gdal_spark.formats.vrt import _srid_from_srs

        assert _srid_from_srs("EPSG:4326") == 4326
        assert _srid_from_srs(" 3857 ") == 3857
        wkt = ('PROJCS["x",GEOGCS["y",DATUM["z",SPHEROID["s",1,2]],'
               'AUTHORITY["EPSG","4326"]],AUTHORITY["EPSG","32611"]]')
        assert _srid_from_srs(wkt) == 32611
        assert _srid_from_srs(None) == 0

    def test_rejects_non_vrt(self):
        with pytest.raises(ValueError, match="VRTDataset"):
            parse_vrt("<NotAVrt/>", "/tmp")

    def test_rejects_half_set_window(self, tmp_path):
        """SrcRect without DstRect (or vice versa) is the reference's
        debug-assert / paints-nothing case — a parse error here."""
        xml = """<VRTDataset rasterXSize="4" rasterYSize="4">
  <VRTRasterBand dataType="Byte" band="1">
    <SimpleSource>
      <SourceFilename relativeToVRT="1">x.tif</SourceFilename>
      <DstRect xOff="0" yOff="0" xSize="4" ySize="4"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>"""
        with pytest.raises(ValueError, match="set together"):
            parse_vrt(xml, str(tmp_path))

    def test_rejects_unknown_dtype(self, tmp_path):
        xml = ('<VRTDataset rasterXSize="4" rasterYSize="4">'
               '<VRTRasterBand dataType="CFloat64" band="1"/></VRTDataset>')
        with pytest.raises(ValueError, match="dataType"):
            parse_vrt(xml, str(tmp_path))


class TestMaterialize:
    def test_painter_order_overlap(self, tmp_path):
        """Later sources paint over earlier ones (VRTSimpleSource
        document-order composition) — verified against a plain numpy
        slice replay that shares no code with the driver."""
        p, a, b = _vrt_two_sources(str(tmp_path))
        arr, gt, srid, nodata = materialize_vrt(
            parse_vrt(open(p).read(), str(tmp_path)))
        exp = np.zeros((12, 12), dtype=np.uint8)
        exp[0:8, 0:8] = a
        exp[4:12, 4:12] = b
        np.testing.assert_array_equal(arr, exp)
        assert (gt, srid, nodata) == (
            (100.0, 1.0, 0.0, 200.0, 0.0, -1.0), 32611, None)

    def test_srcrect_dstrect_nearest(self, tmp_path):
        """SrcRect 4x4 stretched onto an 8x8 DstRect: pixel-center
        nearest (dst i -> src floor((i+.5)*4/8)) == 2x pixel repeat."""
        p, a, b = _vrt_two_sources(str(tmp_path), with_rects=True)
        arr, *_ = materialize_vrt(parse_vrt(open(p).read(), str(tmp_path)))
        exp = np.zeros((12, 12), dtype=np.uint8)
        exp[0:8, 0:8] = np.repeat(np.repeat(a[2:6, 2:6], 2, 0), 2, 1)
        exp[6:12, 6:12] = b[0:6, 0:6]  # identity 6x6 window at (6,6)
        np.testing.assert_array_equal(arr, exp)

    def test_complex_scale_nodata(self, tmp_path):
        tmp = str(tmp_path)
        a = np.full((4, 4), 7, dtype=np.uint8)
        a[0, 0] = 255  # masked by <NODATA>
        _write_tif(os.path.join(tmp, "c.tif"), a)
        xml = """<VRTDataset rasterXSize="4" rasterYSize="4">
  <VRTRasterBand dataType="UInt16" band="1">
    <NoDataValue>0</NoDataValue>
    <ComplexSource>
      <SourceFilename relativeToVRT="1">c.tif</SourceFilename>
      <ScaleRatio>3.0</ScaleRatio>
      <ScaleOffset>100.0</ScaleOffset>
      <NODATA>255</NODATA>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>"""
        path = os.path.join(tmp, "cx.vrt")
        open(path, "w").write(xml)
        arr, _, _, nodata = materialize_vrt(parse_vrt(xml, tmp))
        assert arr.dtype == np.uint16
        assert nodata == 0.0
        exp = np.full((4, 4), 121, dtype=np.uint16)
        exp[0, 0] = 0  # masked pixel stays at canvas init
        np.testing.assert_array_equal(arr, exp)

    def test_nested_vrt(self, tmp_path):
        tmp = str(tmp_path)
        p, a, b = _vrt_two_sources(tmp)
        xml = f"""<VRTDataset rasterXSize="6" rasterYSize="6">
  <VRTRasterBand dataType="Byte" band="1">
    <SimpleSource>
      <SourceFilename relativeToVRT="1">mosaic.vrt</SourceFilename>
      <SrcRect xOff="3" yOff="3" xSize="6" ySize="6"/>
      <DstRect xOff="0" yOff="0" xSize="6" ySize="6"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>"""
        open(os.path.join(tmp, "outer.vrt"), "w").write(xml)
        arr, *_ = materialize_vrt(parse_vrt(xml, tmp))
        inner = np.zeros((12, 12), dtype=np.uint8)
        inner[0:8, 0:8] = a
        inner[4:12, 4:12] = b
        np.testing.assert_array_equal(arr, inner[3:9, 3:9])

    def test_multiband_png_source(self, tmp_path):
        tmp = str(tmp_path)
        rgb = np.dstack([
            np.arange(16, dtype=np.uint8).reshape(4, 4) * (k + 1)
            for k in range(3)
        ])
        open(os.path.join(tmp, "rgb.png"), "wb").write(
            codecs.encode_png(rgb))
        srcs = "".join(
            f"""
  <VRTRasterBand dataType="Byte" band="{b}">
    <SimpleSource>
      <SourceFilename relativeToVRT="1">rgb.png</SourceFilename>
      <SourceBand>{b}</SourceBand>
    </SimpleSource>
  </VRTRasterBand>""" for b in (1, 2, 3))
        xml = (f'<VRTDataset rasterXSize="4" rasterYSize="4">{srcs}\n'
               "</VRTDataset>")
        arr, *_ = materialize_vrt(parse_vrt(xml, tmp))
        np.testing.assert_array_equal(arr, rgb)


class TestScan:
    def test_distributed_equals_local(self, spark, tmp_path):
        tmp = str(tmp_path)
        p, a, b = _vrt_two_sources(tmp, with_rects=True)
        rows = scan_vrt(spark, p).collect()
        assert len(rows) == 1
        r = rows[0]
        local = materialize_vrt(parse_vrt(open(p).read(), tmp))[0]
        got = codecs.decode_image(bytes(r.bytes), r.fmt)
        np.testing.assert_array_equal(got, local)
        assert (r.image_id, r.w, r.h, r.srid) == ("mosaic", 12, 12, 32611)
        assert (r.gt0, r.gt3) == (100.0, 200.0)

    def test_scan_glob_many(self, spark, tmp_path):
        tmp = str(tmp_path)
        for k in range(3):
            sub = os.path.join(tmp, f"v{k}")
            os.makedirs(sub)
            _vrt_two_sources(sub)
        got = scan_vrt(spark, os.path.join(tmp, "v*", "*.vrt")).collect()
        assert len(got) == 3
        sums = {codecs.decode_image(bytes(r.bytes), r.fmt).sum()
                for r in got}
        assert len(sums) == 1  # identical fixtures -> identical canvases

    def test_roundtrip_buildvrt(self, spark, tmp_path):
        """images rows -> write_gtiff tiles -> write_vrt -> scan_vrt
        reproduces the union-grid paint, independently replayed."""
        from gdal_spark.formats import write_gtiff

        tmp = str(tmp_path)
        recs = []
        arrs = {}
        for k, (ox, oy) in enumerate([(0, 0), (6, 4), (3, 9)]):
            arr = ((np.arange(80, dtype=np.uint8) + 17 * k) % 251).reshape(
                8, 10)
            iid = f"t{k}"
            arrs[iid] = (arr, ox, oy)
            recs.append({
                "image_id": iid, "bytes": codecs.encode_png(arr),
                "w": 10, "h": 8, "fmt": "png",
                "gt0": float(ox), "gt1": 1.0, "gt2": 0.0,
                "gt3": float(-oy), "gt4": 0.0, "gt5": -1.0,
                "srid": 3857,
            })
        df = spark.createDataFrame(
            recs,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
            "gt5 double, srid int",
        )
        write_gtiff(df, tmp)
        vp = write_vrt(df, os.path.join(tmp, "union.vrt"), src_dir=tmp)
        r = scan_vrt(spark, vp).collect()[0]
        got = codecs.decode_image(bytes(r.bytes), r.fmt)
        # independent replay: plain numpy paint in image_id order
        exp = np.zeros((8 + 9, 10 + 6), dtype=np.uint8)
        for iid in sorted(arrs):
            arr, ox, oy = arrs[iid]
            exp[oy:oy + 8, ox:ox + 10] = arr
        np.testing.assert_array_equal(got, exp)
        assert (r.gt0, r.gt3, r.srid) == (0.0, 0.0, 3857)

    def test_write_vrt_xml_is_reparseable(self, spark, tmp_path):
        from gdal_spark.formats import write_gtiff

        tmp = str(tmp_path)
        arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
        df = spark.createDataFrame(
            [{"image_id": "one", "bytes": codecs.encode_png(arr),
              "w": 4, "h": 4, "fmt": "png", "gt0": 5.0, "gt1": 2.0,
              "gt2": 0.0, "gt3": 11.0, "gt4": 0.0, "gt5": -2.0,
              "srid": 4326, "nodata": 9.0}],
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
            "gt5 double, srid int, nodata double",
        )
        write_gtiff(df, tmp)
        vp = write_vrt(df, os.path.join(tmp, "one.vrt"), src_dir=tmp)
        d = parse_vrt(open(vp).read(), tmp)
        assert (d["w"], d["h"], d["srid"]) == (4, 4, 4326)
        src = d["bands"][0]["sources"][0]
        assert src["kind"] == "complex" and src["src_nodata"] == 9.0
        assert src["dst_rect"] == (0, 0, 4, 4)
        # per-row nodata markers become ComplexSource NODATA masks
        arr2, *_ = materialize_vrt(d)
        exp = arr.copy()
        exp[arr == 9] = 0
        np.testing.assert_array_equal(arr2, exp)


class TestWarpedVRT:
    """subClass=VRTWarpedDataset (frmts/vrt/vrtwarped.cpp): the lazy
    gdalwarp artifact. write -> parse -> materialize vs a direct
    warp_array replay, GDAL's own GDALWarpOptions serialization shape,
    and the one-task-per-file distributed scan mixed with mosaics."""

    def _src(self, tmp):
        # a 16x16 UTM-11N grid, 100 m pixels
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
        gt = (500000.0, 100.0, 0.0, 4000000.0, 0.0, -100.0)
        p = os.path.join(tmp, "src.tif")
        _write_tif(p, arr, gt=gt, srid=32611)
        return p, arr, gt

    def test_write_parse_fields(self, tmp_path):
        from gdal_spark.formats import write_warped_vrt
        from gdal_spark.operators.warp import suggested_output_grid

        tmp = str(tmp_path)
        sp, arr, gt = self._src(tmp)
        vp = write_warped_vrt(sp, os.path.join(tmp, "warp.vrt"), 4326,
                              resampling="bilinear", max_error=0.125)
        d = parse_vrt(open(vp).read(), tmp)
        assert d["warped"] and d["srid"] == 4326
        assert d["resampling"] == "bilinear"
        assert d["src_srid"] == 32611
        assert d["max_error"] == 0.125
        assert os.path.basename(d["src_filename"]) == "src.tif"
        egt, ew, eh = suggested_output_grid(gt, 32611, 16, 16, 4326)
        assert (d["w"], d["h"]) == (ew, eh)
        assert d["gt"] == pytest.approx(egt)

    def test_materialize_matches_warp_array(self, tmp_path):
        from gdal_spark.formats import write_warped_vrt
        from gdal_spark.operators.warp import warp_array

        tmp = str(tmp_path)
        sp, arr, gt = self._src(tmp)
        vp = write_warped_vrt(sp, os.path.join(tmp, "warp.vrt"), 4326,
                              resampling="near", max_error=None)
        d = parse_vrt(open(vp).read(), tmp)
        got, ggt, gsrid, _ = materialize_vrt(d)
        exp, alpha = warp_array(
            arr.astype(np.float64), gt, 32611, (d["h"], d["w"]),
            d["gt"], 4326, "near")
        exp = np.where(alpha == 0, 0.0, exp)
        np.testing.assert_array_equal(
            got, np.clip(np.round(exp), 0, 255).astype(np.uint8))
        assert gsrid == 4326 and got.shape == (d["h"], d["w"])
        assert alpha.all()  # fully-covered grid: no fill pixel hidden

    def test_gdal_serialization_shape_parses(self, tmp_path):
        # the reference's own GDALSerializeWarpOptions layout
        # (alg/gdalwarper.cpp:1918-2205), incl. a BandList nodata
        tmp = str(tmp_path)
        sp, arr, gt = self._src(tmp)
        xml = """<VRTDataset rasterXSize="20" rasterYSize="18" subClass="VRTWarpedDataset">
  <SRS>EPSG:4326</SRS>
  <GeoTransform>-117.0, 0.001, 0, 36.2, 0, -0.001</GeoTransform>
  <VRTRasterBand dataType="Byte" band="1" subClass="VRTWarpedRasterBand">
    <NoDataValue>255</NoDataValue>
  </VRTRasterBand>
  <GDALWarpOptions>
    <WarpMemoryLimit>6.71089e+07</WarpMemoryLimit>
    <ResampleAlg>CubicSpline</ResampleAlg>
    <WorkingDataType>Byte</WorkingDataType>
    <SourceDataset relativeToVRT="1">src.tif</SourceDataset>
    <Transformer>
      <ApproxTransformer>
        <MaxError>0.25</MaxError>
        <BaseTransformer>
          <GenImgProjTransformer>
            <ReprojectTransformer>
              <ReprojectionTransformer>
                <SourceSRS>EPSG:32611</SourceSRS>
                <TargetSRS>EPSG:4326</TargetSRS>
              </ReprojectionTransformer>
            </ReprojectTransformer>
          </GenImgProjTransformer>
        </BaseTransformer>
      </ApproxTransformer>
    </Transformer>
    <BandList>
      <BandMapping src="1" dst="1">
        <SrcNoDataReal>17</SrcNoDataReal>
      </BandMapping>
    </BandList>
  </GDALWarpOptions>
</VRTDataset>
"""
        d = parse_vrt(xml, tmp)
        assert d["warped"] and d["resampling"] == "cubicspline"
        assert d["max_error"] == 0.25 and d["src_srid"] == 32611
        assert d["src_nodata"] == 17.0
        assert d["bands"][0]["nodata"] == 255.0
        arr2, _, srid, nodata = materialize_vrt(d)
        assert arr2.shape == (18, 20) and srid == 4326 and nodata == 255.0

    def test_scan_mixed_mosaic_and_warped(self, spark, tmp_path):
        from gdal_spark.formats import write_warped_vrt

        tmp = str(tmp_path)
        mp, a, b = _vrt_two_sources(tmp)
        sp, arr, gt = self._src(tmp)
        vp = write_warped_vrt(sp, os.path.join(tmp, "warp.vrt"), 4326,
                              resampling="bilinear")
        rows = {r.image_id: r
                for r in scan_vrt(spark, os.path.join(tmp, "*.vrt")).collect()}
        assert set(rows) == {"mosaic", "warp"}
        # warped row == driver-local materialize replay
        d = parse_vrt(open(vp).read(), tmp)
        exp, egt, esrid, _ = materialize_vrt(d)
        r = rows["warp"]
        got = codecs.decode_image(bytes(r.bytes), r.fmt)
        np.testing.assert_array_equal(got, exp)
        assert (r.w, r.h, r.srid) == (exp.shape[1], exp.shape[0], esrid)
        assert (r.gt0, r.gt1) == pytest.approx((egt[0], egt[1]))
        # the mosaic row still composes
        m = rows["mosaic"]
        assert (m.w, m.h, m.srid) == (12, 12, 32611)

    def test_unknown_resample_rejected(self, tmp_path):
        from gdal_spark.formats import write_warped_vrt

        tmp = str(tmp_path)
        sp, _, _ = self._src(tmp)
        with pytest.raises(ValueError, match="unknown resampling"):
            write_warped_vrt(sp, os.path.join(tmp, "w.vrt"), 4326,
                             resampling="bogus")
        xml = ('<VRTDataset rasterXSize="4" rasterYSize="4" '
               'subClass="VRTWarpedDataset"><SRS>EPSG:4326</SRS>'
               "<GeoTransform>0,1,0,0,0,-1</GeoTransform>"
               '<VRTRasterBand dataType="Byte" band="1"/>'
               "</VRTDataset>")
        with pytest.raises(ValueError, match="GDALWarpOptions"):
            parse_vrt(xml, tmp)


class TestSeparate:
    def test_separate_band_stack(self, spark, tmp_path):
        # gdalbuildvrt -separate: 3 co-registered single-band inputs ->
        # one 3-band VRT, band i = input i (image_id order)
        from gdal_spark.formats import write_gtiff

        tmp = str(tmp_path)
        arrs = {}
        recs = []
        for i in range(3):
            arr = ((np.arange(36, dtype=np.uint8).reshape(6, 6) * (i + 1))
                   % 200)
            arrs[f"s{i}"] = arr
            recs.append({
                "image_id": f"s{i}", "bytes": codecs.encode_raw(arr),
                "w": 6, "h": 6, "fmt": "raw", "gt0": 0.0, "gt1": 1.0,
                "gt2": 0.0, "gt3": 6.0, "gt4": 0.0, "gt5": -1.0,
                "srid": 32611, "nodata": None})
        df = spark.createDataFrame(
            recs,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, "
            "gt5 double, srid int, nodata double")
        write_gtiff(df, tmp)
        vp = write_vrt(df, os.path.join(tmp, "stack.vrt"), src_dir=tmp,
                       separate=True)
        d = parse_vrt(open(vp).read(), tmp)
        assert len(d["bands"]) == 3
        assert all(len(b["sources"]) == 1 for b in d["bands"])
        assert all(b["sources"][0]["band"] == 1 for b in d["bands"])
        # local materialize == channel stack
        arr3, _, srid, _ = materialize_vrt(d)
        assert arr3.shape == (6, 6, 3) and srid == 32611
        for i in range(3):
            np.testing.assert_array_equal(arr3[:, :, i], arrs[f"s{i}"])
        # distributed scan parity
        r = scan_vrt(spark, vp).collect()[0]
        got = codecs.decode_image(bytes(r.bytes), r.fmt)
        np.testing.assert_array_equal(got, arr3)
