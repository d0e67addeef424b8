"""XYZ ASCII grid driver tests — the reference's own autotest inputs
(content quoted from autotest/gdrivers/xyz.py) through the splittable
distributed scan, plus a byte.tif CreateCopy-equivalence round-trip
(test_xyz_1 pins checksum 4672 surviving the trip)."""

import os

import numpy as np
import pytest

from gdal_spark import codecs
from gdal_spark.checksum import gdal_checksum
from gdal_spark.formats import xyz as X

DATA = os.path.join(os.path.dirname(__file__), "data")


def _decode(row):
    return codecs.decode_image(bytes(row.bytes), row.fmt)


class TestScan:
    def test_header_line_swapped_columns(self, spark, tmp_path):
        # autotest test_xyz_3: "Y X Z" header + blank lines; the y=2
        # grid row is the NORTH row here (north-up output; the mapping
        # matches the reference's pixel values per grid row exactly)
        p = tmp_path / "g.xyz"
        p.write_text("Y X Z\n0 0 65\n\n\n0 1 66\n\n1 0 67\n\n"
                     "1 1 68\n2 0 69\n2 1 70\n\n\n")
        rows = X.scan_xyz(spark, str(p)).collect()
        assert len(rows) == 1
        a = _decode(rows[0])
        assert a.dtype == np.uint8
        assert a.tolist() == [[69, 70], [67, 68], [65, 66]]
        r = rows[0]
        assert (r.gt0, r.gt1, r.gt3, r.gt5) == (-0.5, 1.0, 2.5, -1.0)

    def test_missing_cells_and_inexact_spacing(self, spark, tmp_path):
        # autotest test_xyz_4 verbatim: holes read as 0 (NOT nodata),
        # 1e-3-relative jitter snaps onto the regular grid
        p = tmp_path / "h.xyz"
        p.write_text(
            "\n440750.001 3751290 1\n440809.999 3751290 2\n\n"
            "440690 3751170.001 3\n440750.001 3751170.001 4\n"
            "440870 3751170.001 6\n\n440810 3751050 7"
        )
        rows = X.scan_xyz(spark, str(p)).collect()
        a = _decode(rows[0])
        assert a.tolist() == [[0, 1, 2, 0], [3, 4, 0, 6], [0, 0, 7, 0]]

    def test_comma_separated_with_header(self, spark, tmp_path):
        p = tmp_path / "c.xyz"
        p.write_text("x,y,z\n10,20,1.5\n11,20,2.5\n10,21,3.5\n11,21,4.5\n")
        rows = X.scan_xyz(spark, str(p)).collect()
        a = _decode(rows[0])
        assert a.dtype == np.float64
        assert a.tolist() == [[3.5, 4.5], [1.5, 2.5]]

    def test_irregular_grid_rejected(self, spark, tmp_path):
        p = tmp_path / "bad.xyz"
        p.write_text("0 0 1\n1 0 2\n2.7 0 3\n10 0 4\n")
        with pytest.raises(ValueError, match="regular grid"):
            X.scan_xyz(spark, str(p))

    def test_row_band_split(self, spark, tmp_path):
        # tile_rows smaller than the grid splits into row-band images
        lines = [
            f"{i} {j} {(j * 8 + i) % 250}"
            for j in range(16)
            for i in range(8)
        ]
        p = tmp_path / "big.xyz"
        p.write_text("\n".join(lines) + "\n")
        rows = X.scan_xyz(spark, str(p), tile_rows=4).collect()
        assert len(rows) == 4
        whole = np.vstack([
            _decode(r) for r in sorted(rows, key=lambda r: r.image_id)
        ])
        assert whole.shape == (16, 8)
        # north-up: top row is j=15
        assert whole[0].tolist() == [(15 * 8 + i) % 250 for i in range(8)]
        tops = sorted(r.gt3 for r in rows)
        assert tops == [3.5, 7.5, 11.5, 15.5]


class TestRoundTrip:
    def test_byte_tif_checksum_survives(self, spark):
        # the reference's test_xyz_1: CreateCopy(byte.tif) -> checksum
        # 4672 and the documented half-cell-shifted geotransform
        from gdal_spark.formats.gtiff import parse_gtiff

        with open(os.path.join(DATA, "byte.tif"), "rb") as f:
            arr, gt, srid, _ = parse_gtiff(f.read())
        src = spark.createDataFrame(
            [("byte", codecs.encode_raw(arr), 20, 20, "raw",
              gt[0], gt[1], gt[2], gt[3], gt[4], gt[5], srid, None)],
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        )
        import tempfile

        td = tempfile.mkdtemp()
        paths = X.write_xyz(src, td)
        assert len(paths) == 1
        back = X.scan_xyz(spark, paths[0]).collect()
        a = _decode(back[0])
        assert gdal_checksum(a) == 4672
        r = back[0]
        assert abs(r.gt0 - gt[0]) < 1e-6 and abs(r.gt3 - gt[3]) < 1e-6
        assert abs(r.gt1 - gt[1]) < 1e-9 and abs(r.gt5 - gt[5]) < 1e-9

    def test_header_and_separator_options(self, spark, tmp_path):
        a = np.arange(12, dtype=np.int32).reshape(3, 4) * 1000
        src = spark.createDataFrame(
            [("t", codecs.encode_raw(a), 4, 3, "raw",
              0.0, 1.0, 0.0, 3.0, 0.0, -1.0, 0, None)],
            "image_id string, bytes binary, w int, h int, fmt string, "
            "gt0 double, gt1 double, gt2 double, gt3 double, "
            "gt4 double, gt5 double, srid int, nodata double",
        )
        paths = X.write_xyz(src, str(tmp_path), column_separator=",",
                            add_header_line=True)
        text = open(paths[0]).read()
        assert text.startswith("X,Y,Z\n")
        back = X.scan_xyz(spark, paths[0]).collect()
        b = _decode(back[0])
        assert b.dtype == np.int16 and np.array_equal(b, a.astype(np.int16))
