"""PNM codec + AAIGrid driver: spec conformance and round-trips."""

import numpy as np
import pytest

from gdal_spark import codecs

pytestmark = pytest.mark.usefixtures("spark")


class TestPNM:
    def test_p5_p6_roundtrip(self):
        rng = np.random.default_rng(3)
        g = rng.integers(0, 255, size=(13, 9)).astype(np.uint8)
        rgb = rng.integers(0, 255, size=(7, 11, 3)).astype(np.uint8)
        assert np.array_equal(codecs.decode_pnm(codecs.encode_pnm(g)), g)
        assert np.array_equal(codecs.decode_pnm(codecs.encode_pnm(rgb)), rgb)

    def test_16bit_and_comments(self):
        a = (np.arange(12, dtype=np.uint16) * 4000).reshape(3, 4)
        enc = codecs.encode_pnm(a)
        assert enc.startswith(b"P5") and b"65535" in enc
        assert np.array_equal(codecs.decode_pnm(enc), a)
        # spec: comments between header tokens
        commented = b"P5\n# a comment\n4 3\n# more\n65535\n" + enc.split(b"\n", 3)[3]
        assert np.array_equal(codecs.decode_pnm(commented), a)

    def test_dispatch(self):
        g = np.zeros((4, 4), dtype=np.uint8)
        assert np.array_equal(
            codecs.decode_image(codecs.encode_image(g, "pgm"), "pnm"), g
        )
        with pytest.raises(ValueError):
            codecs.decode_pnm(b"P1\n1 1\n1\n")  # ASCII PNM not supported


class TestAAIGrid:
    GRID = (
        "ncols 4\nnrows 3\nxllcorner 100.0\nyllcorner 200.0\n"
        "cellsize 0.5\nNODATA_value -9999\n"
        "1 2 3 4\n5 -9999 7 8\n9 10 11 12\n"
    )

    def test_parse_semantics(self):
        from gdal_spark.formats.aaigrid import parse_aaigrid

        arr, gt, nodata = parse_aaigrid(self.GRID)
        assert arr.shape == (3, 4) and np.isnan(arr[1, 1])
        assert arr[0, 0] == 1.0 and arr[2, 3] == 12.0  # top row first
        # north-up gt anchored at the TOP-left corner
        assert gt == (100.0, 0.5, 0.0, 200.0 + 3 * 0.5, 0.0, -0.5)
        assert nodata == -9999.0

    def test_llcenter_shift(self):
        from gdal_spark.formats.aaigrid import parse_aaigrid

        txt = self.GRID.replace("xllcorner", "xllcenter").replace(
            "yllcorner", "yllcenter"
        )
        _a, gt, _n = parse_aaigrid(txt)
        assert gt[0] == 100.0 - 0.25 and gt[3] == 200.0 - 0.25 + 1.5

    def test_distributed_roundtrip(self, spark, tmp_path):
        from gdal_spark.formats import scan_aaigrid, write_aaigrid

        src = tmp_path / "in"
        src.mkdir()
        for i in range(5):
            rows = "\n".join(
                " ".join(str(i * 100 + y * 4 + x) for x in range(4))
                for y in range(3)
            )
            (src / f"dem{i}.asc").write_text(
                f"ncols 4\nnrows 3\nxllcorner {i * 10}\nyllcorner 0\n"
                f"cellsize 1.0\n{rows}\n"
            )
        df = scan_aaigrid(spark, str(src / "*.asc"), srid=32633)
        rows = {r.image_id: r for r in df.collect()}
        assert len(rows) == 5
        a0 = codecs.decode_image(bytes(rows["dem2"].bytes), "raw")
        assert float(a0[0, 0]) == 200.0 and float(a0[2, 3]) == 211.0
        assert rows["dem2"].gt0 == 20.0 and rows["dem2"].gt5 == -1.0
        # write back out (distributed file-per-row sink) and re-scan
        out = tmp_path / "out"
        paths = write_aaigrid(df, str(out), nodata=None)
        assert len(paths) == 5
        back = scan_aaigrid(spark, str(out / "*.asc"), srid=32633)
        b = {r.image_id: r for r in back.collect()}
        for k in rows:
            x = codecs.decode_image(bytes(rows[k].bytes), "raw")
            y = codecs.decode_image(bytes(b[k].bytes), "raw")
            assert np.array_equal(x, y)
            assert all(
                getattr(rows[k], f"gt{j}") == getattr(b[k], f"gt{j}")
                for j in range(6)
            )

    def test_dem_operator_composes(self, spark, tmp_path):
        """An AAIGrid-scanned DEM flows straight into the existing DEM
        stencil operator — the composition the driver exists for."""
        from gdal_spark.formats import scan_aaigrid
        from gdal_spark.operators.dem import dem_images

        rows = "\n".join(
            " ".join(str(x + y) for x in range(8)) for y in range(8)
        )
        (tmp_path / "p.asc").write_text(
            f"ncols 8\nnrows 8\nxllcorner 0\nyllcorner 0\ncellsize 1.0\n{rows}\n"
        )
        df = scan_aaigrid(spark, str(tmp_path / "p.asc"))
        out = dem_images(df, "slope").collect()
        assert len(out) == 1
