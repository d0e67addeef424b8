"""GCP polynomial georeferencing (alg/gdal_crs.cpp semantics)."""

import numpy as np
import pytest

from gdal_spark.operators.gcp import (
    GCPTransform,
    warp_array_gcp,
)
from tests.conftest import spark  # noqa: F401


def _affine_gcps(n=8, seed=0):
    rng = np.random.default_rng(seed)
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 80, n)
    gx = 500.0 + 2.0 * px - 0.5 * py
    gy = -200.0 + 0.25 * px + 3.0 * py
    return np.stack([px, py, gx, gy], axis=1)


class TestFit:
    def test_order1_recovers_exact_affine(self):
        t = GCPTransform(_affine_gcps(), order=1)
        assert t.rms < 1e-9
        gx, gy = t.forward(10.0, 20.0)
        assert float(gx) == pytest.approx(500 + 20 - 10, abs=1e-9)
        assert float(gy) == pytest.approx(-200 + 2.5 + 60, abs=1e-9)
        px, py = t.inverse(gx, gy)
        assert float(px) == pytest.approx(10.0, abs=1e-9)
        assert float(py) == pytest.approx(20.0, abs=1e-9)

    @pytest.mark.parametrize("order", [2, 3])
    def test_higher_orders_recover_exact_polynomials(self, order):
        rng = np.random.default_rng(3)
        n_terms = (order + 1) * (order + 2) // 2
        cx = rng.uniform(-1, 1, n_terms) / 100
        cy = rng.uniform(-1, 1, n_terms) / 100
        px = rng.uniform(0, 50, 40)
        py = rng.uniform(0, 50, 40)

        def poly(c, x, y):
            k, out = 0, np.zeros_like(x)
            for j in range(order + 1):
                for i in range(order + 1 - j):
                    out = out + c[k] * x**i * y**j
                    k += 1
            return out

        gcps = np.stack(
            [px, py, poly(cx, px, py), poly(cy, px, py)], axis=1
        )
        t = GCPTransform(gcps, order=order)
        assert t.rms < 1e-9
        qx, qy = np.array([7.0, 31.0]), np.array([11.0, 4.0])
        gx, gy = t.forward(qx, qy)
        np.testing.assert_allclose(gx, poly(cx, qx, qy), atol=1e-9)
        np.testing.assert_allclose(gy, poly(cy, qx, qy), atol=1e-9)

    def test_least_squares_beats_any_perturbation(self):
        """With noisy overdetermined GCPs the fitted coefficients are
        the L2 minimizer: perturbing them only increases the residual."""
        rng = np.random.default_rng(5)
        g = _affine_gcps(30, seed=5)
        g[:, 2:] += rng.normal(0, 0.5, (30, 2))
        t = GCPTransform(g, order=1)
        gx, gy = t.forward(g[:, 0], g[:, 1])
        base = ((gx - g[:, 2]) ** 2 + (gy - g[:, 3]) ** 2).sum()
        for _ in range(10):
            t2 = GCPTransform(g, order=1)
            t2._fwd = t._fwd + rng.normal(0, 1e-3, t._fwd.shape)
            gx2, gy2 = t2.forward(g[:, 0], g[:, 1])
            pert = ((gx2 - g[:, 2]) ** 2 + (gy2 - g[:, 3]) ** 2).sum()
            assert pert >= base

    def test_min_gcp_counts_and_degenerate(self):
        g = _affine_gcps(5)
        with pytest.raises(ValueError, match="order 2 needs"):
            GCPTransform(g, order=2)
        # collinear points cannot determine an affine map
        px = np.arange(6, dtype=np.float64)
        line = np.stack([px, 2 * px, px, 3 * px], axis=1)
        with pytest.raises(ValueError, match="degenerate"):
            GCPTransform(line, order=1)


class TestWarp:
    def test_identity_gcps_roundtrip_nearest(self):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (16, 16), dtype=np.uint8)
        # GCPs mapping pixel space to itself; out grid = pixel grid
        g = [(x, y, x, y) for x, y in
             [(0, 0), (15, 0), (0, 15), (15, 15), (7, 3), (3, 11)]]
        out = warp_array_gcp(
            arr, g, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), 16, 16, resample="near"
        )
        np.testing.assert_array_equal(out, arr.astype(np.float64))

    def test_scaled_gcps_bilinear_on_linear_field(self):
        """Bilinear through an affine GCP map reproduces a linear field
        exactly (interpolation is exact for degree-1 surfaces)."""
        y, x = np.mgrid[0:20, 0:20]
        arr = (2.0 * x + 3.0 * y).astype(np.float64)
        # geo = 10 * pixel
        g = [(x_, y_, 10.0 * x_, 10.0 * y_) for x_, y_ in
             [(0, 0), (19, 0), (0, 19), (19, 19), (5, 12), (13, 4)]]
        out = warp_array_gcp(
            arr, g, (20.0, 10.0, 0.0, 20.0, 0.0, 10.0), 16, 16,
            resample="bilinear", nodata=-1.0,
        )
        # output pixel (c,r) center -> geo (20+10(c+.5)) -> src px 2+c+.5
        ys, xs = np.mgrid[0:16, 0:16]
        want = 2.0 * (xs + 2.0) + 3.0 * (ys + 2.0)
        ok = out != -1.0
        assert ok.sum() > 150
        np.testing.assert_allclose(out[ok], want[ok], atol=1e-9)

    def test_distributed_matches_local(self, spark):
        from gdal_spark import codecs as C
        from gdal_spark import fixtures
        from gdal_spark.checksum import gdal_checksum
        from gdal_spark.operators.gcp import warp_images_gcp

        g = [(0, 0, 0, 0), (31, 0, 62, 1), (0, 31, -1, 60),
             (31, 31, 61, 62), (10, 20, 19.5, 39.0), (25, 5, 49.8, 10.4)]
        gt = (0.0, 2.0, 0.0, 0.0, 0.0, 2.0)
        imgs = fixtures.images_df(spark, 3, tier="t2", partitions=2)
        got = {
            r.image_id: r.checksum
            for r in warp_images_gcp(imgs, g, gt, 24, 24, order=1).collect()
        }
        for i in range(3):
            rec = fixtures.image_record(i, tier="t2")
            arr = C.decode_image(rec["bytes"], rec["fmt"])
            out = np.atleast_3d(warp_array_gcp(arr, g, gt, 24, 24, order=1))
            assert got[rec["image_id"]] == int(gdal_checksum(out[:, :, 0]))


class TestBilinearEdges:
    def test_identity_bilinear_keeps_last_row_col(self):
        import numpy as np

        from gdal_spark.operators.gcp import warp_array_gcp

        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        # identity mapping: gcps pin pixel (px,py) -> geo (px,py)
        gcps = [(0.0, 0.0, 0.0, 0.0), (16.0, 0.0, 16.0, 0.0),
                (0.0, 16.0, 0.0, 16.0), (16.0, 16.0, 16.0, 16.0)]
        out = warp_array_gcp(
            arr, gcps, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), 16, 16,
            order=1, resample="bilinear", nodata=-1.0,
        )
        # edge clamping: the identity warp reproduces EVERY pixel,
        # including the last row/column (previously nodata-filled)
        np.testing.assert_allclose(out, arr.astype(np.float64), atol=1e-9)


class TestTPS:
    """Thin plate spline (gdalwarp -tps; alg/gdal_tps.cpp)."""

    def _gcps(self):
        rng = np.random.default_rng(3)
        px = rng.random(12) * 100
        py = rng.random(12) * 80
        gx = 2 * px + 0.3 * py + 0.002 * px * py + 5
        gy = -0.5 * px + 3 * py + np.sin(px / 20) * 4
        return np.stack([px, py, gx, gy], axis=1)

    def test_interpolates_gcps_exactly(self):
        from gdal_spark.operators.gcp import TPSTransform

        g = self._gcps()
        t = TPSTransform(g)
        fx, fy = t.forward(g[:, 0], g[:, 1])
        assert np.abs(fx - g[:, 2]).max() < 1e-9
        assert np.abs(fy - g[:, 3]).max() < 1e-9
        assert t.rms < 1e-9  # spline INTERPOLATES (poly fit would not)
        ix, iy = t.inverse(g[:, 2], g[:, 3])
        assert np.abs(ix - g[:, 0]).max() < 1e-9

    def test_affine_gcps_reproduce_affine_everywhere(self):
        from gdal_spark.operators.gcp import TPSTransform

        rng = np.random.default_rng(5)
        px, py = rng.random(8) * 50, rng.random(8) * 50
        g = np.stack([px, py, 2 * px + 3 * py + 1, px - py + 4], axis=1)
        t = TPSTransform(g)
        qx, qy = rng.random(20) * 50, rng.random(20) * 50
        fx, fy = t.forward(qx, qy)
        assert np.abs(fx - (2 * qx + 3 * qy + 1)).max() < 1e-8
        assert np.abs(fy - (qx - qy + 4)).max() < 1e-8

    def test_warp_with_tps_matches_order1_on_affine(self):
        from gdal_spark.operators.gcp import warp_array_gcp

        rng = np.random.default_rng(7)
        arr = rng.integers(0, 255, size=(40, 40)).astype(np.float64)
        px = np.array([0.0, 40.0, 0.0, 40.0, 20.0])
        py = np.array([0.0, 0.0, 40.0, 40.0, 20.0])
        g = np.stack([px, py, 10 + 2 * px, 100 - 2 * py], axis=1)
        gt = (10.0, 2.0, 0.0, 100.0, 0.0, -2.0)
        w1 = warp_array_gcp(arr, g, gt, 40, 40, order=1)
        wt = warp_array_gcp(arr, g, gt, 40, 40, order="tps")
        assert np.array_equal(w1, wt)

    def test_degenerate_raises(self):
        from gdal_spark.operators.gcp import TPSTransform

        g = np.array([[0, 0, 0, 0], [0, 0, 1, 1], [1, 1, 2, 2]], float)
        with pytest.raises(ValueError):
            TPSTransform(g)


# single source of truth for the 90-float RPC00B fixture: the bench
# oracle entry owns it; diverging copies would hide transcription bugs
from __spark_entry__ import _RPC_FIX as RPC_FIX


class TestRPC:
    """RPC00B rational polynomial transformer (alg/gdalrpc.cpp)."""

    def test_center_point_closed_form(self):
        from gdal_spark.operators.rpc import RPCTransform

        t = RPCTransform(RPC_FIX)
        col, row = t.ground_to_image(44.0, 33.0, 500.0)
        # P = L = H = 0: ratio is coeff[0]/den[0]
        assert row == pytest.approx(8000.0 + 0.003 * 8500.0)
        assert col == pytest.approx(7000.0 - 0.002 * 7500.0)

    def test_inverse_roundtrip_vectorized(self):
        from gdal_spark.operators.rpc import RPCTransform

        t = RPCTransform(RPC_FIX)
        rng = np.random.default_rng(11)
        lon = 44.0 + (rng.random(200) - 0.5) * 0.2
        lat = 33.0 + (rng.random(200) - 0.5) * 0.18
        h = rng.random(200) * 900
        col, row = t.ground_to_image(lon, lat, h)
        lon2, lat2 = t.image_to_ground(col, row, h)
        c2, r2 = t.ground_to_image(lon2, lat2, h)
        assert np.abs(c2 - col).max() < 1e-8  # sub-1e-8-pixel closure
        assert np.abs(r2 - row).max() < 1e-8
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_height_matters(self):
        from gdal_spark.operators.rpc import RPCTransform

        t = RPCTransform(RPC_FIX)
        c0, r0 = t.ground_to_image(44.05, 33.05, 0.0)
        c1, r1 = t.ground_to_image(44.05, 33.05, 900.0)
        assert abs(c1 - c0) > 1.0 or abs(r1 - r0) > 1.0

    def test_missing_key_raises(self):
        from gdal_spark.operators.rpc import RPCTransform

        bad = dict(RPC_FIX)
        del bad["line_den_coeff"]
        with pytest.raises(ValueError, match="missing"):
            RPCTransform(bad)
