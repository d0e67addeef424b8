"""Image quality metrics + DCT pHash (functions.imagequality): kernels
pinned by closed-form cases, the hash by its defining invariances, and
the distributed pass by bitwise parity with the local kernel."""

import numpy as np

from gdal_spark.functions import imagequality as IQ


class TestKernels:
    def test_constant_image(self):
        arr = np.full((16, 16, 3), 77.0)
        r = IQ.quality_record(arr)
        assert r["brightness"] == 77.0
        assert r["rms_contrast"] == 0.0
        assert r["laplacian_var"] == 0.0
        assert r["entropy_bits"] == 0.0
        assert r["colorfulness"] == 0.0

    def test_checkerboard_closed_form(self):
        # 0/255 checkerboard: mean 127.5, std 127.5, entropy exactly 1
        # bit, Laplacian = ±1020 everywhere inside -> variance 1020²
        x, y = np.meshgrid(np.arange(16), np.arange(16))
        g = ((x + y) % 2) * 255.0
        r = IQ.quality_record(g[:, :, None])
        assert r["brightness"] == 127.5
        assert r["rms_contrast"] == 127.5
        assert r["entropy_bits"] == 1.0
        assert abs(r["laplacian_var"] - 1020.0**2) < 1e-6

    def test_linear_gradient_zero_laplacian(self):
        g = np.tile(np.arange(32, dtype=np.float64), (16, 1))
        assert IQ.laplacian_var(g) == 0.0

    def test_colorfulness_pure_color_vs_gray(self):
        red = np.zeros((8, 8, 3))
        red[:, :, 0] = 200.0
        gray = np.full((8, 8, 3), 200.0)
        # constant pure red: sigma terms 0, mu_rg=200, mu_yb=100
        assert abs(IQ.colorfulness(red) - 0.3 * np.hypot(200.0, 100.0)) < 1e-9
        assert IQ.colorfulness(gray) == 0.0

    def test_gray_luma_identity(self):
        rng = np.random.Generator(np.random.PCG64(5))
        g = rng.uniform(0, 255, (12, 12))
        assert np.allclose(IQ.to_gray(np.stack([g, g, g], axis=2)), g)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


class TestPhash:
    def _img(self, seed=0, n=64):
        rng = np.random.Generator(np.random.PCG64(seed))
        x, y = np.meshgrid(np.arange(n), np.arange(n))
        base = 96 + 64 * np.sin(x / 9.0) * np.cos(y / 13.0)
        return np.clip(base + rng.normal(0, 8, (n, n)), 0, 255)[:, :, None]

    def test_brightness_shift_invariant(self):
        img = self._img(1)
        shifted = np.clip(img + 20.0, 0, 255)
        assert np.allclose(shifted - img, 20.0)  # no clipping occurred
        assert IQ.dct_phash(img) == IQ.dct_phash(shifted)

    def test_contrast_scale_invariant(self):
        img = self._img(2)
        assert IQ.dct_phash(img) == IQ.dct_phash(img * 0.5)

    def test_resize_robust(self):
        # the same scene at 64x64 and 128x128 hashes nearly identically
        img = self._img(3, 64)
        big = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
        assert _hamming(IQ.dct_phash(img), IQ.dct_phash(big)) <= 2

    def test_jpeg_survives(self):
        from gdal_spark import codecs

        img = self._img(4).astype(np.uint8)
        buf = codecs.encode_gsj(img)
        dec = codecs.decode_image(buf, "jpg")
        assert _hamming(IQ.dct_phash(img), IQ.dct_phash(np.atleast_3d(dec))) <= 6

    def test_distinct_scenes_far_apart(self):
        rng = np.random.Generator(np.random.PCG64(9))
        hashes = []
        for s in range(8):
            img = self._img(seed=100 + s)
            # decorrelate scenes: each gets its own frequency mix
            x, y = np.meshgrid(np.arange(64), np.arange(64))
            img = np.clip(
                128 + 80 * np.sin(x / (3 + s)) * np.cos(y / (11 - s))
                + rng.normal(0, 5, (64, 64)),
                0, 255,
            )[:, :, None]
            hashes.append(IQ.dct_phash(img))
        for i in range(len(hashes)):
            for j in range(i + 1, len(hashes)):
                assert _hamming(hashes[i], hashes[j]) >= 10

    def test_signed_int64_range(self):
        img = 255.0 - self._img(7)  # bright image -> likely high bit set
        v = IQ.dct_phash(img)
        assert -(1 << 63) <= v < (1 << 63)


class TestDistributed:
    def test_matches_local_kernel(self, spark):
        from gdal_spark import codecs, fixtures
        from gdal_spark.functions.imagequality import image_quality

        imgs = fixtures.images_df(spark, 6, tier="t2", partitions=3)
        got = {r.image_id: r for r in image_quality(imgs).collect()}
        assert len(got) == 6
        for i in range(6):
            rec = fixtures.image_record(i, tier="t2")
            arr = codecs.decode_image(rec["bytes"], rec["fmt"])
            want = IQ.quality_record(np.atleast_3d(arr))
            g = got[rec["image_id"]]
            for k, v in want.items():
                assert getattr(g, k) == v, (rec["image_id"], k)

    def test_phash_feeds_hamming_blocking(self, spark):
        # computed pHashes drive the existing near-dup blocking: an image
        # and its +15-brightness twin collide; unrelated scenes don't
        import pandas as pd

        from gdal_spark.functions.dedup import hamming_pairs

        rng = np.random.Generator(np.random.PCG64(21))
        x, y = np.meshgrid(np.arange(64), np.arange(64))
        rows = []
        for s in range(4):
            img = np.clip(
                110 + 70 * np.sin(x / (4 + 2 * s)) * np.cos(y / (13 - 2 * s))
                + rng.normal(0, 4, (64, 64)),
                0, 230,
            )[:, :, None]
            rows.append((f"img{s}", IQ.dct_phash(img)))
            rows.append((f"img{s}_bright", IQ.dct_phash(np.clip(img + 15.0, 0, 255))))
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["id", "phash"])
        )
        pairs = hamming_pairs(df, id_col="id", sig_col="phash", max_hamming=4)
        got = {tuple(sorted((r[0], r[1]))) for r in pairs.select(
            pairs.columns[0], pairs.columns[1]).collect()}
        want = {(f"img{s}", f"img{s}_bright") for s in range(4)}
        assert got == want
