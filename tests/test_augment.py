"""Image augmentation: kernel identities + distributed determinism."""

import numpy as np
import pytest

from gdal_spark import codecs, fixtures
from gdal_spark.functions.augment import apply_op, augment_images

pytestmark = pytest.mark.usefixtures("spark")


def _arr():
    rng = np.random.default_rng(5)
    return rng.integers(0, 255, size=(24, 17, 3)).astype(np.uint8)


class TestKernel:
    def test_involutions_and_cycles(self):
        a = _arr()
        assert np.array_equal(apply_op(apply_op(a, "flip_h"), "flip_h"), a)
        assert np.array_equal(apply_op(apply_op(a, "flip_v"), "flip_v"), a)
        r = a
        for _ in range(4):
            r = apply_op(r, "rot90")
        assert np.array_equal(r, a)
        assert np.array_equal(
            apply_op(apply_op(a, "rot90"), "rot90"), apply_op(a, "rot180")
        )

    def test_crop_bounds_and_determinism(self):
        a = _arr()
        c1 = apply_op(a, "random_crop", "imgX", seed=7, crop=(10, 10))
        c2 = apply_op(a, "random_crop", "imgX", seed=7, crop=(10, 10))
        c3 = apply_op(a, "random_crop", "imgX", seed=8, crop=(10, 10))
        assert np.array_equal(c1, c2)
        assert c1.shape[:2] == (10, 10)
        assert not np.array_equal(c1, c3)  # seed changes the window
        cc = apply_op(a, "center_crop", crop=(10, 11))
        assert np.array_equal(cc, a[7:17, 3:14])
        with pytest.raises(ValueError):
            apply_op(a, "random_crop", crop=(100, 100))
        with pytest.raises(ValueError):
            apply_op(a, "nope")

    def test_distributed_matches_local_and_is_partition_invariant(self, spark):
        imgs = fixtures.images_df(spark, 6, tier="t2", partitions=3)
        out = augment_images(
            imgs, ops=("flip_h", "rot90", "random_crop"), crop=(8, 8), seed=3
        )
        rows = {(r.image_id, r.op): r for r in out.collect()}
        assert len(rows) == 18
        # local replica on one image
        rec = fixtures.image_record(2, tier="t2")
        arr = codecs.decode_image(rec["bytes"], rec["fmt"])
        if arr.ndim == 2:
            arr = arr[:, :, None]
        got = rows[(rec["image_id"], "rot90")]
        dec = codecs.decode_image(bytes(got.bytes), got.fmt)
        if dec.ndim == 2:
            dec = dec[:, :, None]
        assert np.array_equal(dec, np.rot90(arr, 1))
        # partition invariance: 1-partition run yields identical checksums
        one = augment_images(
            imgs.coalesce(1), ops=("flip_h", "rot90", "random_crop"),
            crop=(8, 8), seed=3,
        )
        a = sorted((r.image_id, r.op, r.checksum) for r in out.collect())
        b = sorted((r.image_id, r.op, r.checksum) for r in one.collect())
        assert a == b
