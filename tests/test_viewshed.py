"""Viewshed (alg/viewshed LOS semantics) vs closed-form scenes."""

import numpy as np
import pytest

from gdal_spark.operators.viewshed import viewshed_array, viewshed_images


class TestViewshedArray:
    def test_flat_all_visible(self):
        v = viewshed_array(np.zeros((32, 32)), 16, 16, oz=2.0)
        assert (v == 255).all()

    def test_wall_shadows_far_side(self):
        dem = np.zeros((32, 32))
        dem[:, 20] = 50.0
        v = viewshed_array(dem, 10, 16, oz=2.0)
        assert v[16, 5] == 255    # before the wall
        assert v[16, 20] == 255   # wall top visible
        assert v[16, 25] == 0     # behind the wall
        assert v[16, 31] == 0

    def test_hill_shadow_cone(self):
        dem = np.zeros((32, 32))
        dem[14:18, 14:18] = 10.0
        v = viewshed_array(dem, 2, 16, oz=1.0)
        assert v[16, 8] == 255
        assert v[16, 28] == 0
        # off-axis cells not behind the hill stay visible
        assert v[2, 28] == 255

    def test_target_height_sees_over(self):
        dem = np.zeros((32, 32))
        dem[:, 20] = 5.0
        hidden = viewshed_array(dem, 10, 16, oz=2.0)
        seen = viewshed_array(dem, 10, 16, oz=2.0, tz=20.0)
        assert hidden[16, 28] == 0
        assert seen[16, 28] == 255  # tall targets visible over the wall

    def test_max_distance(self):
        v = viewshed_array(np.zeros((32, 32)), 16, 16, oz=2.0, max_distance=5.0)
        assert v[16, 19] == 255 and v[16, 30] == 0

    def test_observer_cell_always_visible(self):
        dem = np.full((16, 16), 7.0)
        v = viewshed_array(dem, 8, 8, oz=0.5)
        assert v[8, 8] == 255


class TestViewshedImages:
    def test_df_operator(self, spark):
        from gdal_spark import codecs as C

        dem = np.zeros((32, 32), dtype=np.uint8)
        dem[:, 20] = 200
        row = ("d1", bytearray(C.encode_png(dem)), "png")
        df = spark.createDataFrame([row], "image_id string, bytes binary, fmt string")
        out = viewshed_images(df, ox=10, oy=16, oz=2.0).collect()[0]
        mask = np.frombuffer(bytes(out.data), dtype=np.uint8).reshape(32, 32)
        assert mask[16, 5] == 255 and mask[16, 25] == 0
        assert 0.0 < out.visible_frac < 1.0
