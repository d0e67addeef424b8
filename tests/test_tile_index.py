"""gdaltindex analog (operators.vector.raster_tile_index)."""

import numpy as np
import pandas as pd

from gdal_spark.operators.vector import raster_tile_index
from gdal_spark.operators.warp import geo_transform_points


def _imgs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["image_id", "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
                     "w", "h", "srid"],
        )
    )


class TestTileIndex:
    def test_native_ring_order_and_formatting(self, spark):
        df = _imgs(spark, [("a", 100.0, 10.0, 0.0, 5000.0, 0.0, -10.0,
                            4, 2, 3857)])
        r = raster_tile_index(df).collect()[0]
        assert r.location == "a" and r.srid == 3857
        # gdaltindex ring: (0,0) (w,0) (w,h) (0,h) close
        assert r.wkt == (
            "POLYGON((100.000 5000.000,140.000 5000.000,"
            "140.000 4980.000,100.000 4980.000,100.000 5000.000))"
        )

    def test_rotated_geotransform(self, spark):
        df = _imgs(spark, [("rot", 0.0, 1.0, 0.5, 0.0, 0.25, -1.0,
                            2, 2, 3857)])
        r = raster_tile_index(df).collect()[0]
        # corner (w,h) = (2*1 + 2*0.5, 2*0.25 + 2*-1) = (3, -1.5)
        assert "3.000 -1.500" in r.wkt

    def test_t_srs_reprojection_matches_transform(self, spark):
        # 4326 source reprojected to 3857 corners
        df = _imgs(spark, [("g", 10.0, 0.01, 0.0, 50.0, 0.0, -0.01,
                            100, 50, 4326)])
        r = raster_tile_index(df, t_srs=3857).collect()[0]
        assert r.srid == 3857
        xs = np.array([10.0, 11.0, 11.0, 10.0, 10.0])
        ys = np.array([50.0, 50.0, 49.5, 49.5, 50.0])
        tx, ty = geo_transform_points(xs, ys, 4326, 3857)
        want = (
            "POLYGON(("
            + ",".join(f"{x:.3f} {y:.3f}" for x, y in zip(np.round(tx, 3), np.round(ty, 3)))
            + "))"
        )
        assert r.wkt == want

    def test_t_srs_mixed_source_srids(self, spark):
        df = _imgs(spark, [
            ("m1", 10.0, 0.01, 0.0, 50.0, 0.0, -0.01, 10, 10, 4326),
            ("m2", 1000000.0, 100.0, 0.0, 6000000.0, 0.0, -100.0, 10, 10, 3857),
        ])
        got = {r.location: r for r in raster_tile_index(df, t_srs=3857).collect()}
        # the already-3857 raster passes through unprojected
        assert got["m2"].wkt.startswith("POLYGON((1000000.000 6000000.000,")
        assert got["m1"].srid == 3857 and got["m1"].wkt != got["m2"].wkt

    def test_no_shuffle_native_path(self, spark):
        df = _imgs(spark, [("a", 0.0, 1.0, 0.0, 0.0, 0.0, -1.0, 2, 2, 3857)])
        plan = raster_tile_index(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
