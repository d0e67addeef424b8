"""InterpolateAtPoint parity vs direct numpy sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import fixtures
from gdal_spark.operators.interpolate import interpolate_at_points
from gdal_spark.operators.warp import apply_gt, invert_gt
from gdal_spark.resample import sample_bilinear


@pytest.fixture(scope="module")
def imgs(spark):
    df = fixtures.images_df(spark, 8, tier="t2", partitions=2).where(
        F.col("srid") == 3857
    ).persist()
    df.count()
    yield df
    df.unpersist()


def test_interpolate_matches_numpy(spark, imgs):
    metas = imgs.select(
        "image_id", "fmt", "w", "h", "gt0", "gt1", "gt3", "gt5", "minx", "miny", "maxx", "maxy"
    ).collect()
    # build points at known fractional positions inside each image
    pts = []
    pid = 0
    for m in metas:
        for fx, fy in ((0.3, 0.4), (0.71, 0.62)):
            gx = m.gt0 + fx * m.w * m.gt1
            gy = m.gt3 + fy * m.h * m.gt5
            pts.append((pid, float(gx), float(gy), m.image_id, fx, fy))
            pid += 1
    pdf = spark.createDataFrame(
        [(p[0], p[1], p[2]) for p in pts], "pid long, x double, y double"
    )
    out = interpolate_at_points(pdf, imgs, resampling="bilinear")
    got = {(r.pid, r.image_id, r.band): r.value for r in out.collect()}

    by_id = {}
    for p in pts:
        by_id.setdefault(p[3], []).append(p)
    n_checked = 0
    for m in metas:
        spec = fixtures.image_spec(int(m.image_id[3:]))
        if spec["fmt"] == "jpg":
            continue  # lossy decode: allclose not exact; covered by PSNR tests
        arr = fixtures.pattern_array(spec)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        for pid_, gx, gy, iid, fx, fy in by_id.get(m.image_id, []):
            ppx = np.array([fx * m.w])
            ppy = np.array([fy * m.h])
            for b in range(arr.shape[2]):
                expected, _ = sample_bilinear(arr[:, :, b].astype(float), ppx, ppy)
                key = (pid_, iid, b)
                if key in got:
                    assert abs(got[key] - expected[0]) < 1e-9, key
                    n_checked += 1
    assert n_checked > 0


def test_points_outside_footprints_drop(spark, imgs):
    pdf = spark.createDataFrame(
        [(0, 1.9e7, 1.9e7), (1, -1.95e7, -1.8e7)], "pid long, x double, y double"
    )
    # points in empty ocean corners: most likely no image contains them;
    # the operator must simply produce no rows for non-contained points
    out = interpolate_at_points(pdf, imgs)
    rows = out.collect()
    contained = {
        r.pid
        for r in pdf.join(
            imgs.select("minx", "miny", "maxx", "maxy"),
            (F.col("x") >= F.col("minx")) & (F.col("x") <= F.col("maxx"))
            & (F.col("y") >= F.col("miny")) & (F.col("y") <= F.col("maxy")),
            "inner",
        ).select("pid").collect()
    }
    assert {r.pid for r in rows} == contained


class TestPointSrid4326:
    def test_4326_points_match_mercator_envelopes(self, spark):
        """Phase-1 envelope join must convert 4326 point coords to the
        footprint's mercator meters (previously degrees were compared
        against meters and nothing ever matched)."""
        import numpy as np

        from gdal_spark import codecs, fixtures
        from gdal_spark.grid import MercatorGrid
        from gdal_spark.operators.interpolate import interpolate_at_points

        imgs = fixtures.images_df(spark, 4, tier="t2", partitions=2)
        # build 4326 query points at each image's center
        merc = MercatorGrid()
        rows = []
        for i in range(4):
            rec = fixtures.image_record(i, tier="t2")
            cx = (rec["minx"] + rec["maxx"]) / 2.0
            cy = (rec["miny"] + rec["maxy"]) / 2.0
            lat, lon = merc.meters_to_latlon(np.array([cx]), np.array([cy]))
            rows.append((i, float(lon[0]), float(lat[0])))
        pts = spark.createDataFrame(rows, "pid long, x double, y double")
        out = interpolate_at_points(pts, imgs, point_srid=4326).collect()
        assert len(out) > 0
        assert {r.pid for r in out} == {0, 1, 2, 3}
        assert all(r.valid for r in out)


class TestLocationInfo:
    def test_matches_direct_indexing(self, spark, imgs):
        from gdal_spark.operators.interpolate import location_info

        metas = imgs.select(
            "image_id", "fmt", "w", "h", "gt0", "gt1", "gt3", "gt5"
        ).collect()
        pts, expected = [], {}
        pid = 0
        for m in metas:
            spec = fixtures.image_spec(int(m.image_id[3:]))
            arr = fixtures.pattern_array(spec)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            for fx, fy in ((0.305, 0.41), (0.9, 0.1)):
                gx = m.gt0 + fx * m.w * m.gt1
                gy = m.gt3 + fy * m.h * m.gt5
                pts.append((pid, float(gx), float(gy)))
                px, py = int(np.floor(fx * m.w)), int(np.floor(fy * m.h))
                if spec["fmt"] != "jpg":  # lossy: cell id checked, not value
                    for b in range(arr.shape[2]):
                        expected[(pid, m.image_id, b)] = (
                            px, py, float(arr[py, px, b])
                        )
                else:
                    expected[(pid, m.image_id, 0)] = (px, py, None)
                pid += 1
        pdf = spark.createDataFrame(pts, "pid long, x double, y double")
        out = location_info(pdf, imgs)
        got = {
            (r.pid, r.image_id, r.band): (r.pixel, r.line, r.value, r.valid)
            for r in out.collect()
        }
        checked = 0
        for k, (px, py, v) in expected.items():
            gpx, gpy, gv, gvalid = got[k]
            assert (gpx, gpy) == (px, py) and gvalid
            if v is not None:
                assert gv == v
                checked += 1
        assert checked > 10

    def test_outside_point_invalid(self, spark, imgs):
        from gdal_spark.operators.interpolate import location_info

        m = imgs.select("image_id", "w", "h", "gt0", "gt1", "gt3", "gt5",
                        "minx", "maxx", "miny", "maxy").collect()[0]
        # inside the envelope join box but in the last half-pixel column,
        # nudged past the right edge via a tiny epsilon beyond w
        gx = m.gt0 + (m.w + 0.2) * m.gt1
        gy = m.gt3 + 0.5 * m.h * m.gt5
        pdf = spark.createDataFrame([(0, float(gx), float(gy))],
                                    "pid long, x double, y double")
        out = location_info(pdf, imgs.where(F.col("image_id") == m.image_id))
        rows = out.collect()
        # either the envelope excluded it entirely, or it reports invalid
        for r in rows:
            assert not r.valid and np.isnan(r.value)
