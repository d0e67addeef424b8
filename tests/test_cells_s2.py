"""S2 cell ids: automaton-table consistency, encode/decode round trips,
Hilbert continuity (within and ACROSS faces), hierarchy bit math, tokens,
conservative rectangle covering, and Spark-Column == numpy parity."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark import cells_s2 as s2

U = np.uint64


def _rand_lonlat(n, seed=42):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-89.9, 89.9, n)


class TestTables:
    def test_ij2pos_inverse_of_pos2ij(self):
        for ori in range(4):
            assert sorted(s2.POS2IJ[ori]) == [0, 1, 2, 3]
            for pos in range(4):
                assert s2.IJ2POS[ori, s2.POS2IJ[ori, pos]] == pos

    def test_lookup_tables_match_2bit_automaton(self):
        lon, lat = _rand_lonlat(3000)
        x, y, z = s2._lonlat_to_xyz(lon, lat)
        face, u, v = s2._xyz_to_face_uv(x, y, z)
        i = s2._st_to_ij(s2._uv_to_st(u))
        j = s2._st_to_ij(s2._uv_to_st(v))
        assert np.array_equal(
            s2.leaf_from_face_ij(face, i, j),
            s2._leaf_from_face_ij_2bit(face, i, j),
        )

    def test_st_uv_inverse(self):
        s = np.linspace(0.0, 1.0, 1001)
        np.testing.assert_allclose(s2._uv_to_st(s2._st_to_uv(s)), s, atol=1e-15)


class TestRoundTrips:
    def test_decode_inverts_encode(self):
        lon, lat = _rand_lonlat(3000, seed=1)
        x, y, z = s2._lonlat_to_xyz(lon, lat)
        face, u, v = s2._xyz_to_face_uv(x, y, z)
        i = s2._st_to_ij(s2._uv_to_st(u))
        j = s2._st_to_ij(s2._uv_to_st(v))
        leaf = s2.leaf_from_face_ij(face, i, j)
        f2, i2, j2, _ = s2.cell_face_ij(leaf, 30)
        assert np.array_equal(face, f2)
        assert np.array_equal(i, i2)
        assert np.array_equal(j, j2)

    @pytest.mark.parametrize("level", [0, 1, 5, 12, 20, 30])
    def test_center_reencodes_to_same_cell(self, level):
        lon, lat = _rand_lonlat(500, seed=level + 2)
        cell = s2.cell_at_level(s2.leaf_from_lonlat(lon, lat), level)
        clon, clat = s2.cell_center_lonlat(cell, level)
        assert np.array_equal(
            s2.cell_at_level(s2.leaf_from_lonlat(clon, clat), level), cell
        )

    def test_token_round_trip(self):
        lon, lat = _rand_lonlat(200, seed=9)
        for level in (3, 12, 30):
            cell = s2.cell_at_level(s2.leaf_from_lonlat(lon, lat), level)
            assert np.array_equal(s2.from_token(s2.token(cell)), cell)


class TestHierarchy:
    def test_level_parent_children_ranges(self):
        lon, lat = _rand_lonlat(1000, seed=3)
        leaf = s2.leaf_from_lonlat(lon, lat)
        c12 = s2.cell_at_level(leaf, 12)
        assert np.all(s2.level_of(leaf) == 30)
        assert np.all(s2.level_of(c12) == 12)
        assert np.all(s2.contains(c12, leaf))
        p = s2.parent(c12)
        assert np.all(s2.level_of(p) == 11)
        assert np.all(s2.contains(p, c12))
        ch = s2.children(c12)
        assert ch.shape == (1000, 4)
        assert np.all(s2.level_of(ch) == 13)
        assert np.all(s2.contains(c12[:, None], ch))
        # children exactly tile the parent's range
        rmin = s2.range_min(c12).view(U)
        rmax = s2.range_max(c12).view(U)
        cmin = s2.range_min(ch).view(U)
        cmax = s2.range_max(ch).view(U)
        assert np.all(cmin[:, 0] == rmin)
        assert np.all(cmax[:, 3] == rmax)
        # between sibling ranges sits exactly ONE integer — an invalid id
        # (trailing one at an odd bit position), so child ranges + 3 gap
        # values tile the parent range exactly
        assert np.all(cmin[:, 1:] == cmax[:, :3] + U(2))

    def test_face_anchors(self):
        # level-0 cell of (0,0) is face 0 -> id 0x1000000000000000; the
        # north pole is face 2 (+z), south pole face 5 (-z)
        c0 = s2.cell_at_level(s2.leaf_from_lonlat([0.0], [0.0]), 0)
        assert int(c0.view(U)[0]) == 0x1000000000000000
        for lat, want in ((90.0, 2), (-90.0, 5)):
            lf = s2.leaf_from_lonlat([0.0], [lat])
            assert int(lf.view(U)[0] >> U(61)) == want


class TestHilbertCurve:
    def test_continuity_within_face(self):
        lon, lat = _rand_lonlat(3000, seed=4)
        leaf = s2.leaf_from_lonlat(lon, lat)
        nxt = (leaf.view(U) + U(2)).view(np.int64)  # next position on curve
        same = (nxt.view(U) >> U(61)) == (leaf.view(U) >> U(61))
        f1, i1, j1, _ = s2.cell_face_ij(leaf[same], 30)
        f2, i2, j2, _ = s2.cell_face_ij(nxt[same], 30)
        assert np.array_equal(f1, f2)
        assert np.all(np.abs(i2 - i1) + np.abs(j2 - j1) == 1)

    def test_continuity_across_faces(self):
        # the face-f curve's LAST leaf must be spatially adjacent to the
        # face-(f+1) curve's FIRST leaf — pins the face layout AND the
        # face&1 starting orientation
        for f in range(5):
            last = np.array(
                [(U(f) << U(61)) | ((U(1) << U(61)) - U(1))]
            ).view(np.int64)
            first = np.array([(U(f + 1) << U(61)) | U(1)]).view(np.int64)
            lo1, la1 = s2.cell_center_lonlat(last, 30)
            lo2, la2 = s2.cell_center_lonlat(first, 30)
            p1 = np.array(s2._lonlat_to_xyz(lo1, la1))
            p2 = np.array(s2._lonlat_to_xyz(lo2, la2))
            gap = float(np.linalg.norm(p1 - p2))
            assert gap < 3e-9  # ~one leaf-cell diagonal on the unit sphere


class TestCovering:
    def test_cover_rect_is_superset(self):
        rng = np.random.default_rng(11)
        for lon0, lat0, lon1, lat1, level in (
            (-10.0, 40.0, 5.0, 50.0, 8),
            (170.0, -20.0, 179.5, -5.0, 6),
            (-60.0, 80.0, 60.0, 89.5, 5),  # near-pole
        ):
            cov = set(s2.cover_rect(lon0, lat0, lon1, lat1, level).tolist())
            assert cov
            lon = rng.uniform(lon0, lon1, 1500)
            lat = rng.uniform(lat0, lat1, 1500)
            cells = s2.cell_at_level(s2.leaf_from_lonlat(lon, lat), level)
            missing = set(cells.tolist()) - cov
            assert not missing
            assert all(s2.level_of(np.array(list(cov))) == level)


class TestSparkParity:
    def test_column_encoder_matches_numpy(self, spark):
        lon, lat = _rand_lonlat(4000, seed=5)
        df = spark.createDataFrame(
            pd.DataFrame({"pid": np.arange(4000), "lon": lon, "lat": lat})
        )
        out = s2.with_s2_cell(df, "lon", "lat", level=30, out="leaf")
        out = s2.with_s2_cell(out, "lon", "lat", level=12, out="c12")
        out = out.withColumn("c5", s2.col_cell_at_level("c12", 5))
        pdf = out.orderBy("pid").toPandas()
        leaf = s2.leaf_from_lonlat(lon, lat)
        assert np.array_equal(pdf["leaf"].to_numpy(), leaf)
        assert np.array_equal(pdf["c12"].to_numpy(), s2.cell_at_level(leaf, 12))
        assert np.array_equal(pdf["c5"].to_numpy(), s2.cell_at_level(leaf, 5))
        # tmp columns are dropped
        assert [c for c in pdf.columns if c.startswith("_s2")] == []

    def test_cell_join_key_poles_and_dateline(self, spark):
        # encoder is total: poles, dateline, equator-prime intersection
        pts = pd.DataFrame(
            {
                "pid": range(6),
                "lon": [0.0, 180.0, -180.0, 0.0, 0.0, 179.999],
                "lat": [0.0, 10.0, 10.0, 90.0, -90.0, -89.999],
            }
        )
        out = s2.with_s2_cell(
            spark.createDataFrame(pts), "lon", "lat", 10, "cell"
        ).orderBy("pid").toPandas()
        ref = s2.cell_at_level(
            s2.leaf_from_lonlat(pts["lon"].to_numpy(), pts["lat"].to_numpy()),
            10,
        )
        assert np.array_equal(out["cell"].to_numpy(), ref)


class TestHexBin:
    def test_nearest_center_invariant(self):
        from gdal_spark.cells import hex_cell, hex_center

        rng = np.random.default_rng(0)
        size = 250000.0
        x = rng.uniform(-2e7, 2e7, 20000)
        y = rng.uniform(-2e7, 2e7, 20000)
        q, r = hex_cell(x, y, size)
        cx, cy = hex_center(q, r, size)
        d0 = np.hypot(x - cx, y - cy)
        assert d0.max() <= size * 1.0000001  # within circumradius
        for dq in (-1, 0, 1):
            for dr in (-1, 0, 1):
                if dq == dr == 0:
                    continue
                nx, ny = hex_center(q + dq, r + dr, size)
                assert np.all(d0 <= np.hypot(x - nx, y - ny) + 1e-6)

    def test_column_matches_numpy(self, spark):
        from pyspark.sql import functions as F

        from gdal_spark.cells import col_hex_cell, hex_cell

        rng = np.random.default_rng(1)
        n = 5000
        pdf = pd.DataFrame(
            {
                "pid": np.arange(n),
                "x": rng.uniform(-2e7, 2e7, n),
                "y": rng.uniform(-2e7, 2e7, n),
            }
        )
        q, r = col_hex_cell(F.col("x"), F.col("y"), 100000.0)
        out = (
            spark.createDataFrame(pdf)
            .select("pid", q.alias("q"), r.alias("r"))
            .orderBy("pid")
            .toPandas()
        )
        nq, nr = hex_cell(pdf["x"].to_numpy(), pdf["y"].to_numpy(), 100000.0)
        assert np.array_equal(out["q"].to_numpy(), nq)
        assert np.array_equal(out["r"].to_numpy(), nr)
