"""`gdal pipeline` CLI analog (gdal_spark/pipeline.py).

Reference: apps/gdalalg_abstract_pipeline.h (the `!` step chaining),
apps/gdalalg_raster_pipeline.cpp / gdalalg_vector_pipeline.cpp (step
registries and option names). Parity tests lower each pipeline string
and compare against the directly-composed operator calls — the CLI
layer must be pure sugar over the same plans.
"""

import os

import numpy as np
import pytest

from gdal_spark import codecs, fixtures, formats, pipeline


class TestParse:
    def test_prefix_and_steps(self):
        kind, steps = pipeline.parse_pipeline(
            "gdal raster pipeline read in.tif "
            "! reproject --dst-crs=EPSG:3857 --resampling bilinear "
            "! write out.tif --compression=lzw"
        )
        assert kind == "raster"
        assert [s[0] for s in steps] == ["read", "reproject", "write"]
        assert steps[0][1] == ["in.tif"]
        assert steps[1][2] == {"dst-crs": "EPSG:3857",
                               "resampling": "bilinear"}
        assert steps[2][1] == ["out.tif"]
        assert steps[2][2] == {"compression": "lzw"}

    def test_quoting_and_flags(self):
        kind, steps = pipeline.parse_pipeline(
            "gdal vector pipeline read a.ndjson "
            "! filter --where=\"name = 'x y'\" "
            "! explode-collections ! write o.fgb"
        )
        assert kind == "vector"
        assert steps[1][2]["where"] == "name = 'x y'"
        # bare step with no options parses to an empty opts dict
        assert steps[2] == ("explode-collections", [], {})

    def test_flag_option_true(self):
        _, steps = pipeline.parse_pipeline(
            "read in.tif ! reproject --dst-crs=3857 "
            "--target-aligned-pixels ! write o.tif"
        )
        assert steps[1][2]["target-aligned-pixels"] is True

    def test_errors(self):
        with pytest.raises(ValueError, match="empty"):
            pipeline.parse_pipeline("gdal raster pipeline")
        with pytest.raises(ValueError, match="first step"):
            pipeline.parse_pipeline("reproject --dst-crs=3857 ! write o")

    def test_unknown_step(self, spark):
        """Step names validate BEFORE any read lowers (x.tif need not
        exist), like the CLI's parse-then-run."""
        with pytest.raises(ValueError, match="unknown raster step"):
            pipeline.run_pipeline(
                spark, "gdal raster pipeline read x.tif ! frobnicate")

    def test_kind_required(self, spark):
        with pytest.raises(ValueError, match="kind"):
            pipeline.run_pipeline(spark, "read x.unknownext ! info")


@pytest.fixture(scope="module")
def tif_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipe_tifs"))
    imgs = fixtures.images_df(spark, 3, tier="t1", partitions=1)
    formats.write_gtiff(imgs, d, compression="deflate")
    return d


class TestRasterPipeline:
    def test_clip_scale_select_parity(self, spark, tif_dir, tmp_path):
        """read ! clip ! scale ! select ! write lowers to exactly the
        directly-composed translate_images chain (bit-identical bytes)."""
        from gdal_spark.operators.translate import translate_images

        out = pipeline.run_pipeline(
            spark,
            f"gdal raster pipeline read {tif_dir}/*.tif "
            "! clip --window=2,2,12,10 "
            "! scale --src-min=0 --src-max=255 --dst-min=0 --dst-max=100 "
            "! select --band=1 "
            f"! write {tmp_path}/out.parquet",
        )
        base = pipeline._read_raster(spark, [f"{tif_dir}/*.tif"], {})
        want = translate_images(base, srcwin=(2, 2, 12, 10),
                                scale=(0.0, 255.0, 0.0, 100.0))
        want = translate_images(want, bands=[0])
        got = {r["image_id"]: bytes(r["bytes"])
               for r in out.select("image_id", "bytes").collect()}
        exp = {r["image_id"]: bytes(r["bytes"])
               for r in want.select("image_id", "bytes").collect()}
        assert got == exp and len(got) == 3
        # the write step actually wrote
        import glob
        assert glob.glob(f"{tmp_path}/out.parquet/part-*")

    def test_reproject_parity(self, spark, tif_dir):
        from gdal_spark.operators.warp import warp_images

        out = pipeline.run_pipeline(
            spark,
            f"gdal raster pipeline read {tif_dir}/*.tif "
            "! reproject --dst-crs=EPSG:4326 --resampling=bilinear",
        )
        base = pipeline._read_raster(spark, [f"{tif_dir}/*.tif"], {})
        want = warp_images(base, dst_srid=4326, resampling="bilinear")
        got = {r["image_id"]: bytes(r["bytes"])
               for r in out.select("image_id", "bytes").collect()}
        exp = {r["image_id"]: bytes(r["bytes"])
               for r in want.select("image_id", "bytes").collect()}
        assert got == exp

    def test_slope_matches_kernel(self, spark, tif_dir):
        from gdal_spark.operators.dem import dem_array

        out = pipeline.run_pipeline(
            spark,
            f"gdal raster pipeline read {tif_dir}/*.tif "
            "! slope --gradient-alg=Horn",
        ).collect()
        base = {r["image_id"]: r
                for r in pipeline._read_raster(
                    spark, [f"{tif_dir}/*.tif"], {}).collect()}
        assert len(out) == 3
        for r in out:
            src = base[r["image_id"]]
            arr = codecs.decode_image(bytes(src["bytes"]), src["fmt"])
            if arr.ndim == 3:
                arr = arr[:, :, 0]
            want = dem_array(
                arr.astype(np.float64), "slope",
                xres=abs(float(src["gt1"])), yres=abs(float(src["gt5"])),
            )
            got = codecs.decode_image(bytes(r["bytes"]), r["fmt"])
            np.testing.assert_allclose(
                got, np.nan_to_num(want, nan=-9999.0), rtol=1e-6)

    def test_unknown_option_lists_supported(self, spark, tif_dir):
        with pytest.raises(ValueError, match="unknown option"):
            pipeline.run_pipeline(
                spark,
                f"gdal raster pipeline read {tif_dir}/*.tif "
                "! resize --sizes=3,3")

    def test_gtiff_write_roundtrip(self, spark, tif_dir, tmp_path):
        """write back to .tif through the step and re-read: clip window
        survives the container round-trip."""
        d = str(tmp_path / "clipped")
        pipeline.run_pipeline(
            spark,
            f"gdal raster pipeline read {tif_dir}/*.tif "
            "! clip --window=0,0,8,8 "
            f"! write {d} --compression=lzw",
        )
        back = pipeline.run_pipeline(
            spark, f"gdal raster pipeline read {d}/*.tif ! info")
        rows = back.collect()
        assert len(rows) == 3
        assert all(r["w"] == 8 and r["h"] == 8 for r in rows)


@pytest.fixture(scope="module")
def ndjson_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipe_vec"))
    p = os.path.join(d, "feats.ndjson")
    feats = fixtures.features_df(spark, 80)
    out = (feats.withColumnRenamed("wkb", "geometry")
           .drop("minx", "miny", "maxx", "maxy"))
    formats.write_geojson_seq(out, p)
    return p


class TestVectorPipeline:
    def test_filter_simplify_write_parity(self, spark, ndjson_path,
                                          tmp_path):
        from gdal_spark.operators.vector import (
            simplify_features, spatial_filter, vector_filter)

        bbox = "-2000000,-2000000,2000000,2000000"
        out = pipeline.run_pipeline(
            spark,
            f"gdal vector pipeline read {ndjson_path} "
            f"! filter --bbox={bbox} --where=\"pop > 100\" "
            "! simplify --tolerance=25 "
            f"! write {tmp_path}/out.fgb",
        )
        base = pipeline._read_vector(spark, [ndjson_path], {})
        want = simplify_features(
            vector_filter(
                spatial_filter(base, -2000000, -2000000, 2000000, 2000000),
                "pop > 100"),
            25.0)
        got = sorted((r["fid"], bytes(r["wkb"]))
                     for r in out.select("fid", "wkb").collect())
        exp = sorted((r["fid"], bytes(r["wkb"]))
                     for r in want.select("fid", "wkb").collect())
        assert got == exp and len(got) > 0
        back = formats.scan_flatgeobuf(spark, str(tmp_path / "out.fgb"))
        assert back.count() == len(got)

    def test_directory_input_expands(self, spark, ndjson_path):
        """Passing the sink DIRECTORY (not a part glob) works."""
        n_direct = pipeline.run_pipeline(
            spark, f"gdal vector pipeline read {ndjson_path}").count()
        assert n_direct == 80

    def test_sql_and_select_steps(self, spark, ndjson_path):
        out = pipeline.run_pipeline(
            spark,
            f"gdal vector pipeline read {ndjson_path} "
            "! sql --statement=\"SELECT fid, pop FROM input "
            "WHERE pop > 300 ORDER BY fid\"",
        )
        assert out.columns == ["fid", "pop"]
        assert all(r["pop"] > 300 for r in out.collect())
        sel = pipeline.run_pipeline(
            spark,
            f"gdal vector pipeline read {ndjson_path} "
            "! select --fields=pop,name",
        )
        assert set(sel.columns) == {"fid", "wkb", "minx", "miny",
                                    "maxx", "maxy", "pop", "name"}
        with pytest.raises(ValueError, match="unknown field"):
            pipeline.run_pipeline(
                spark,
                f"gdal vector pipeline read {ndjson_path} "
                "! select --fields=nope")

    def test_narrow_steps_fuse_single_stage(self, spark, ndjson_path):
        """The whole narrow pipeline is ONE Catalyst plan: no Exchange
        between filter/simplify/buffer steps."""
        out = pipeline.run_pipeline(
            spark,
            f"gdal vector pipeline read {ndjson_path} "
            "! filter --where=\"pop > 10\" "
            "! simplify --tolerance=5 "
            "! buffer --distance=10",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
