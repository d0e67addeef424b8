#!/usr/bin/env python
"""Package the engine for cluster submission: build dist/gdal_spark.zip
suitable for ``spark-submit --py-files`` (the north-rule deployment mode).

The zip contains only the library package (no tests/tools), rooted so that
``import gdal_spark`` works on every executor once the archive is on the
PYTHONPATH — exactly what --py-files does.

Usage:
    python tools/make_pyfiles.py [outdir]          # default dist/
    spark-submit --master <cluster> \\
        --py-files dist/gdal_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        your_job.py

A minimal your_job.py is any queries() entry, e.g.:

    from pyspark.sql import SparkSession
    import gdal_spark.sql as gsql
    from gdal_spark.operators.tile import assign_tiles
    spark = SparkSession.builder.getOrCreate()   # conf from spark-submit
    gsql.register_functions(spark)
    images = spark.read.parquet("s3://bucket/images/")
    assign_tiles(images, 12).write.parquet("...")

Smoke-verified in this sandbox:
    spark-submit --master 'local[4]' --py-files dist/gdal_spark.zip job.py
from an empty working directory (all imports resolve from the archive).

(`gdal_spark.session.get_spark` is the LOCAL convenience factory; under
spark-submit the builder comes pre-configured and executors import the
package from this archive.)
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(outdir: str = "dist") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "gdal_spark")
    os.makedirs(os.path.join(root, outdir), exist_ok=True)
    out = os.path.join(root, outdir, "gdal_spark.zip")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                arc = os.path.relpath(full, root)
                z.write(full, arc)
                n += 1
    print(f"{out}: {n} modules, {os.path.getsize(out)} bytes")
    return out


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "dist")
