"""gdal_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates GDAL's warp / translate / tile semantics (reference: Esri/gdal at
/root/reference, GDAL ~3.12-dev) as distributed DataFrame operators over
Parquet/Iceberg tables of image+caption rows:

- ``gdal_spark.grid``      — GlobalMercator / GlobalGeodetic tile math
  (gdal2tiles.py:315-530 semantics), geo_query window math (2964-3006).
- ``gdal_spark.cells``     — quadkey-style int64 cell ids (H3/S2 analog),
  envelope covering, k-ring expansion.
- ``gdal_spark.geom``      — WKB parse/build, ray-casting point-in-ring
  (ogr/ogrlinearring.cpp:453-531), polygon-with-holes containment
  (ogr/ogrpolygon.cpp:780-812), envelopes, distance.
- ``gdal_spark.codecs``    — pure numpy+zlib PNG, RAW, and a lossy
  DCT codec (PSNR>=40 dB gate).
- ``gdal_spark.checksum``  — GDAL golden checksum (alg/gdalchecksum.cpp:48-253).
- ``gdal_spark.operators`` — tiling, warp/translate, spatial join, kNN,
  rasterize, grid interpolation, raster stats.
- ``gdal_spark.functions`` — text analysis, dedup (exact/minhash/simhash),
  similarity search, multimodal column plumbing.
- ``gdal_spark.plans``     — snapshot/manifest shim (Iceberg-style commits,
  resume anti-join), metrics, lineage.

Everything is DataFrame-first: plans are declared with pyspark.sql and
Catalyst optimizes them; pixel work runs in Arrow-vectorized pandas UDFs.
No per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
