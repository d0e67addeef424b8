"""Distributed operators: tiling, warp, translate, spatial join, kNN,
rasterize, gridding, raster statistics.

Each module pairs a pure-numpy kernel (unit-testable without a JVM) with a
DataFrame operator that runs it inside Arrow-vectorized pandas UDFs
(`mapInPandas` / `applyInPandas`). Plans stay declarative: tile assignment,
envelope predicates and join keys are pure Column math that Catalyst prunes
and pushes down; only pixel work crosses into Python, in Arrow batches.
"""
