"""Execution-plan services: snapshot/manifest catalog shim (Iceberg-style
commits over plain Parquet), resumable stages, per-partition lineage and
metrics."""
