"""Snapshot/manifest catalog shim — Iceberg semantics over plain Parquet.

The north rule requires every stage to be resumable from committed
snapshots. With no Iceberg runtime jars in the container (SURVEY.md env
facts), this shim reproduces the snapshot contract the engine needs:

- ``commit(df, keys)``   : write a new immutable snapshot directory
  ``<table>/snap-<n>/`` + atomically update ``<table>/MANIFEST.json``
  (write-temp + rename — the same atomic-pointer-swap trick as Iceberg's
  metadata.json). Data files are parquet; re-running a failed commit
  leaves no partial state visible because the manifest still points at
  the previous snapshot.
- ``read(spark)``        : read the current snapshot (or a time-traveled
  older one by id).
- ``anti_join_pending(df, keys)`` : the resume primitive — drop rows whose
  key is already committed (gdal2tiles --resume file-exists skip,
  gdal2tiles.py:2848-2851, as a distributed left-anti join).
- ``append(df, keys)``   : anti-join + union with current = incremental
  append snapshot.

This is the same interface an Iceberg-backed deployment implements with
``spark.read.format("iceberg")`` + MERGE — swap the class, keep the
pipeline.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST.json")

    def manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": [], "current": None}
        with open(self._manifest_path) as f:
            return json.load(f)

    def current_snapshot_id(self):
        return self.manifest()["current"]

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic pointer swap

    def commit(self, df, description: str = "", lineage: dict | None = None) -> int:
        """Materialize df as the next snapshot and swap the pointer."""
        m = self.manifest()
        snap_id = (m["current"] or 0) + 1
        snap_dir = os.path.join(self.path, f"snap-{snap_id}")
        df.write.mode("overwrite").parquet(snap_dir)
        m["snapshots"].append(
            {
                "id": snap_id,
                "dir": f"snap-{snap_id}",
                "ts": time.time(),
                "description": description,
                "lineage": lineage or {},
            }
        )
        m["current"] = snap_id
        self._write_manifest(m)
        return snap_id

    def read(self, spark, snapshot_id: int | None = None):
        m = self.manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            return None
        return spark.read.parquet(os.path.join(self.path, f"snap-{sid}"))

    def exists(self) -> bool:
        return self.current_snapshot_id() is not None

    def anti_join_pending(self, df, keys: list[str]):
        """Rows of df not yet committed (the resume skip)."""
        spark = df.sparkSession
        cur = self.read(spark)
        if cur is None:
            return df
        return df.join(cur.select(*keys).dropDuplicates(keys), keys, "left_anti")

    def append(self, df, keys: list[str], description: str = "") -> int:
        """Incremental append: only not-yet-committed keys are added; the
        result is a brand-new immutable snapshot (never in-place)."""
        spark = df.sparkSession
        cur = self.read(spark)
        if cur is None:
            return self.commit(df, description)
        new = df.join(cur.select(*keys).dropDuplicates(keys), keys, "left_anti")
        merged = cur.unionByName(new, allowMissingColumns=True)
        return self.commit(merged, description)
