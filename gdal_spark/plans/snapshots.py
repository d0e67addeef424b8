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


class _HadoopManifestIO:
    """Driver-side manifest IO through the Hadoop FileSystem API — the
    same abstraction Spark's own parquet reader/writer uses, so any URI
    scheme with a registered FileSystem (file://, hdfs://, s3a://, ...)
    works without code changes. The pointer swap is delete+rename: atomic
    on HDFS/posix; on eventually-consistent object stores a production
    deployment swaps this class for a conditional-put (as Iceberg does)."""

    def __init__(self, path: str):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "URI-scheme snapshot paths need an active SparkSession"
            )
        self._jvm = spark._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
            self._conf
        )

    def _p(self, s: str):
        return self._jvm.org.apache.hadoop.fs.Path(s)

    def exists(self, s: str) -> bool:
        return bool(self._fs.exists(self._p(s)))

    def mkdirs(self, s: str) -> None:
        self._fs.mkdirs(self._p(s))

    def read_text(self, s: str) -> str:
        stream = self._fs.open(self._p(s))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def replace_text(self, s: str, text: str) -> None:
        tmp = s + f".tmp-{uuid.uuid4().hex}"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        # Hadoop rename cannot atomically replace, so: back up the live
        # manifest, rename the new one in, then drop the backup. Every
        # rename's BOOLEAN return is checked (HDFS reports most failures
        # that way, not by throwing), and a failed swap restores the
        # backup instead of leaving the table pointer destroyed.
        target = self._p(s)
        bak = self._p(s + f".bak-{uuid.uuid4().hex}")
        had_old = bool(self._fs.exists(target))
        if had_old and not self._fs.rename(target, bak):
            self._fs.delete(self._p(tmp), False)
            raise IOError(f"manifest swap: could not back up {s}")
        if not self._fs.rename(self._p(tmp), target):
            if had_old:
                self._fs.rename(bak, target)  # restore the old pointer
            raise IOError(f"manifest swap: rename into {s} failed")
        if had_old:
            self._fs.delete(bak, False)


class _PosixManifestIO:
    """Plain-path fast path (no JVM round-trips; os.replace IS atomic)."""

    def exists(self, s: str) -> bool:
        return os.path.exists(s)

    def mkdirs(self, s: str) -> None:
        os.makedirs(s, exist_ok=True)

    def read_text(self, s: str) -> str:
        with open(s) as f:
            return f.read()

    def replace_text(self, s: str, text: str) -> None:
        tmp = s + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, s)


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self._uri = "://" in path
        self._io = None  # lazy: Hadoop IO needs an active session
        if not self._uri:
            os.makedirs(path, exist_ok=True)

    @property
    def io(self):
        if self._io is None:
            self._io = _HadoopManifestIO(self.path) if self._uri else _PosixManifestIO()
            if self._uri:
                self._io.mkdirs(self.path)
        return self._io

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "MANIFEST.json")

    def manifest(self) -> dict:
        if not self.io.exists(self._manifest_path):
            return {"snapshots": [], "current": None}
        return json.loads(self.io.read_text(self._manifest_path))

    def current_snapshot_id(self):
        return self.manifest()["current"]

    def _write_manifest(self, m: dict) -> None:
        self.io.replace_text(self._manifest_path, json.dumps(m, indent=1))

    def commit(
        self,
        df,
        description: str = "",
        lineage: dict | None = None,
        base_dirs: list[str] | None = None,
    ) -> int:
        """Materialize df as the next snapshot and swap the pointer.
        ``base_dirs``: prior data directories this snapshot ALSO covers
        (Iceberg-style append — the new dir holds only the new rows and
        the manifest records the full file list, so incremental commits
        write O(new), not O(table))."""
        m = self.manifest()
        snap_id = (m["current"] or 0) + 1
        snap_dir = os.path.join(self.path, f"snap-{snap_id}")
        df.write.mode("overwrite").parquet(snap_dir)
        m["snapshots"].append(
            {
                "id": snap_id,
                "dir": f"snap-{snap_id}",
                "dirs": list(base_dirs or []) + [f"snap-{snap_id}"],
                "ts": time.time(),
                "description": description,
                "lineage": lineage or {},
            }
        )
        m["current"] = snap_id
        self._write_manifest(m)
        return snap_id

    def _entry(self, m: dict, sid: int) -> dict | None:
        for e in m["snapshots"]:
            if e["id"] == sid:
                return e
        return None

    def read(self, spark, snapshot_id: int | None = None):
        m = self.manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            return None
        e = self._entry(m, sid)
        dirs = (e.get("dirs") if e else None) or [f"snap-{sid}"]
        return spark.read.parquet(
            *[os.path.join(self.path, d) for d in dirs]
        )

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
        """Incremental append: only not-yet-committed keys are written
        (one new data dir per commit, O(new rows) IO); the new snapshot's
        manifest entry references the prior snapshot's data dirs plus the
        new one, so reads still see one immutable table per snapshot and
        a k-batch incremental run writes O(total), not O(k * total)."""
        spark = df.sparkSession
        m = self.manifest()
        cur_id = m["current"]
        cur = self.read(spark)
        if cur is None:
            return self.commit(df, description)
        new = df.join(cur.select(*keys).dropDuplicates(keys), keys, "left_anti")
        prev = self._entry(m, cur_id)
        base_dirs = (prev.get("dirs") if prev else None) or [f"snap-{cur_id}"]
        return self.commit(new, description, base_dirs=base_dirs)
