"""Incremental (availableNow) drive over an append-only images table.

The reference has no streaming dataflow (SURVEY.md §1.3); the engine's
streaming obligation is bounded incremental processing with resumability:

- ``run_incremental_tiles``: Structured Streaming ``readStream`` over a
  parquet images directory, ``trigger(availableNow=True)`` so each run
  drains exactly the files not yet processed (checkpoint tracks file
  offsets), ``foreachBatch`` runs the normal batch tile pipeline and
  commits one snapshot per micro-batch. Late/duplicate rows are handled
  by the snapshot ``append`` anti-join (idempotent keys), not by
  watermarks — there is no event time in the domain.

The same pipeline code serves batch and streaming: foreachBatch hands us
a plain DataFrame.
"""

from __future__ import annotations

from ..plans.snapshots import SnapshotTable


def run_incremental_tiles(
    spark,
    images_path: str,
    table: SnapshotTable,
    checkpoint_dir: str,
    schema=None,
    zoom: int | None = None,
    tile_size: int = 256,
    resampling: str = "bilinear",
):
    """Drain all unprocessed files from images_path, tile them, commit a
    snapshot per micro-batch. Returns the list of snapshot ids committed
    in this run. Re-running immediately is a no-op (offsets + anti-join)."""
    from ..operators.tile import cut_base_tiles

    if schema is None:
        schema = spark.read.parquet(images_path).schema

    committed: list[int] = []

    def handle(batch_df, batch_id: int):
        tiles = cut_base_tiles(batch_df, zoom=zoom, tile_size=tile_size,
                               resampling=resampling)
        sid = table.append(
            tiles, ["z", "tx", "ty"], description=f"stream batch {batch_id}"
        )
        committed.append(sid)

    stream = (
        spark.readStream.schema(schema)
        .parquet(images_path)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return committed
