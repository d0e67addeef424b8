"""Stateful streaming operators (applyInPandasWithState).

The reference has no streaming; this is the engine-native obligation
from the north rule: custom stateful operators over an unbounded arriving
table. ``dedup_stream`` keeps one GroupState per content fingerprint so
a document (or image payload) that arrives again in ANY later
micro-batch — or a later availableNow run resumed from the same
checkpoint — is dropped exactly once, without re-reading prior output.

State layout: key = md5(normalized text), value = (seen: bool). First
arrival in the stream emits the row (min id within the batch group,
matching dedup_exact's deterministic keep rule) and flips the state; all
later arrivals see seen=true and emit nothing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    StringType,
    StructField,
    StructType,
)


def dedup_stream(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Drain all unprocessed files (availableNow) emitting only the
    first-ever row per normalized-text fingerprint; state persists in
    the checkpoint across runs. Returns after termination."""
    from ..functions.text import norm_text

    stream = spark.readStream.schema(schema).parquet(input_path)
    keyed = stream.withColumn("_fp", F.md5(norm_text(F.col(text_col))))

    out_schema = StructType(
        [
            StructField("fp", StringType()),
            StructField("kept_id", StringType()),
            StructField("text", StringType()),
        ]
    )
    state_schema = StructType([StructField("seen", BooleanType())])

    def first_seen(key, pdfs, state):
        if state.exists:
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        state.update((True,))
        first = rows.sort_values(id_col).iloc[0]
        yield pd.DataFrame(
            [
                {
                    "fp": key[0],
                    "kept_id": str(first[id_col]),
                    "text": str(first[text_col]),
                }
            ]
        )

    deduped = keyed.groupBy("_fp").applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
