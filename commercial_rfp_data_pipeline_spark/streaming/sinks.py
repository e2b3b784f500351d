"""Exactly-once streaming file sink (SURVEY.md §2.11 streaming
extension; the reference has no streaming — this completes the
extension's sink story).

``foreachBatch`` invokes the batch function AT-LEAST-ONCE: if the
driver dies between the sink write and the checkpoint commit, the same
(batch_id, data) pair is re-invoked on restart from the checkpoint.
End-to-end exactly-once therefore requires the sink write to be
IDEMPOTENT in ``batch_id`` — the contract Spark's docs put on the
user. For a parquet sink the standard recipe, used here: write each
micro-batch to its own ``batch_id=N`` partition directory with
overwrite mode, so a replayed batch OVERWRITES its own directory with
identical rows instead of appending duplicates. Readers see the whole
output as one partitioned table (``spark.read.parquet(out_path)``
discovers ``batch_id`` as a partition column).

Scale notes: each micro-batch is one atomic directory rename away from
visible; the checkpoint (offsets + commits log) lives on the reliable
store next to the data in production. A transactional table format
would subsume this with a MERGE, but the batch_id-partition overwrite
needs nothing beyond parquet + a filesystem with atomic rename.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def exactly_once_parquet_sink(
    df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    on_batch_written: Callable[[int], None] | None = None,
) -> StreamingQuery:
    """Start ``df`` streaming into ``out_path`` with exactly-once
    delivery by idempotent batch_id-keyed overwrite. Processes all
    currently-available input (availableNow trigger) and stops — call
    again with the same ``checkpoint_path`` to resume after failure or
    pick up new data; committed batches are never re-emitted.

    ``on_batch_written`` is a test seam invoked AFTER the sink write
    but BEFORE Spark commits the batch to the checkpoint — raising
    from it simulates the crash window that makes at-least-once sinks
    duplicate data."""

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )
        if on_batch_written is not None:
            on_batch_written(batch_id)

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
