"""Streaming sinks beyond the built-ins: foreachBatch patterns.

Structured Streaming's exactly-once story for arbitrary
destinations is `foreachBatch` + an IDEMPOTENT write keyed by
``batchId``: the engine may re-run a batch after failure (at-least
-once delivery to the sink function), so the sink must make the
second delivery a no-op. The two canonical shapes:

- partition-overwrite: write each micro-batch to a
  ``batch_id=<id>`` partition with dynamic overwrite — a replayed
  batch overwrites its own partition with identical content.
  SCOPE: this guarantee covers recovery/restart from the SAME
  checkpoint, where the offset log pins each batchId to the same
  input rows. A fresh-checkpoint rerun is a new query — batch
  boundaries may differ (maxFilesPerTrigger, file-listing order),
  and stale batch_id partitions the rerun doesn't produce are NOT
  cleaned up; treat that as a backfill into an empty target, not
  a replay;
- merge/upsert: key-wise MERGE into the target (cdc_upsert shape);
  replay re-applies the same upserts, which is idempotent when the
  updates are deterministic.

This module implements the first (dependency-free on plain
parquet); the second exists batch-side as `cdc_upsert_snapshot`.
At 100 TB the pattern is unchanged — partitionBy(batch_id) keeps
each commit a directory rename, and downstream readers get
partition pruning on the batch axis for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def idempotent_parquet_sink(out_dir: str):
    """foreachBatch function writing each micro-batch to its own
    ``batch_id=<id>`` partition via dynamic partition overwrite —
    a replayed batch rewrites only its own partition with the same
    rows, so delivery is effectively exactly-once FOR recovery
    from the same checkpoint (the offset log fixes the
    batchId→rows mapping; see module docstring for why a
    fresh-checkpoint rerun is outside the guarantee)."""
    from pyspark.sql import functions as F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return write_batch


def run_foreach_batch(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain ``stream_df`` through the idempotent parquet sink with
    an availableNow trigger (process everything, then stop)."""
    q = (
        stream_df.writeStream.foreachBatch(
            idempotent_parquet_sink(out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
