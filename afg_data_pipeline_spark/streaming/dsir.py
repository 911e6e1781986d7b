"""Streaming DSIR: score each micro-batch of documents against the
importance distributions accumulated from every PRIOR batch — the
ingest-time form of operators/dsir.dsir_scores, with the bucket
distributions living in a persisted parquet store instead of being
recomputed per corpus pass.

A crawl ingest uses this to stamp every arriving document with a
target-domain importance score the moment it lands, against the
corpus-so-far: the store holds one (bucket, rc, tc) delta partition
per batch (rc = the batch's raw gram count in that bucket, tc = the
target-flagged subset's count), and batch k's scoring reads the
SUM over partitions batch_id < k.

Semantics note (deliberate, and pinned by tests): scores are
against the distribution-so-far, not the final corpus — replaying
the whole history through operators/dsir.dsir_scores gives the
retrospective scores; this sink gives the online ones. Batch 0
scores against the Laplace prior alone (all buckets equally likely
in both distributions → every log-ratio is 0 → every score is 0.0).

Idempotence (same-checkpoint recovery, the streaming/sinks.py
contract): both writes are dynamic partition overwrites keyed by
batch_id, and scoring reads ONLY store partitions with
batch_id < current — a replayed batch overwrites its own partitions
byte-identically and never sees its own deltas.

Scale shape: per batch, one gram pass over the BATCH (tiny), a
16^n_hex-row distribution read with partition pruning on batch_id,
and a broadcast of the 256-row log-ratio table — nothing corpus-
sized moves.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from afg_data_pipeline_spark.fs import store_exists
from afg_data_pipeline_spark.operators.dsir import (
    _bucket_spine,
    _gram_buckets,
)


def dsir_scoring_sink(
    store_dir: str,
    scores_dir: str,
    target_cond_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_hex: int = 2,
):
    """foreachBatch function: score the micro-batch against the
    prior batches' distributions, then append the batch's bucket
    deltas to the store.

    ``target_cond_sql`` is a SQL boolean expression over the batch
    rows marking target-domain membership (e.g. ``lang = 'en'``) —
    a string so the sink closure is checkpoint-safe (no captured
    Column bound to a dead session).

    Writes:
    - ``scores_dir``: (id, n_grams, score, batch_id) parquet;
    - ``store_dir``/buckets: (bucket, rc, tc, batch_id).
    """
    buckets_dir = posixpath.join(store_dir, "buckets")
    B = 16**n_hex

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        flagged = batch_df.withColumn(
            "__tgt", F.expr(target_cond_sql)
        )
        grams = _gram_buckets(
            flagged.select(id_col, text_col, "__tgt"),
            id_col,
            text_col,
            n,
            n_hex,
            extra_cols=("__tgt",),
        )
        doc_counts = (
            grams.groupBy("id", "bucket", "__tgt")
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=False)
        )
        spine = _bucket_spine(batch_df, n_hex)
        if store_exists(spark, buckets_dir):
            prior = (
                spark.read.parquet(buckets_dir)
                .filter(F.col("batch_id") < batch_id)
                .groupBy("bucket")
                .agg(
                    F.sum("rc").cast("bigint").alias("rc"),
                    F.sum("tc").cast("bigint").alias("tc"),
                )
            )
        else:
            prior = spine.select(
                "bucket",
                F.lit(0).cast("bigint").alias("rc"),
                F.lit(0).cast("bigint").alias("tc"),
            ).limit(0)
        dist = spine.join(prior, "bucket", "left").select(
            "bucket",
            F.coalesce(F.col("rc"), F.lit(0)).alias("rc"),
            F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
        )
        rtot = dist.agg(F.sum("rc").cast("bigint").alias("rt"))
        ttot = dist.agg(F.sum("tc").cast("bigint").alias("tt"))
        lr = (
            dist.crossJoin(F.broadcast(rtot))
            .crossJoin(F.broadcast(ttot))
            .select(
                "bucket",
                F.round(
                    (
                        F.log(
                            (F.col("tc") + 1).cast("double")
                            / (F.col("tt") + B).cast("double")
                        )
                        - F.log(
                            (F.col("rc") + 1).cast("double")
                            / (F.col("rt") + B).cast("double")
                        )
                    )
                    * F.lit(1e9),
                    0,
                )
                .cast("bigint")
                .alias("lrq"),
            )
        )
        scored = (
            doc_counts.join(F.broadcast(lr), "bucket")
            .groupBy("id")
            .agg(
                F.sum("c").cast("bigint").alias("n_grams"),
                F.sum(
                    F.col("c").cast("decimal(38,0)") * F.col("lrq")
                ).alias("sq"),
            )
        )
        (
            batch_df.select(F.col(id_col).alias("id"))
            .join(scored, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("n_grams"), F.lit(0))
                .cast("bigint")
                .alias("n_grams"),
                (
                    F.coalesce(F.col("sq"), F.lit(0)).cast("double")
                    / F.lit(1e9)
                ).alias("score"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(scores_dir)
        )
        (
            doc_counts.groupBy("bucket")
            .agg(
                F.sum("c").cast("bigint").alias("rc"),
                F.sum(F.when(F.col("__tgt"), F.col("c")))
                .cast("bigint")
                .alias("tc"),
            )
            .select(
                "bucket",
                "rc",
                F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(buckets_dir)
        )

    return write_batch


def run_dsir_scoring(
    stream_df: DataFrame,
    store_dir: str,
    scores_dir: str,
    checkpoint_dir: str,
    target_cond_sql: str,
    **kwargs,
) -> None:
    """Drain a document stream through the DSIR scoring sink
    (availableNow: process the backlog, then stop)."""
    q = (
        stream_df.writeStream.foreachBatch(
            dsir_scoring_sink(
                store_dir, scores_dir, target_cond_sql, **kwargs
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
