"""Distributed prefix sums that never funnel a group through one task.

A running total expressed as ``Window.partitionBy(g).orderBy(k)`` caps
parallelism at the number of distinct groups: with a handful of
languages over a 100 TB corpus, the largest language's entire stream
sorts and sums inside a single task.  The classic fix is the two-pass
sharded scan (the same decomposition GPU/MPI scan kernels use):

  1. split each group into ``n_shards`` ORDER-PRESERVING range buckets
     of the ordering key (bucket boundaries from the group's min/max,
     so every row in shard *s* orders before every row in shard *s+1*);
  2. aggregate per-shard totals (map-side combinable — tiny output),
     take their exclusive prefix per group (a window over ≤ n_shards
     rows per group), and broadcast the offsets back;
  3. run the cumsum window inside each (group, shard) and add the
     shard's offset.

Integer addition is associative, so the result is bit-identical to the
single-window form while running ``n_shards`` tasks per group.

The strategy is ADAPTIVE: the bounds pass also counts each group, and
when every group fits comfortably in one task the plain one-shuffle
window runs instead — the sharded machinery is measured pure overhead
there (see ``sharded_cumsum``), and both strategies are bit-identical
by construction.

Used by ``plans/llm_ops.pack_token_stream`` (re-expresses the
sequence-packing recipe the reference's pandas layer would run
eagerly; cf. reference transform flow `transformacion.py:1-29`).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["sharded_cumsum"]


def sharded_cumsum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Sequence[str] = (),
    n_shards: int = 32,
    out_col: str = "cum",
    materialize_input: bool = True,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` over ``order_col`` within
    ``partition_cols``, computed shard-parallel.

    Requirements for bit-exact equivalence with the plain window form:

    * ``order_col`` is numeric (castable to bigint) and unique within
      each partition — ties would make the running sum
      order-ambiguous in BOTH forms, so this adds no new constraint;
    * ``value_col`` sums exactly (integers; for floats use the
      decimal helpers in ``functions/numeric`` upstream).

    Shard balance follows the distribution of ``order_col`` values
    between the group min and max — uniform-ish dense ids (row
    numbers, sequence ids) shard evenly; a pathologically clustered
    key degrades balance but never correctness.

    Returns ``df`` plus ``out_col``; no other columns are added.

    ``materialize_input`` (default True): ``df`` feeds up to three
    plan branches (bounds aggregate, shard totals, final join), so
    an expensive upstream — tokenization, a parquet scan — would
    otherwise run multiple times. An eager localCheckpoint pays
    one evaluation + a write of the (usually narrow) input and
    makes the other branches re-reads. Pass False when ``df`` is
    already materialized or trivially cheap.

    ADAPTIVE STRATEGY: the bounds pass scans every row anyway, so
    it also counts each group. When the LARGEST group is at most
    ``AFG_CUMSUM_PLAIN_MAX_GROUP_ROWS`` rows (env, default 8M —
    a narrow (key, value) frame that one task sorts in seconds),
    the plain one-shuffle window is used: the sharded decomposition
    exists to break the one-task-per-group ceiling, and below the
    threshold its two extra shuffled aggregates + broadcast joins
    are pure overhead (measured at sf1, 500k rows / 5 groups, on a
    pre-materialized input: plain window 0.27s vs sharded 1.64s
    min-of-3). Above it, the two-pass sharded scan runs as
    documented. Integer addition is associative, so both strategies
    are bit-identical — this is a physical-plan choice from
    measured stats, the AQE idea applied where AQE can't see.
    """
    import os

    parts = list(partition_cols)
    if materialize_input:
        df = df.localCheckpoint(eager=True)
    if not parts:
        df = df.withColumn("__g", F.lit(0))
        parts = ["__g"]

    okey = F.col(order_col).cast("bigint")
    bounds = df.groupBy(*parts).agg(
        F.min(okey).alias("__min_k"),
        F.max(okey).alias("__max_k"),
        F.count(F.lit(1)).alias("__cnt"),
    ).localCheckpoint(eager=True)
    max_group = bounds.agg(F.max("__cnt")).collect()[0][0] or 0
    plain_cap = int(
        os.environ.get(
            "AFG_CUMSUM_PLAIN_MAX_GROUP_ROWS", str(8_000_000)
        )
    )
    if max_group <= plain_cap:
        w = (
            Window.partitionBy(*parts)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        result = df.withColumn(out_col, F.sum(value_col).over(w))
        if not partition_cols:
            result = result.drop("__g")
        return result
    bounds = bounds.drop("__cnt")
    span = F.col("__max_k") - F.col("__min_k") + F.lit(1)
    sharded = df.join(F.broadcast(bounds), parts).withColumn(
        "__shard",
        F.floor(((okey - F.col("__min_k")) * n_shards) / span).cast("int"),
    )

    offsets = (
        sharded.groupBy(*parts, "__shard")
        .agg(F.sum(value_col).alias("__shard_total"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__shard_total").over(
                    Window.partitionBy(*parts)
                    .orderBy("__shard")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("__shard_total")
    )

    within = (
        Window.partitionBy(*parts, "__shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    result = (
        sharded.join(F.broadcast(offsets), [*parts, "__shard"])
        .withColumn(
            out_col, F.sum(value_col).over(within) + F.col("__offset")
        )
        .drop("__min_k", "__max_k", "__shard", "__offset")
    )
    if not partition_cols:
        result = result.drop("__g")
    return result
