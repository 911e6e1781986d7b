"""J3: nearest-neighbor (1-NN) assignment join.

Reference: temperaturas_rm.py:121-130 — cdist(comuna_centroids,
station_coords) then per-comuna argmin/min assigns each comuna its
nearest weather station; lines 135-147 then stamp the station's
rows with the comuna (J2).

Spark-first: crossJoin + min_by aggregate. min_by is a plain
partial-aggregatable aggregate — cheaper than the window row_number
formulation (no per-group sort materialization). The left side
streams; the right (probe) side is broadcast.

Scale note (SURVEY.md §4): crossJoin is O(L×R) — fine while R is
broadcastable (stations/dims). For R beyond broadcast size the
upgrade path is grid bucketing: hash both sides to coarse cells,
equi-join on cell + neighbor cells, then min_by — same output
contract, so callers don't change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def nearest_neighbor_assign(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    distance: Column,
    carry: list[str] | None = None,
) -> DataFrame:
    """For each left row, the right key minimizing ``distance``.

    ``distance`` is any deterministic Column over the cross-joined
    row. Ties break on right_key, making the assignment
    deterministic (the reference's argmin inherits numpy's
    first-match order; an explicit tie-break is the correct
    upgrade).
    """
    # Spread the streaming side before the |R|-fold expansion: a
    # parquet scan often arrives in a handful of partitions, and the
    # cross join multiplies rows without re-splitting them. A cheap
    # round-robin of the *input* rows parallelizes the O(L×R)
    # distance evaluation across all cores/executors.
    par = left.sparkSession.sparkContext.defaultParallelism
    pairs = left.repartition(par).crossJoin(F.broadcast(right))
    d = distance.alias("__dist")
    ordkey = F.struct(distance.alias("d"), F.col(right_key).alias("k"))
    aggs = [
        F.min_by(F.col(right_key), ordkey).alias(f"nearest_{right_key}"),
        F.min(distance).alias("nearest_distance"),
    ]
    for c in carry or []:
        aggs.append(F.min_by(F.col(c), ordkey).alias(f"nearest_{c}"))
    _ = d
    return pairs.groupBy(left_key).agg(*aggs)


def nearest_neighbor_1d(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_pos: str,
    right_pos: str,
    carry: list[str] | None = None,
) -> DataFrame:
    """1-NN on a 1-dimensional position without a cross join.

    The sort-based formulation of J3 for scalar distance: union both
    sides ordered by position, carry the nearest right-row from each
    direction with last/first(ignorenulls) windows, and pick the
    closer of the two (ties -> smaller right key, matching the
    ROW_NUMBER oracle). O((L+R) log(L+R)) vs the cross join's
    O(L×R) — the difference between 15M and 16k evaluated pairs at
    sf0.1, and between infeasible and trivial at 100 TB.

    The global orderBy window runs un-partitioned (single task) —
    fine up to ~10M rows; beyond that, range-partition on position
    with boundary duplication (each partition also gets its
    neighbors' edge rows). Assumes right positions are distinct
    (duplicate-position ties would need a secondary ordering).
    """
    carry = carry or []
    r = right.select(
        F.col(right_pos).alias("__pos"),
        F.col(right_key).alias("__rkey"),
        *[F.col(c) for c in carry],
        F.lit(1).alias("__is_right"),
        F.lit(None)
        .cast(left.schema[left_key].dataType)
        .alias("__lkey"),
    )
    l_side = left.select(
        F.col(left_pos).alias("__pos"),
        F.lit(None).cast(right.schema[right_key].dataType).alias(
            "__rkey"
        ),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in carry
        ],
        F.lit(0).alias("__is_right"),
        F.col(left_key).alias("__lkey"),
    )
    both = r.unionByName(l_side)
    # Right rows sort before left rows at equal position, so an
    # exact-position match lands in the "prev" direction with
    # distance 0.
    # Both directions as last(...) over unbounded-PRECEDING frames —
    # the forward order for "prev", the reversed order for "next" —
    # because Spark evaluates preceding frames incrementally but
    # unbounded-following frames by re-scanning the tail per row
    # (O(n²) per partition).
    wp = Window.orderBy(
        F.col("__pos").asc(), F.col("__is_right").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = Window.orderBy(
        F.col("__pos").desc(), F.col("__is_right").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def _dir(frame, suffix):
        cols = {
            f"__rkey{suffix}": F.last(
                F.when(F.col("__is_right") == 1, F.col("__rkey")),
                ignorenulls=True,
            ).over(frame),
            f"__pos{suffix}": F.last(
                F.when(F.col("__is_right") == 1, F.col("__pos")),
                ignorenulls=True,
            ).over(frame),
        }
        for c in carry:
            cols[f"{c}{suffix}"] = F.last(
                F.when(F.col("__is_right") == 1, F.col(c)),
                ignorenulls=True,
            ).over(frame)
        return cols

    annotated = both.withColumns(
        {**_dir(wp, "_p"), **_dir(wn, "_n")}
    ).filter(F.col("__is_right") == 0)

    d_prev = F.abs(F.col("__pos") - F.col("__pos_p"))
    d_next = F.abs(F.col("__pos_n") - F.col("__pos"))
    # prev wins on strictly smaller distance, or on a tie when its
    # key is smaller; a missing side loses automatically.
    prev_wins = F.when(F.col("__pos_n").isNull(), F.lit(True)).otherwise(
        F.when(F.col("__pos_p").isNull(), F.lit(False)).otherwise(
            (d_prev < d_next)
            | ((d_prev == d_next) & (F.col("__rkey_p") < F.col("__rkey_n")))
        )
    )
    sel = lambda p, n: F.when(prev_wins, p).otherwise(n)  # noqa: E731
    out = [
        F.col("__lkey").alias(left_key),
        sel(F.col("__rkey_p"), F.col("__rkey_n")).alias(
            f"nearest_{right_key}"
        ),
        sel(d_prev, d_next).alias("nearest_distance"),
    ]
    for c in carry:
        out.append(
            sel(F.col(f"{c}_p"), F.col(f"{c}_n")).alias(f"nearest_{c}")
        )
    return annotated.select(*out)
