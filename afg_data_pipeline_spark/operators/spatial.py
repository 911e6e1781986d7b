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

from pyspark.sql import Column, DataFrame
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
    pairs = left.crossJoin(F.broadcast(right))
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
