"""Streaming geofence enrichment: point-in-polygon containment
over a Structured Streaming point feed.

The r10 fold rewrite made ``point_in_polygon_join`` STATELESS —
the crossing parity is an ``F.aggregate`` fold inside the
broadcast cell-map join instead of a parity ``groupBy`` — so the
same operator now runs unmodified over ``readStream`` in append
mode with NO watermark, NO state store, and per-micro-batch cost
linear in the batch: the polygon layer (grid classification + edge
arrays) broadcasts once, every micro-batch streams through one
codegen'd projection. This is the "which geofence is this device
in right now" enrichment of a location event stream.

Reference context: the comunas layer of temperaturas_rm.py:106-119
as a LIVE lookup rather than a batch join; semantics identical to
the oracle-checked batch twin (`stream_geofence_enrich` in
plans/streaming_batch.py) and pinned stream==batch in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from afg_data_pipeline_spark.operators.spatial import (
    point_in_polygon_join,
)


def geofence_enrich(
    points: DataFrame,
    polygons: list[tuple],
    id_col: str = "event_id",
    x_col: str = "px",
    y_col: str = "py",
    poly_id_col: str = "poly_id",
    n_cells: int = 32,
) -> DataFrame:
    """Attach the containing polygon id to every point row (one
    output row per (point, containing polygon); points outside
    every polygon drop out — an inner containment join). Works
    identically over batch and streaming ``points``: the plan is
    a stateless broadcast join + fold, legal in append mode."""
    return point_in_polygon_join(
        points,
        polygons,
        id_col=id_col,
        x_col=x_col,
        y_col=y_col,
        poly_id_col=poly_id_col,
        n_cells=n_cells,
    )
