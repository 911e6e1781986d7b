"""applyInPandasWithState: running per-user totals across
micro-batches must converge to the batch groupBy answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from afg_data_pipeline_spark import schemas
from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.streaming.stateful import (
    running_user_totals,
)
from afg_data_pipeline_spark.streaming.windows import (
    read_events_stream,
)
from tests.conftest import SF_DIR


def test_running_totals_converge_to_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ev = read_star_table(spark, "events", SF_DIR)
    # 4 files -> multiple micro-batches -> state actually carries
    # across batches (maxFilesPerTrigger=1).
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = read_events_stream(
        spark, src, schemas.EVENTS, max_files_per_trigger=1
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per key per batch; the LAST row
    # per key is the converged running total.
    got = (
        spark.table("t_state")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
        )
    )
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("max_value"),
    )
    g = {r.user_id: (r.n_events, r.max_value) for r in got.collect()}
    w = {r.user_id: (r.n_events, r.max_value) for r in want.collect()}
    assert g.keys() == w.keys()
    for k in w:
        assert g[k][0] == w[k][0], f"count mismatch for user {k}"
        assert abs(g[k][1] - w[k][1]) < 1e-9
