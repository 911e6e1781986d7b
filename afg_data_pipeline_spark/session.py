"""SparkSession factory with scale-oriented defaults.

The reference executes eagerly in a single pandas process (SURVEY.md
§3); here every pipeline is a lazy DataFrame DAG and the session is
tuned so Catalyst/AQE pick physical strategies that survive scale-up:
AQE on (runtime coalesce + skew-join splitting), Arrow on (vectorized
pandas-UDF transfer), UTC session timezone (parity with UTC-naive
oracle engines), and shuffle partitions sized to the local core count
(AQE re-coalesces at runtime, so the same code is correct on a
1000-executor cluster where the initial number would be raised).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for correctness-at-scale, not just local speed:
# every one of these is what you would also set on a real cluster.
_BASE_CONF: dict[str, str] = {
    # AQE: runtime partition coalescing, skew-join splitting, and
    # dynamic join-strategy switching. This is the main lever that
    # makes one logical plan work at sf0.001 and at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDF / toPandas transfer (vectorized batches).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # UTC so year()/date grouping matches UTC-naive engines (DuckDB).
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: the reference's pandas semantics are permissive
    # (NaN propagation, silent casts); keep Spark's legacy behavior.
    "spark.sql.ansi.enabled": "false",
    # Parquet vectorized reader + pushdown are on by default; pin
    # them anyway so the plan-shape assumptions in tests hold.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # The driver's testdata encodes timestamps as INT64
    # TIMESTAMP(NANOS) which Spark refuses by default
    # (PARQUET_TYPE_ILLEGAL). Read them as raw nanos longs;
    # io.read_star_table converts to microsecond TimestampType,
    # truncating exactly like DuckDB truncates nanos -> us.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_session(
    app_name: str = "afg-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else
    ``local[*]``); on a real cluster pass ``None`` with a configured
    spark-submit and the master set externally.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # Local mode: one shuffle partition per core. AQE coalesces
        # further when partitions are tiny. On a cluster this should
        # be ~2-3x total executor cores; callers override.
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _BASE_CONF.items():
        builder = builder.config(k, v)
    # Single-JVM local mode: the "driver" heap is also every
    # executor thread's working memory. The 1g default with 32
    # concurrent tasks OOMs on any broadcast + window workload;
    # size it to the machine. Ignored when a real cluster's
    # spark-submit sets memory explicitly (only applies at JVM
    # launch).
    builder = builder.config(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
    )
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
