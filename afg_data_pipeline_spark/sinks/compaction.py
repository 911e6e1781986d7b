"""Small-file compaction — the table-maintenance sink every
long-running 100 TB lake needs.

Streaming micro-batches, incremental backfills, and
dynamic-partition overwrites (io.write_parquet, sinks/jdbc-style
chunked loads) all accrete small files; a scan of a
million-small-file table spends its time in footer reads and task
scheduling, not data. Compaction rewrites a directory into
~target-sized files:

    n_output_files = max(1, ceil(total_bytes / target_bytes))

sized from the ACTUAL input bytes (listed through the Hadoop
FileSystem API, so the same code paths work on HDFS/S3A, not just
local disk — the lesson of streaming/drift.py's os.path.exists
bug).

The rewrite targets a NEW directory; atomic publish (rename/swap
over the old path) is deliberately the caller's step — an engine
must never delete source data as a side effect of an optimization
pass. Compression codec and schema ride through unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, size) of every data file under ``path``, via the
    Hadoop FileSystem API (scheme-aware: file://, hdfs://, s3a://)."""
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)  # recursive
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, hidden/CRC files
        out.append((st.getPath().toString(), st.getLen()))
    return out


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet directory at ``src_path`` into
    ``dst_path`` with ~``target_mb``-sized files. Returns a stats
    dict: files_before, bytes_before, files_after, target_files.

    Unpartitioned: one round-robin repartition to the computed
    file count — every output file lands within a task of the
    target size regardless of input skew. Partitioned
    (``partition_by``): rows are repartitioned BY the partition
    columns with the same total file count, so each output
    directory is written by the tasks that own its key — small
    per-partition files collapse to one-per-task without a global
    sort. (A heavily skewed partition then caps at its task's
    size; re-run with a larger target or let AQE's skew split
    handle it upstream.)
    """
    if src_path.rstrip("/") == dst_path.rstrip("/"):
        raise ValueError(
            "compact_parquet writes to a NEW directory; "
            "atomic swap over the source is the caller's step"
        )
    files = _list_files(spark, src_path)
    bytes_before = sum(sz for _, sz in files)
    target_files = max(
        1, math.ceil(bytes_before / (target_mb * 1024 * 1024))
    )
    df: DataFrame = spark.read.parquet(src_path)
    if partition_by:
        out = df.repartition(target_files, *partition_by)
        (
            out.write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(dst_path)
        )
    else:
        out = df.repartition(target_files)
        out.write.mode("overwrite").parquet(dst_path)
    files_after = len(_list_files(spark, dst_path))
    return {
        "files_before": len(files),
        "bytes_before": bytes_before,
        "target_files": target_files,
        "files_after": files_after,
    }
