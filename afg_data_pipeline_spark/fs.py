"""Scheme-aware filesystem probes shared by streaming sinks and
table-maintenance tools.

Every incremental-store sink (streaming/dsir.py,
streaming/incremental_dedup.py, streaming/drift.py) must ask "does
the prior-batch store exist yet?" before reading it.  A bare
``os.path.exists`` answers that question against the DRIVER'S local
disk only: pointed at an ``hdfs://`` or ``s3a://`` store it silently
returns ``False`` forever, so every batch is scored against an empty
prior — wrong DSIR scores, zero dedup recall, no error (the
silent-wrong-at-scale class; VERDICT r8 #1).  The probe here goes
through the Hadoop FileSystem API instead, so ``file://`` local
runs, HDFS, and S3A all behave identically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def store_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the filesystem its scheme names
    (driver-local when scheme-less), via Hadoop's ``FileSystem`` —
    the same resolution ``spark.read.parquet`` will use, so the
    probe can never disagree with the read that follows it."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return bool(fs.exists(p))


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` on whatever filesystem its
    scheme names (a shutil.rmtree that works on HDFS/S3A too —
    needed by the erasure path to drop fully-purged store
    partitions).  Returns True iff something was deleted."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, True))
