"""compact_parquet: small-file collapse with byte-accurate stats,
data equality, partitioned layout preservation, and the
no-in-place contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.sinks.compaction import (
    compact_parquet,
)


def _data_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(
            os.path.join(dirpath, f)
            for f in files
            if not f.startswith(("_", "."))
            and not f.endswith(".crc")
        )
    return out


class TestCompaction:
    def test_collapses_small_files(self, spark, tmp_path):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        df = spark.range(10_000).select(
            "id", (F.col("id") % 7).alias("k")
        )
        df.repartition(64).write.parquet(src)
        assert len(_data_files(src)) == 64
        stats = compact_parquet(
            spark, src, dst, target_mb=1024
        )
        assert stats["files_before"] == 64
        assert stats["target_files"] == 1
        assert stats["files_after"] == 1
        assert len(_data_files(dst)) == 1
        # byte accounting matches the real listing
        assert stats["bytes_before"] == sum(
            os.path.getsize(f) for f in _data_files(src)
        )
        # data equality (full outer anti-check)
        a = spark.read.parquet(src)
        b = spark.read.parquet(dst)
        assert b.count() == 10_000
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_partitioned_layout_preserved(self, spark, tmp_path):
        src = str(tmp_path / "psrc")
        dst = str(tmp_path / "pdst")
        df = spark.range(5_000).select(
            "id", (F.col("id") % 3).alias("part")
        )
        (
            df.repartition(24)
            .write.partitionBy("part")
            .parquet(src)
        )
        assert len(_data_files(src)) > 10
        stats = compact_parquet(
            spark, src, dst, target_mb=1024,
            partition_by=["part"],
        )
        assert stats["files_after"] < stats["files_before"]
        # partition directories survive and prune
        assert sorted(
            d for d in os.listdir(dst) if d.startswith("part=")
        ) == ["part=0", "part=1", "part=2"]
        b = spark.read.parquet(dst)
        assert b.count() == 5_000
        assert (
            b.groupBy("part").count().orderBy("part").collect()
            == spark.read.parquet(src)
            .groupBy("part")
            .count()
            .orderBy("part")
            .collect()
        )

    def test_refuses_in_place(self, spark, tmp_path):
        src = str(tmp_path / "x")
        spark.range(10).write.parquet(src)
        with pytest.raises(ValueError, match="NEW directory"):
            compact_parquet(spark, src, src + "/")
