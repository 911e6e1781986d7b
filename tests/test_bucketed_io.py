"""Bucketing + Excel-edge tests.

Bucketing is the SURVEY.md §7 co-located-join lever: writing both
join sides bucketed by the key lets Spark sort-merge-join them with
ZERO exchange — at 100 TB that's the difference between shuffling
the fact table per join and never shuffling it at all.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.io import (
    read_excel_driver_side,
    read_star_table,
)
from tests.conftest import SF_DIR


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_test")
        try:
            li = read_star_table(spark, "lineitem", SF_DIR)
            o = read_star_table(spark, "orders", SF_DIR)
            (
                li.write.bucketBy(8, "l_orderkey")
                .sortBy("l_orderkey")
                .mode("overwrite")
                .saveAsTable("bucketed_test.li_b")
            )
            (
                o.withColumnRenamed("o_orderkey", "l_orderkey")
                .write.bucketBy(8, "l_orderkey")
                .sortBy("l_orderkey")
                .mode("overwrite")
                .saveAsTable("bucketed_test.o_b")
            )
            a = spark.table("bucketed_test.li_b")
            b = spark.table("bucketed_test.o_b")
            # merge hint: the small local tables would otherwise
            # broadcast; the property under test is the bucketed
            # sort-merge join path (the 100 TB shape).
            joined = a.hint("merge").join(b, "l_orderkey").groupBy(
                "o_orderstatus"
            ).agg(F.count(F.lit(1)).alias("n"))
            joined.collect()
            executed = (
                joined._jdf.queryExecution().executedPlan().toString()
            )
            # The join itself must not exchange either side: only
            # the final tiny aggregation may shuffle.
            join_part = executed.split("SortMergeJoin")[-1]
            assert "Exchange" not in join_part, (
                "bucketed join re-shuffled a side:\n" + executed
            )
            # Sanity: result matches the plain join.
            plain = (
                li.join(
                    o, li.l_orderkey == o.o_orderkey
                )
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            assert sorted(map(tuple, joined.collect())) == sorted(
                map(tuple, plain.collect())
            )
        finally:
            spark.sql("DROP DATABASE IF EXISTS bucketed_test CASCADE")


class TestExcelEdge:
    def test_read_excel_driver_side(self, spark, monkeypatch):
        """S3/S4: the Excel edge is a driver-side pandas read with a
        declared schema; the engine container has no Excel engine,
        so pandas is monkeypatched (the contract under test is the
        pandas -> createDataFrame -> declared-schema path)."""
        fake = pd.DataFrame(
            {"comuna": ["santiago", "pudahuel"], "2020": [10, 20]}
        )
        monkeypatch.setattr(
            pd, "read_excel", lambda path, sheet_name=0: fake
        )
        df = read_excel_driver_side(
            spark,
            "/nonexistent/workers.xlsx",
            schema="comuna string, `2020` long",
            sheet_name="poblacion_total",
        )
        rows = sorted((r["comuna"], r["2020"]) for r in df.collect())
        assert rows == [("pudahuel", 20), ("santiago", 10)]
        assert df.schema.simpleString() == "struct<comuna:string,2020:bigint>"


class TestDataLayout:
    """write_parquet_sorted / compact_parquet / dynamic partition
    overwrite — the data-layout levers (COVERAGE §2.1)."""

    def test_sorted_write_produces_tight_rowgroup_stats(
        self, spark, tmp_path
    ):
        import glob

        import pyarrow.parquet as pq

        from afg_data_pipeline_spark.io import write_parquet_sorted

        li = read_star_table(spark, "lineitem", SF_DIR).select(
            "l_orderkey", "l_extendedprice"
        )
        out = str(tmp_path / "sorted")
        write_parquet_sorted(li, out, sort_by=["l_orderkey"], n_files=4)
        files = sorted(glob.glob(f"{out}/*.parquet"))
        assert len(files) == 4
        ranges = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                assert col.path_in_schema == "l_orderkey"
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            ranges.append((min(mins), max(maxs)))
        # Range partitioning -> files cover disjoint key ranges
        # (tight min/max = row-group skipping works).
        ranges.sort()
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi <= lo

    def test_compaction_reduces_file_count(self, spark, tmp_path):
        import glob

        from afg_data_pipeline_spark.io import compact_parquet

        src = str(tmp_path / "fragmented")
        li = read_star_table(spark, "lineitem", SF_DIR)
        li.repartition(64).write.parquet(src)
        n_in = len(glob.glob(f"{src}/*.parquet"))
        assert n_in >= 64
        n_out = compact_parquet(
            spark, src, str(tmp_path / "compacted"), target_file_mb=128
        )
        assert n_out == 1  # sf0.001 lineitem is far below 128 MB
        got = spark.read.parquet(str(tmp_path / "compacted"))
        assert got.count() == li.count()

    def test_dynamic_partition_overwrite_preserves_others(
        self, spark, tmp_path
    ):
        from afg_data_pipeline_spark.io import write_parquet

        out = str(tmp_path / "by_flag")
        li = read_star_table(spark, "lineitem", SF_DIR).select(
            "l_orderkey", "l_returnflag"
        )
        write_parquet(li, out, partition_by=["l_returnflag"])
        before = spark.read.parquet(out)
        n_other = before.filter(F.col("l_returnflag") != "R").count()
        # Re-write ONLY the R partition with one row.
        one = li.filter(F.col("l_returnflag") == "R").limit(1)
        write_parquet(
            one,
            out,
            partition_by=["l_returnflag"],
            dynamic_partition_overwrite=True,
        )
        after = spark.read.parquet(out)
        assert after.filter(F.col("l_returnflag") == "R").count() == 1
        # Non-R partitions untouched.
        assert (
            after.filter(F.col("l_returnflag") != "R").count() == n_other
        )


class TestSchemaEvolution:
    def test_merge_schema_reads_evolved_dataset(self, spark, tmp_path):
        """Additive schema evolution: files written before a column
        existed coexist with newer files; mergeSchema unifies them
        with nulls for the missing column — append-only pipelines
        must survive column additions without rewriting history."""
        out = str(tmp_path / "evolving")
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        ).write.parquet(out)
        spark.createDataFrame(
            [(3, "c", 30.0)], "id long, v string, score double"
        ).write.mode("append").parquet(out)
        got = spark.read.option("mergeSchema", "true").parquet(out)
        assert set(got.columns) == {"id", "v", "score"}
        rows = {r["id"]: r["score"] for r in got.collect()}
        assert rows == {1: None, 2: None, 3: 30.0}


class TestZOrder:
    def test_morton_matches_reference(self, spark):
        from afg_data_pipeline_spark.io import zorder_value

        def morton(x, y, bits=16):
            z = 0
            for i in range(bits):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        rows = [(x, y) for x in (0, 1, 2, 3, 7, 255, 65535)
                for y in (0, 1, 5, 128, 65535)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {
            (r["x"], r["y"]): r["z"]
            for r in df.select(
                "x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")
            ).collect()
        }
        for (x, y), z in got.items():
            assert z == morton(x, y), (x, y)

    def test_zordered_files_are_2d_tiles(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from afg_data_pipeline_spark.io import write_parquet_zordered

        # A 64x64 grid: a Z-ordered layout must bound BOTH columns
        # per file; an x-sort would leave y spanning the full range.
        grid = spark.range(64 * 64).selectExpr(
            "cast(id % 64 as long) as x", "cast(id div 64 as long) as y"
        )
        out = str(tmp_path / "zorder")
        write_parquet_zordered(grid, out, "x", "y", n_files=16, bits=6)
        spans = []
        for f in glob.glob(f"{out}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            stats = {}
            for rg in range(md.num_row_groups):
                for c in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(c)
                    s = stats.setdefault(
                        col.path_in_schema, [1 << 60, -(1 << 60)]
                    )
                    s[0] = min(s[0], col.statistics.min)
                    s[1] = max(s[1], col.statistics.max)
            spans.append(
                (
                    stats["x"][1] - stats["x"][0],
                    stats["y"][1] - stats["y"][0],
                )
            )
        # Every file bounds both dimensions well below the global
        # span of 63 — 16 Z-tiles of a 64x64 grid are 16x16 blocks.
        assert all(sx <= 31 and sy <= 31 for sx, sy in spans), spans


class TestOrcRoundtrip:
    """S-family: ORC interchange (read_orc/write_orc) — full value
    roundtrip, partition pruning, and filter pushdown parity with
    the parquet path."""

    def test_roundtrip_and_pruning(self, spark, tmp_path):
        from afg_data_pipeline_spark.io import (
            read_orc,
            read_star_table,
            write_orc,
        )

        src = read_star_table(
            spark, "nation", "/root/testdata/sf0.001"
        )
        path = str(tmp_path / "nation_orc")
        write_orc(src, path, partition_by=["n_regionkey"])
        back = read_orc(spark, path)
        want = {
            tuple(r) for r in src.select(
                "n_nationkey", "n_name", "n_regionkey"
            ).collect()
        }
        got = {
            tuple(r) for r in back.select(
                "n_nationkey", "n_name", "n_regionkey"
            ).collect()
        }
        assert got == want
        # partition pruning: the filtered plan must read only the
        # matching partition directory
        import pyspark.sql.functions as F

        plan = (
            back.filter(F.col("n_regionkey") == 0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters" in plan
        assert back.filter(
            F.col("n_regionkey") == 0
        ).count() == src.filter(
            F.col("n_regionkey") == 0
        ).count()
