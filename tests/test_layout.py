"""Z-order layout + zone-map skipping (operators/layout.py)."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row, functions as F

from afg_data_pipeline_spark.operators.layout import (
    apply_zorder_layout,
    morton_key,
    with_zorder_key,
    zone_map_skipping_report,
)


def _py_spread(v: int) -> int:
    x = v & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _py_morton(x: int, y: int) -> int:
    return _py_spread(x) | (_py_spread(y) << 1)


class TestMortonKey:
    def test_matches_python_replica(self, spark):
        vals = [
            (0, 0),
            (1, 0),
            (0, 1),
            (65535, 65535),
            (12345, 54321),
            (255, 256),
            (32768, 1),
        ]
        df = spark.createDataFrame(vals, ["x", "y"]).select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
        )
        for r in df.collect():
            assert r.z == _py_morton(r.x, r.y), (r.x, r.y)

    def test_bit_interleave_locality(self, spark):
        # adjacent cells in x differ only in low bits: the curve
        # keeps small rectangles in contiguous key ranges
        df = spark.range(16).select(
            morton_key(F.col("id"), F.lit(0)).alias("zx"),
            morton_key(F.lit(0), F.col("id")).alias("zy"),
        )
        rows = df.collect()
        assert [r.zx for r in rows] == [
            _py_spread(i) for i in range(16)
        ]
        assert [r.zy for r in rows] == [
            _py_spread(i) << 1 for i in range(16)
        ]


class TestWithZorderKey:
    def test_rank_bounds_and_nulls(self, spark):
        df = spark.createDataFrame(
            [
                Row(a=10, b=100),
                Row(a=20, b=200),
                Row(a=None, b=300),
                Row(a=30, b=None),
                Row(a=110, b=1100),
            ]
        )
        out = with_zorder_key(df, "a", "b").collect()
        assert len(out) == 3  # null dims dropped
        by_a = {r.a: r for r in out}
        assert by_a[10]["__xr"] == 0
        assert by_a[110]["__xr"] == 65535
        assert by_a[10]["__yr"] == 0
        assert by_a[110]["__yr"] == 65535
        # interior point scales exactly: (20-10)*65535 div 100
        assert by_a[20]["__xr"] == (10 * 65535) // 100

    def test_constant_dimension_rank_zero(self, spark):
        df = spark.createDataFrame(
            [Row(a=5, b=1), Row(a=5, b=2)]
        )
        out = with_zorder_key(df, "a", "b").collect()
        assert {r["__xr"] for r in out} == {0}


class TestSkippingReport:
    def test_planted_grid(self, spark):
        # 64x64 grid, one row per cell: zorder must read far fewer
        # rows than natural for a small rectangle
        grid = (
            spark.range(64 * 64)
            .select(
                (F.col("id") % 64).alias("x"),
                (F.col("id") / 64).cast("bigint").alias("y"),
                F.col("id").alias("nk"),
            )
        )
        rep = zone_map_skipping_report(
            grid,
            "x",
            "y",
            x_rank_range=(0, 8191),  # lowest ~1/8 of x
            y_rank_range=(0, 8191),  # lowest ~1/8 of y
            block_bits=6,
            natural_key="nk",
        )
        rows = {r.layout: r for r in rep.collect()}
        assert rows["natural"].rows_total == 4096
        assert (
            rows["zorder"].read_fraction
            < rows["sort_x"].read_fraction
        )
        assert rows["zorder"].read_fraction < 0.1
        # every layout sees the same corpus
        assert (
            rows["zorder"].rows_total
            == rows["sort_x"].rows_total
            == rows["natural"].rows_total
        )


class TestApplyZorderLayout:
    def test_written_files_prune(self, spark, tmp_path):
        grid = (
            spark.range(128 * 128)
            .select(
                (F.col("id") % 128).alias("x"),
                (F.col("id") / 128).cast("bigint").alias("y"),
            )
        )
        zdir = os.path.join(str(tmp_path), "z")
        ndir = os.path.join(str(tmp_path), "n")
        apply_zorder_layout(grid, "x", "y", num_files=16).drop(
            "zkey"
        ).write.parquet(zdir)
        grid.repartition(16).write.parquet(ndir)

        def prunable(d):
            files = glob.glob(os.path.join(d, "*.parquet"))
            assert files
            keep = 0
            for f in files:
                md = pq.ParquetFile(f).metadata
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(0)  # x
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
                # rectangle: x in [0, 15]
                if min(mins) > 15:
                    keep += 1
            return keep / len(files)

        # z-ordered files: most prune on the footer x-range;
        # round-robin files: none do
        assert prunable(zdir) >= 0.5
        assert prunable(ndir) == 0.0
        # row preservation
        assert (
            spark.read.parquet(zdir).count()
            == spark.read.parquet(ndir).count()
            == 128 * 128
        )
