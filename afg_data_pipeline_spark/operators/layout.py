"""Z-order (Morton-curve) layout + zone-map data skipping.

The 100 TB problem this solves: a table laid out in arrival order
answers a selective 2-D predicate (part × supplier, user × day,
lat × lon) by reading EVERY file, because each file's min/max
zone-map spans the whole key space. Sorting by one dimension fixes
that dimension and leaves the other unsorted. Interleaving the
bits of both dimensions' ranks (the Morton / Z-order key) makes
blocks of the sorted table cover small RECTANGLES of the 2-D
space, so a rectangle predicate prunes ~all non-intersecting
blocks — this is exactly what Delta/Iceberg `OPTIMIZE ZORDER BY`
does to parquet files.

Spark-first shape: the Morton key is a pure codegen'd projection
(mask-shift bit spreading — no UDF, no HOF lambda); min/max bounds
ride a 1-row broadcast cross join so the plan stays lazy; blocks
are zkey-PREFIX buckets (a value-space truncation, never a global
row-number window — CLAUDE.md rule 2/19); the skipping report is
two map-side-combinable aggregates. `apply_zorder_layout` is the
writer half: repartitionByRange on the key + sortWithinPartitions
so every output file owns a contiguous Z-range and its parquet
footer min/max actually prunes.

Reference scope: the reference pipelines key mobility matrices by
(origin, destination) and scan them with 2-D slices
(viajes_comuna.ipynb's OD-matrix cells); this operator is the
layout that makes such scans sublinear at warehouse scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# 16-bit rank space: ranks in [0, 65535], Morton keys in [0, 2^32).
RANK_MAX = 65535
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(col: Column) -> Column:
    """Spread a 16-bit value's bits to the even positions of a
    32-bit value (classic mask-shift interleave half; stays inside
    whole-stage codegen — each step is two shifts and an AND)."""
    x = col.cast("bigint").bitwiseAND(F.lit(RANK_MAX))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(
            F.lit(mask)
        )
    return x


def morton_key(x_rank: Column, y_rank: Column) -> Column:
    """Interleave two 16-bit ranks: x takes even bits, y odd."""
    return spread_bits16(x_rank).bitwiseOR(
        F.shiftleft(spread_bits16(y_rank), 1)
    )


def with_zorder_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_name: str = "zkey",
) -> DataFrame:
    """Add integer rank columns ``__xr``/``__yr`` and the Morton
    key for two integer dimensions. Bounds are a 1-row aggregate
    broadcast-cross-joined in (lazy — no eager collect at plan
    construction). Null dimensions are dropped (a null has no
    position on the curve; same contract as a skipped zone-map)."""
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    bounds = base.agg(
        F.min(x_col).cast("bigint").alias("__minx"),
        F.max(x_col).cast("bigint").alias("__maxx"),
        F.min(y_col).cast("bigint").alias("__miny"),
        F.max(y_col).cast("bigint").alias("__maxy"),
    )
    withb = base.crossJoin(F.broadcast(bounds))
    xspan = F.greatest(
        F.col("__maxx") - F.col("__minx"), F.lit(1)
    )
    yspan = F.greatest(
        F.col("__maxy") - F.col("__miny"), F.lit(1)
    )
    xr = (
        (F.col(x_col).cast("bigint") - F.col("__minx"))
        * F.lit(RANK_MAX)
    )
    yr = (
        (F.col(y_col).cast("bigint") - F.col("__miny"))
        * F.lit(RANK_MAX)
    )
    # exact floor division of non-negative operands: subtract the
    # modulo first so the integer `/`-free path stays in longs
    xr = ((xr - xr % xspan) / xspan).cast("bigint")
    yr = ((yr - yr % yspan) / yspan).cast("bigint")
    out = withb.select(
        *[F.col(c) for c in df.columns],
        xr.alias("__xr"),
        yr.alias("__yr"),
    )
    return out.withColumn(
        key_name, morton_key(F.col("__xr"), F.col("__yr"))
    )


def zone_map_skipping_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_rank_range: tuple[int, int],
    y_rank_range: tuple[int, int],
    block_bits: int = 10,
    natural_key: str | None = None,
) -> DataFrame:
    """Compare zone-map effectiveness of three layouts for one
    rectangular predicate, WITHOUT rewriting any data.

    Layouts (each assigns every row a block id; blocks model files
    of a table written in that order):
      - ``zorder``  — Morton-key prefix: ``zkey >> (32-block_bits)``
      - ``sort_x``  — single-dimension sort: ``xr`` prefix
      - ``natural`` — arrival-order stand-in: ``natural_key mod
        2^block_bits`` (deterministic, engine-portable)

    The predicate is a rectangle in RANK space (so callers choose
    selectivity, not absolute values). A block must be read iff
    its [min,max] span of EITHER dimension intersects the
    rectangle — exactly the parquet footer / Delta zone-map rule.

    Scale shape: one projection computes all three block ids,
    one explode emits (layout, block) pairs (3× the input rows,
    but the very next operator is a partial aggregate — the
    shuffle carries only block-level rows, ≤ 3·2^block_bits), then
    a per-layout rollup over ≤ 2^block_bits rows. No windows, no
    joins beyond the 1-row bounds broadcast.
    """
    if natural_key is None:
        raise ValueError("natural_key column is required")
    n_blocks = 1 << block_bits
    keyed = with_zorder_key(df, x_col, y_col)
    tagged = keyed.select(
        F.col("__xr"),
        F.col("__yr"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(
                        F.col("zkey"), 32 - block_bits
                    ).alias("block"),
                ),
                F.struct(
                    F.lit("sort_x").alias("layout"),
                    F.shiftright(
                        F.col("__xr"), 16 - block_bits
                    ).alias("block"),
                ),
                F.struct(
                    F.lit("natural").alias("layout"),
                    (
                        F.col(natural_key).cast("bigint")
                        % F.lit(n_blocks)
                    ).alias("block"),
                ),
            )
        ).alias("lb"),
    ).select("__xr", "__yr", "lb.layout", "lb.block")
    stats = tagged.groupBy("layout", "block").agg(
        F.min("__xr").alias("bminx"),
        F.max("__xr").alias("bmaxx"),
        F.min("__yr").alias("bminy"),
        F.max("__yr").alias("bmaxy"),
        F.count(F.lit(1)).alias("rows"),
    )
    x1, x2 = x_rank_range
    y1, y2 = y_rank_range
    hit = (
        (F.col("bmaxx") >= x1)
        & (F.col("bminx") <= x2)
        & (F.col("bmaxy") >= y1)
        & (F.col("bminy") <= y2)
    )
    return (
        stats.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("blocks_total"),
            F.sum(F.when(hit, 1).otherwise(0))
            .cast("bigint")
            .alias("blocks_read"),
            F.sum("rows").cast("bigint").alias("rows_total"),
            F.sum(F.when(hit, F.col("rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_read"),
        )
        .withColumn(
            "read_fraction",
            F.col("rows_read").cast("double")
            / F.col("rows_total").cast("double"),
        )
        .orderBy("layout")
    )


def apply_zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_files: int,
) -> DataFrame:
    """Physically lay a table out in Z-order: range-partition on
    the Morton key (each output file owns one contiguous Z-range)
    and sort within partitions so parquet page/footer min-max
    stats are tight. Returns the reordered frame ready for
    ``.write`` — callers own the sink. ``num_files`` is the target
    file count; at 100 TB pick it from total bytes / desired file
    size, not row counts."""
    keyed = with_zorder_key(df, x_col, y_col)
    return (
        keyed.repartitionByRange(num_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("__xr", "__yr")
    )
