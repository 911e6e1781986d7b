"""Join operators beyond plain equi-joins (SURVEY.md §2.4 note:
right/full/semi/anti/as-of come free or nearly-free in Spark and
are part of the declared surface).

- asof_join_backward: the time-series join Spark lacks natively.
  Implemented as union + keyed window (last non-null over the
  merged ordering) rather than range-bucketing or
  pd.merge_asof-in-UDF: one shuffle on the key, O(n log n) within
  partitions, no Python, no bucket-width tuning — and it
  partitions by key, so it scales horizontally with key
  cardinality.
- salted_join: the skew escape hatch when one hot key would pin a
  whole shuffle partition. AQE skew-split handles moderate skew at
  runtime; explicit salting is for the pathological keys you know
  about (null-heavy foreign keys, celebrity users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row: the most recent right row of the same key
    with right_ts <= left_ts (or < when strict).

    Single-pass union form: left rows carry their own columns,
    right rows carry the value columns; order by (key, ts,
    side) and each left row reads the latest right values with
    last(ignorenulls) over an unbounded-preceding frame. No row-id
    rejoin (monotonically_increasing_id is not stable across plan
    re-evaluation), no O(n²) frames.

    Tie semantics: right rows at equal ts sort before left rows
    (ASOF >=); strict=True reverses the tie so equal-ts right rows
    are invisible. Deterministic given unique (key, ts) per side.
    """
    r_side, l_side = (1, 0) if strict else (0, 1)
    l_cols = left.columns
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
            if c not in (key,)
        ],
        *[F.col(c).alias(f"__rv_{c}") for c in right_values],
    )
    lf = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        *[F.col(c) for c in l_cols if c != key],
        *[
            F.lit(None)
            .cast(right.schema[c].dataType)
            .alias(f"__rv_{c}")
            for c in right_values
        ],
    )
    merged = r.unionByName(lf)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumns(
        {
            f"asof_{c}": F.last(
                F.col(f"__rv_{c}"), ignorenulls=True
            ).over(w)
            for c in right_values
        }
    ).filter(F.col("__side") == l_side)
    return carried.select(
        F.col("__k").alias(key),
        F.col("__ts").alias(left_ts),
        *[c for c in l_cols if c not in (key, left_ts)],
        *[f"asof_{c}" for c in right_values],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key, replicate
    the small side across all salt values, join on (key, salt).

    A key holding X% of the big table lands in one shuffle
    partition under a plain join; salting spreads it over
    salt_buckets partitions at the cost of replicating the small
    side salt_buckets times — the classic trade when the small side
    is small and the skew is known.
    """
    salted_big = big.withColumn(
        "__salt",
        (F.rand(seed=0) * salt_buckets).cast("int"),
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(salt_buckets)])
    ).alias("__salt")
    replicated = small.select("*", salts)
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 3,
    length_band: int = 1,
    block_keys=None,
) -> DataFrame:
    """Entity-resolution fuzzy join: edit-distance match under
    blocking keys, so the O(L×R) pair space never materializes.

    Each block key is a function Column -> Column (default: first
    character). Per key: equi-join on the key (Catalyst extracts it
    as the hash-join key) with a length band as residual, then the
    expensive levenshtein on the reduced pair set. A single key
    trades recall for cost (pairs differing in that key are
    missed); passing several keys (first char + last char, phonetic
    code, ...) unions the candidate pairs — a pair is found if ANY
    key agrees — and dropDuplicates collapses multi-block hits
    before scoring.

    Output: (left value, right value, distance), deduplicated.
    """
    if block_keys is None:
        block_keys = [lambda c: F.substring(c, 1, 1)]
    a = left.select(F.col(left_col).alias("name_a")).distinct()
    b = right.select(F.col(right_col).alias("name_b")).distinct()
    band = (
        F.abs(F.length("name_a") - F.length("name_b")) <= length_band
    )
    cands = None
    for key in block_keys:
        block = key(F.col("name_a")) == key(F.col("name_b"))
        pairs = (
            a.join(b, block & band)
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b")
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.dropDuplicates(["name_a", "name_b"])
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        cands.filter(dist <= max_distance)
        .select("name_a", "name_b", dist.alias("distance"))
    )
