"""Change-data-capture apply: latest-wins upsert merge of a base
snapshot with a changeset, plus tombstone deletes — the incremental
maintenance primitive behind snapshot compaction, mutable dimension
tables, and "current state per key" views over event logs.

Spark-first shape: union + one grouped max_by over an ordering
struct. max_by is partial-aggregable — each map task keeps one
candidate row per key before the shuffle — so the merge costs one
shuffle of (roughly) one row per key per task, NOT a per-group sort
of the full history the window/row_number formulation would pay.
At 100 TB the changelog collapses map-side; the window variant
materializes and sorts every version of every key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_latest(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    tie_col: str,
    delete_predicate: Column | None = None,
) -> DataFrame:
    """One row per key: the newest version across base ∪ updates.

    Ordering is (ts_col, tie_col) — the tie column must make the
    order total (an id works) or "latest" is not well defined.
    ``delete_predicate`` (evaluated on the WINNING row) drops keys
    whose latest version is a tombstone — deletes must win the
    ordering to take effect, exactly like log-structured merges.
    """
    allr = base.unionByName(updates)
    payload = [c for c in allr.columns if c not in keys]
    ordering = F.struct(F.col(ts_col), F.col(tie_col))
    merged = (
        allr.groupBy(*[F.col(k) for k in keys])
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]), ordering
            ).alias("__row")
        )
        .select(
            *keys,
            *[F.col(f"__row.{c}").alias(c) for c in payload],
        )
    )
    if delete_predicate is not None:
        merged = merged.filter(~delete_predicate)
    return merged


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC *extract* — the inverse of ``incremental_agg_apply``'s
    consume side: derive the changelog between two key-unique
    snapshots. Output: key columns + ``op`` ('I' key only in new,
    'D' only in old, 'U' in both with any compared column
    differing) + old_/new_ images of every compared column;
    unchanged keys emit nothing.

    One full-outer equi-join on the key — both snapshots shuffle
    once on the key and nothing else moves; at 100 TB this is the
    partition-prunable nightly-diff pattern (co-partitioned or
    bucketed snapshots diff with zero exchange, test_bucketed_io's
    layout). Column comparison is null-safe (``<=>``): a value
    change to/from NULL is a real 'U', not a silent equal.
    """
    if not keys or not compare_cols:
        raise ValueError("keys and compare_cols must be non-empty")
    overlap = set(keys) & set(compare_cols)
    if overlap:
        raise ValueError(f"compare_cols overlap keys: {sorted(overlap)}")
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = None
    for k in keys:
        c = F.col(f"__ko_{k}") == F.col(f"__kn_{k}")
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"__ko_{keys[0]}").isNotNull()
    in_new = F.col(f"__kn_{keys[0]}").isNotNull()
    changed = None
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        changed = d if changed is None else changed | d
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(
                    F.col(f"__kn_{k}"), F.col(f"__ko_{k}")
                ).alias(k)
                for k in keys
            ],
            "op",
            *[
                c
                for pair in (
                    (f"old_{cc}", f"new_{cc}")
                    for cc in compare_cols
                )
                for c in pair
            ],
        )
    )


def join_insert_deltas(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    on: list[tuple[str, str]],
) -> DataFrame:
    """Joined-row inserts induced by insert-only deltas on BOTH
    sides of an equi-join — the join half of incremental view
    maintenance.

    With A = A₀ ∪ ΔA and B = B₀ ∪ ΔB (disjoint unions), the new
    joined rows are exactly ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB — three joins
    in which at least one side is delta-sized. Each delta side
    carries an explicit broadcast hint: at 100 TB the base tables
    NEVER shuffle for maintenance — each term streams the big side
    map-side against a broadcast of the (small) delta batch. Feed
    the result (op='I') to ``incremental_agg_apply`` to fold into
    a materialized aggregate over the join.

    Deletes are intentionally out of scope here: a delete on one
    side retracts joined rows that need the OTHER side's matching
    rows to reconstruct — same honest boundary as MIN/MAX in
    ``incremental_agg_apply`` (it needs a second join against the
    base, not a different algebra; callers with delete batches run
    the same three-term decomposition with 'D' markers).

    ``on``: list of (left_col, right_col) equi-join pairs. Left
    and right column names must be disjoint (star-schema
    convention) — the three joined terms are unioned by name, so
    a shared name would be ambiguous; rename before calling.
    """
    if not on:
        raise ValueError("join_insert_deltas needs join key pairs")
    shared = set(base_left.columns) & set(base_right.columns)
    if shared:
        raise ValueError(
            "left/right column names must be disjoint; rename "
            f"before joining: {sorted(shared)}"
        )

    def _cond(left: DataFrame, right: DataFrame):
        c = left[on[0][0]] == right[on[0][1]]
        for lc, rc in on[1:]:
            c = c & (left[lc] == right[rc])
        return c

    t1 = F.broadcast(delta_left).join(
        base_right, _cond(delta_left, base_right)
    )
    t2 = base_left.join(
        F.broadcast(delta_right), _cond(base_left, delta_right)
    )
    t3 = F.broadcast(delta_left).join(
        delta_right, _cond(delta_left, delta_right)
    )
    return t1.unionByName(t2).unionByName(t3)


def incremental_agg_apply(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
    op_col: str = "op",
) -> DataFrame:
    """Incremental maintenance of a materialized per-key aggregate
    — the 100 TB answer to late-arriving data: never recompute the
    corpus-sized GROUP BY; fold a CDC delta batch into the stored
    (key, sums, count) table instead.

    ``base``: the materialized aggregate — ``keys`` + the value
    columns named by ``sum_cols`` keys + ``count_col``.
    ``delta``: raw rows with an ``op_col`` ∈ {'I','D'} (an update
    is a D of the old image + an I of the new one, the standard
    CDC decomposition); ``sum_cols`` maps each aggregate column to
    the raw delta column feeding it.

    SUM and COUNT are abelian-group aggregates (every insert has
    an exact inverse), so maintenance is: sign the delta rows
    (+1/-1), partially aggregate the BATCH (map-side combinable —
    the only shuffle is delta-sized, never base-sized), then one
    key-equijoin merge with the base and a drop of keys whose
    count reaches zero. MIN/MAX are deliberately NOT offered here:
    they are not invertible under deletes (a retracted maximum
    needs the full history to re-derive) — that restriction is the
    honest boundary of delta maintenance, not an implementation
    gap.

    Determinism: inputs are expected integer-grid/decimal columns
    per the repo's aggregate convention (CLAUDE.md rule 1); this
    function only adds/subtracts them, introducing no float
    reordering of its own.
    """
    if not sum_cols:
        raise ValueError("sum_cols must name at least one aggregate")
    bad = [c for c in sum_cols if c == count_col]
    if bad:
        raise ValueError(f"sum column collides with count_col: {bad}")
    # unknown op markers fail loudly at evaluation time (a null
    # sign would silently drop the row from every sum instead).
    sign = (
        F.when(F.col(op_col) == "I", F.lit(1))
        .when(F.col(op_col) == "D", F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("unknown CDC op marker: "),
                    F.col(op_col).cast("string"),
                )
            )
        )
    )
    signed = delta.withColumn("__sign", sign)
    d_agg = signed.groupBy(*keys).agg(
        F.sum("__sign").cast("bigint").alias(f"__d_{count_col}"),
        *[
            F.sum(F.col(src) * F.col("__sign")).alias(f"__d_{dst}")
            for dst, src in sum_cols.items()
        ],
    )
    merged = base.join(d_agg, keys, "full_outer")
    out_cols = [F.col(k) for k in keys]
    for dst in sum_cols:
        out_cols.append(
            (
                F.coalesce(F.col(dst), F.lit(0))
                + F.coalesce(F.col(f"__d_{dst}"), F.lit(0))
            ).alias(dst)
        )
    out_cols.append(
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col(f"__d_{count_col}"), F.lit(0))
        ).alias(count_col)
    )
    return merged.select(*out_cols).filter(F.col(count_col) > 0)
