"""Single-evaluation threshold gates for expensive expressions.

The optimizer duplicates a deterministic expression that is both
PROJECTED and FILTERED on: ``.select(e.alias("x")).filter("x >= t")``
becomes a Filter(e >= t) *below* the Project(e) — two evaluations per
surviving row — and when ``e`` references both sides of a join the
pushed predicate lands in the join condition, so every candidate pair
pays one evaluation and every survivor pays two (guide §4.4 describes
the UDF case; interpreted HOF folds and array_intersect hit the same
rule — CLAUDE.md rule 18c). Spark offers no optimizer barrier short
of materialization, and checkpointing a wide pair stream costs more
than it saves (rule 17, measured in r10).

``filter_once`` builds the barrier out of a GENERATE instead, for
free: wrap the value in a 1-element array, drop it inside the
generator input with ``filter(array(e), pred)``, and explode with the
OUTER variant. The generator input is evaluated exactly once per row;
survivors emit the value, non-survivors emit NULL (outer), and the
``IS NOT NULL`` filter above references only the generator OUTPUT
attribute, which no pushdown rule can rewrite in terms of the input.
The OUTER explode is load-bearing twice over: a non-outer explode
would let InferFiltersFromGenerate add a ``size(...) > 0`` filter
below the Generate that re-runs the expression — the exact
duplication this helper exists to remove (the r10 chunking-family
lesson).

Semantics: identical to ``.filter(pred(e))`` provided ``pred(NULL)``
is never TRUE (always the case for comparisons): a NULL value makes
the lambda predicate NULL, the element is dropped, the outer explode
emits a NULL row and the IS NOT NULL filter removes it.

Rule-10 note (HOF lambdas): the lambda here is a trivial comparison
over a 1-element array; every current caller is oracle-checked, so a
recurrence of the HOF-corruption class would surface as a red row.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def const_join_key(col_name: str) -> Column:
    """A constant-0 join key DERIVED from an attribute:
    ``pmod(xxhash64(col), 1)``.

    The rule-23 constant-key pair join (``lit(1)`` on both sides)
    no longer plans as a BroadcastHashJoin: FoldablePropagation
    substitutes the literal into the equi-condition, ConstantFolding
    collapses ``1 = 1`` to ``true``, and the join degrades to a
    BroadcastNestedLoopJoin whose pair generation runs interpreted
    (measured r11: every lit-key site in the repo planned BNLJ).
    An attribute-DERIVED constant is not foldable, so the key
    survives and pair generation stays inside whole-stage codegen.
    xxhash64 never returns NULL (null inputs hash to the seed), so
    the key is 0 for every row — the join is exactly the cross
    product, rows with NULL ids included.
    """
    return F.pmod(F.xxhash64(col_name), F.lit(1))


def project_once(
    df: DataFrame, expr: Column, alias: str
) -> DataFrame:
    """Expose ``expr`` as column ``alias`` behind a Generate
    barrier, exactly one output row per input row.

    ``explode_outer(array(expr))`` emits the value (a 1-element
    array is never empty; a NULL value rides as [NULL] → one NULL
    row, so NULLs are preserved). Downstream predicates on the
    column reference a generator OUTPUT attribute, which no
    pushdown rule can rewrite in terms of the input — so a consumer
    ``.filter(col >= t)`` can no longer be pushed below the
    projection into a join condition, re-evaluating ``expr`` per
    candidate (the rule-18c class ``filter_once`` removes when the
    threshold is known here; this is the producer-side variant for
    operators whose CALLERS choose the threshold).
    """
    return df.select(
        "*", F.explode_outer(F.array(expr)).alias(alias)
    )


def filter_once(
    df: DataFrame,
    expr: Column,
    pred: Callable[[Column], Column],
    alias: str,
) -> DataFrame:
    """Keep rows where ``pred(expr)`` holds, with ``expr`` exposed as
    column ``alias`` and evaluated EXACTLY ONCE per input row.

    Equivalent to ``df.withColumn(alias, expr).filter(pred(col))``
    minus the optimizer's duplicate evaluation of ``expr`` (see
    module docstring). All existing columns are preserved.
    """
    gated = df.select(
        "*",
        F.explode_outer(F.filter(F.array(expr), pred)).alias(alias),
    )
    return gated.filter(F.col(alias).isNotNull())
