"""Quality-filter funnel: the shared flag/rollup kernel behind the
batch report (plans/llm_ops.filter_funnel_report) and the streaming
per-batch sink (streaming/funnel.quality_funnel_sink) — ONE
definition of the five rules, so online and offline funnels cannot
drift apart.

Five ordered Gopher-style heuristics, ALL in pure integer
arithmetic (threshold compares as cross-multiplications, never
ratios — zero float-portability surface):

  1 token_count_bounds    8 <= n_tokens <= 4096
  2 mean_token_len        2 <= tok_chars/n_tokens <= 12
  3 distinct_ratio        n_distinct/n_tokens >= 1/8
  4 top_token_dominance   max_freq/n_tokens <= 1/4
  5 max_token_len         max token length <= 24

Scale shape: one token explode -> (doc, token) count -> per-doc
5-metric aggregate (all map-side combinable); the rollup is
fifteen sums over the flag table and a constant 5-row projection.
Empty documents enter via the LEFT join and fail rule 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES = (
    "token_count_bounds",
    "mean_token_len",
    "distinct_ratio",
    "top_token_dominance",
    "max_token_len",
)


def funnel_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document pass/fail flags f1..f5 (BIGINT 0/1)."""
    tc = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("t"),
        )
        .filter(F.length("t") > 0)
        .groupBy("__id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m0 = tc.groupBy("__id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("max_freq"),
        F.sum(F.length("t") * F.col("c"))
        .cast("bigint")
        .alias("tok_chars"),
        F.max(F.length("t")).cast("bigint").alias("max_len"),
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    m = (
        docs.select(F.col(id_col).alias("__id"))
        .join(m0, "__id", "left")
        .select(
            "__id",
            z("n_tokens").alias("n_tokens"),
            z("n_distinct").alias("n_distinct"),
            z("max_freq").alias("max_freq"),
            z("tok_chars").alias("tok_chars"),
            z("max_len").alias("max_len"),
        )
    )
    b = lambda c: c.cast("bigint")  # noqa: E731
    return m.select(
        F.col("__id").alias(id_col),
        b(
            F.col("n_tokens").between(8, 4096).cast("int")
        ).alias("f1"),
        b(
            (
                (
                    F.lit(2) * F.col("n_tokens")
                    <= F.col("tok_chars")
                )
                & (
                    F.col("tok_chars")
                    <= F.lit(12) * F.col("n_tokens")
                )
            ).cast("int")
        ).alias("f2"),
        b(
            (
                F.lit(8) * F.col("n_distinct")
                >= F.col("n_tokens")
            ).cast("int")
        ).alias("f3"),
        b(
            (
                F.lit(4) * F.col("max_freq") <= F.col("n_tokens")
            ).cast("int")
        ).alias("f4"),
        b((F.col("max_len") <= 24).cast("int")).alias("f5"),
    )


def funnel_rollup(flags: DataFrame) -> DataFrame:
    """The 5-row funnel report from a flag table: per ordered rule,
    (stage, rule, n_in, n_dropped, n_out, n_sole_reject)."""
    f = [F.col(f"f{i}") for i in range(1, 6)]
    neg = [F.lit(1) - c for c in f]
    prod = lambda cols: (  # noqa: E731
        cols[0] if len(cols) == 1 else cols[0] * prod(cols[1:])
    )
    s = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            F.sum(prod(f[:i] + [neg[i]]))
            .cast("bigint")
            .alias(f"d{i + 1}")
            for i in range(5)
        ],
        *[
            F.sum(prod(f[: i + 1]))
            .cast("bigint")
            .alias(f"in{i + 2}")
            for i in range(4)
        ],
        F.sum(prod(f)).cast("bigint").alias("out5"),
        *[
            F.sum(prod([neg[i]] + f[:i] + f[i + 1 :]))
            .cast("bigint")
            .alias(f"u{i + 1}")
            for i in range(5)
        ],
    ).localCheckpoint(eager=False)
    # ^ the 1-row summary feeds FIVE union branches — without the
    # checkpoint each branch re-runs the corpus explode (rule 12).
    ins = ["n_docs", "in2", "in3", "in4", "in5"]
    outs = ["in2", "in3", "in4", "in5", "out5"]
    rows = None
    for i, rule in enumerate(RULES):
        r = s.select(
            F.lit(i + 1).alias("stage"),
            F.lit(rule).alias("rule"),
            F.col(ins[i]).alias("n_in"),
            F.col(f"d{i + 1}").alias("n_dropped"),
            F.col(outs[i]).alias("n_out"),
            F.col(f"u{i + 1}").alias("n_sole_reject"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows
