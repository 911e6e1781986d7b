"""Maximal Marginal Relevance (MMR) diversified reranking.

Carbonell & Goldstein 1998: from a candidate pool ranked by
relevance, iteratively pick the item maximizing
``lambda * rel(c) - (1 - lambda) * max_{s in S} sim(c, s)`` —
relevance traded against redundancy with what's already selected.
The standard post-processing step after any ANN/retrieval top-k
when the consumer wants coverage, not five near-copies.

Spark shape: the selection is a per-query LOCAL loop over a
k_cand-bounded candidate set (20 here), so the right execution is
``groupBy(query_id).applyInPandas`` — each query's selection runs
independently, parallelism scales with Q, and no global state or
iteration-synchronizing shuffle exists (5 unrolled global joins
would pay 5 shuffle barriers for work that is per-group local).
All float inputs (relevance and candidate-pair cosines) are
computed SPARK-SIDE with the portable sequential-fold dot product
(operators/similarity.py conventions) and only compared/combined
inside pandas with single IEEE ops (0.5*x - 0.5*y), so the result
is bit-identical to the unrolled-CTE DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MMR_SCHEMA = (
    "query_id bigint, sel_rank int, neighbor_id bigint, "
    "relevance double, mmr_score double"
)


def _mmr_group(pdf):
    """Greedy MMR over one query's candidate pool (pandas group).

    Ties break on the smaller neighbor id (strict > while scanning
    candidates in ascending id order). The empty-selection penalty
    is 0.0 by spec (rank-1 score = 0.5*rel), NOT a clamp — later
    rounds take the true max, which can be negative.
    """
    import pandas as pd

    rel: dict[int, float] = {}
    sim: dict[tuple[int, int], float] = {}
    for r in pdf.itertuples(index=False):
        c = int(r.cand)
        rel.setdefault(c, float(r.rel))
        o = int(r.other)
        if c != o:
            sim[(c, o)] = float(r.sim)
    qid = int(pdf["query_id"].iloc[0])
    selected: list[int] = []
    out = []
    k = min(5, len(rel))
    for rank in range(1, k + 1):
        best = None
        best_score = None
        best_rel = None
        for c in sorted(rel):
            if c in selected:
                continue
            if selected:
                try:
                    ms = max(sim[(c, s)] for s in selected)
                except KeyError as e:
                    # the contract: pairs must contain EVERY
                    # ordered candidate pair per query (the
                    # registered query builds a complete table);
                    # fail loudly instead of a bare KeyError deep
                    # inside applyInPandas (ADVICE r8).
                    raise ValueError(
                        "mmr_rerank: incomplete pair table for "
                        f"query_id={qid}: missing sim for "
                        f"(cand={c}, other={e.args[0][1]}); the "
                        "pairs frame must contain every ordered "
                        "candidate pair per query"
                    ) from None
            else:
                ms = 0.0
            score = 0.5 * rel[c] - 0.5 * ms
            if best is None or score > best_score:
                best, best_score, best_rel = c, score, rel[c]
        selected.append(best)
        out.append((qid, rank, best, best_rel, best_score))
    return pd.DataFrame(
        out,
        columns=[
            "query_id",
            "sel_rank",
            "neighbor_id",
            "relevance",
            "mmr_score",
        ],
    )


def mmr_rerank(pairs: DataFrame) -> DataFrame:
    """Run greedy MMR per query over a candidate pair table.

    ``pairs`` columns: query_id, cand, rel, other, sim — one row
    per ordered candidate pair within a query (self-pairs allowed
    and ignored; they keep single-candidate queries alive through
    the join that builds the table).
    """
    return pairs.groupBy("query_id").applyInPandas(
        _mmr_group, schema=_MMR_SCHEMA
    )
