"""k-center coreset selection (farthest-point sampling) — the
data-pruning / diversity-selection primitive: greedily pick the
vector farthest from everything already selected, k times. The
selected set is a 2-approximation of the optimal k-center cover
(Gonzalez 1985), which is why FPS is the standard seed for
diverse eval sets, annotation batches, and k-means++-style inits
over embedding corpora.

Exactness: embeddings are quantized ONCE to the 1e6 integer grid
(CAST to DOUBLE first — CLAUDE.md rule 16; round() is
half-away-from-zero on both engines), and every distance is an
exact int64 squared-Euclidean fold (max Σ over 64 dims of
(2·5.3e5)² ≈ 7e13 « 2^63), so the argmax trajectory is
bit-identical to an unrolled MATERIALIZED-CTE DuckDB replica.
Ties break (distance DESC, vec_id ASC); the seed is the smallest
vec_id.

Scale shape (CLAUDE.md rule 14 — literal model state): the only
per-round data work is ONE projection updating the running
min-distance column against the newest center (a driver-literal
array) plus one max(struct) aggregate — no joins, no windows, no
per-round shuffle of the corpus. The frame is localCheckpointed
per round (lineage otherwise stacks k projections). Driver state
is k vectors — bounded and tiny. The distance is a rule-15 HOF
fold (small codegen loop; sanctioned because the output is
oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_to(center: list[int]) -> F.Column:
    lits = ", ".join(str(int(v)) + "L" for v in center)
    return F.expr(
        f"""aggregate(
            zip_with(qa, array({lits}), (x, y) -> (x - y) * (x - y)),
            0L, (acc, v) -> acc + v)"""
    )


def kcenter_select(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 10**6,
) -> DataFrame:
    """Greedy farthest-point selection of ``k`` vectors.

    Returns a k-row DataFrame (round, vec_id, dist_sq): the
    selection order, each row's dist_sq being the squared grid
    distance from the new pick to the previously-selected set
    (0 for the seed)."""
    spark = emb.sparkSession
    q = emb.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, x -> CAST(round("
            f"CAST(x AS DOUBLE) * {grid}.0) AS BIGINT))"
        ).alias("qa"),
    ).localCheckpoint()
    seed_row = (
        q.orderBy("id").limit(1).collect()
    )
    if not seed_row:
        raise ValueError("kcenter_select over an empty corpus")
    seed_id, seed_qa = seed_row[0]["id"], list(seed_row[0]["qa"])
    selected = [(0, int(seed_id), 0)]
    cur = q.select("id", "qa", _dist_to(seed_qa).alias("dmin"))
    for rnd in range(1, k):
        cur = cur.localCheckpoint()
        best = cur.agg(
            F.max(
                F.struct(
                    F.col("dmin"),
                    (-F.col("id")).alias("negid"),
                    F.col("qa"),
                )
            ).alias("b")
        ).collect()[0]["b"]
        sel_id = -best["negid"]
        selected.append((rnd, int(sel_id), int(best["dmin"])))
        cqa = list(best["qa"])
        cur = cur.select(
            "id",
            "qa",
            F.least(
                F.col("dmin"), _dist_to(cqa)
            ).alias("dmin"),
        )
    return spark.createDataFrame(
        selected, "round int, vec_id long, dist_sq long"
    )
