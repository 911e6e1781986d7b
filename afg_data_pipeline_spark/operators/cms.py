"""Count–min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
estimation — the streaming-scale frequency primitive: a d×w
counter matrix whose size is FIXED regardless of corpus size,
answering "how often does key x occur?" with a one-sided error
(estimate ≥ truth; overcount ≤ εN with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).

Everything is deterministic and engine-portable (the repo's
md5-derived integer convention, operators/sampling.py /
operators/bloom.py): row j hashes key x to

    pos_j(x) = int(md5(f"{j}:" + x)[:13 hex]) mod w

so — unlike the HLL/KLL sketches in plans/aggregates.py, whose
merge internals are engine-specific by design — this sketch is
EXACTLY reproducible in SQL, and the registered query checks
hash-exact against a DuckDB oracle.

Scale shape:
- Build: one map-side-combinable aggregate over the (key × d)
  position stream — the shuffle is ≤ d·w counter partials per
  input partition, the result ≤ d·w rows (broadcastable by
  construction).
- Query: candidates join the broadcast counter table on (j, pos)
  and reduce with one min() group-by. Candidate enumeration is the
  caller's concern: here the distinct-key table (vocabulary-sized
  for text); at stream scale a candidate heap rides alongside the
  sketch (the classic topk+CMS pairing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key: F.Column, depth: int, width: int):
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, 13),
            16,
            10,
        ).cast("bigint")
        % F.lit(width)
        for j in range(depth)
    ]


def _hash_explode(df: DataFrame, key_col: str, depth: int, width: int):
    """(…, j, pos): each input row fanned out to its d counter
    cells."""
    key = F.col(key_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), p.alias("pos")
            )
            for j, p in enumerate(_positions(key, depth, width))
        ]
    )
    return df.withColumn("__h", F.explode(pairs)).select(
        *df.columns, F.col("__h.j").alias("j"), F.col("__h.pos").alias("pos")
    )


def cms_build(
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the counter table (j, pos, c) from a key stream (one
    row per occurrence). ≤ depth·width rows out."""
    if width <= 0 or depth <= 0:
        raise ValueError(f"bad sketch shape: {depth}x{width}")
    return (
        _hash_explode(keys.select(key_col), key_col, depth, width)
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    key_col: str,
    counters: DataFrame,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Adds ``est_count`` = min_j counters[j, pos_j(key)] to
    ``candidates``. Counter cells of a key that actually occurred
    always exist (its own occurrences counted into them), so the
    join is inner; keys that never occurred are the caller's
    lookup-miss concern."""
    cols = candidates.columns
    fanned = _hash_explode(candidates, key_col, depth, width)
    return (
        fanned.join(F.broadcast(counters), ["j", "pos"])
        .groupBy(*[F.col(c) for c in cols])
        .agg(F.min("c").alias("est_count"))
    )


def cms_heavy_hitters(
    keys: DataFrame,
    key_col: str,
    k: int = 50,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Top-k keys by CMS-estimated frequency, with the exact count
    alongside (the overcount column IS the sketch's measured error
    at this width — the tunable at scale is w, exactly like the
    Bloom filter's m): (key, est_count, true_count, overcount),
    ordered (est_count DESC, key ASC) — every ranking tie-broken.
    """
    counters = cms_build(keys, key_col, width, depth)
    cand = (
        keys.select(F.col(key_col).cast("string").alias(key_col))
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    est = cms_estimate(cand, key_col, counters, width, depth)
    return (
        est.select(
            key_col,
            "est_count",
            "true_count",
            (F.col("est_count") - F.col("true_count")).alias(
                "overcount"
            ),
        )
        .orderBy(F.col("est_count").desc(), F.col(key_col).asc())
        .limit(k)
    )
