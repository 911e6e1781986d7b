"""Bloom-filter membership pre-filter — the classic 100 TB
ingest-dedup pattern: before the expensive exact anti-join of new
records against a massive historical corpus, build a compact
bitmap of the historical keys ONCE, broadcast it, and let only the
bloom-positive rows (true matches + a tunable false-positive
fraction) proceed to the exact join. The bitmap is m bits for any
corpus size: membership pre-filtering costs a broadcast hash probe
per row instead of a corpus-sized shuffle.

Everything is deterministic and engine-portable (the repo's
md5-derived integer convention, operators/sampling.py): bit
position i of a key is

    pos_i = int(md5(f"{i}:" + key)[:13 hex]) mod m     (52 bits)

so the same key sets the same bits in Spark, in the DuckDB oracle,
and across retries — no RNG, no JVM-hash dependence. m is a power
of two by contract (mod of a non-negative 52-bit value matches
across engines regardless, but power-of-two keeps the bitmap word
arithmetic exact).

Representation: the bitmap is a DataFrame of (word_idx, bits) —
m/64 rows of OR-ed 64-bit words, built by ONE map-side-combinable
``bit_or`` aggregate over the (key × k hashes) position stream.
m/64 rows broadcast-join against any probe stream; nothing here
ever collects corpus-sized state to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: F.Column, k_hashes: int, m_bits: int):
    """The k md5-derived bit positions of a key (list of Columns,
    each a non-negative BIGINT < m_bits)."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 13),
            16,
            10,
        ).cast("bigint")
        % F.lit(m_bits)
        for i in range(k_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 2,
) -> DataFrame:
    """Build the bitmap: (word_idx BIGINT, bits BIGINT), one row
    per 64-bit word that has at least one set bit (absent word =
    all zeros). One narrow projection + one ``bit_or`` aggregate —
    partials combine map-side, so the only shuffle is m/64 words
    per input partition regardless of corpus size.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64: {m_bits}")
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_bit_positions(key, k_hashes, m_bits)))
    return (
        df.select(pos.alias("pos"))
        .select(
            F.expr("pos div 64").alias("word_idx"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pos % 64 as int))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 4096,
    k_hashes: int = 2,
) -> DataFrame:
    """Probe: adds ``bloom_positive`` (true iff ALL k bits of the
    key are set) to ``probes``. The k positions explode to k rows
    per probe, broadcast-join the m/64-word bitmap, and reduce with
    one ``bool_and`` group-by on the probe's id columns — the probe
    stream never shuffles anything wider than its own columns.

    A missing word row means those 64 bits are all zero, hence a
    definite miss (left join + null check).
    """
    cols = probes.columns
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_bit_positions(key, k_hashes, m_bits)))
    probed = (
        probes.withColumn("__pos", pos)
        .withColumn("__word_idx", F.expr("__pos div 64"))
        .withColumn(
            "__mask",
            F.expr(
                "shiftleft(cast(1 as bigint), cast(__pos % 64 as int))"
            ),
        )
        .join(F.broadcast(bloom), F.col("__word_idx") == bloom.word_idx, "left")
        .withColumn(
            "__hit",
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(F.col("__mask")) != 0),
        )
    )
    return (
        probed.groupBy(*[F.col(c) for c in cols])
        .agg(F.bool_and("__hit").alias("bloom_positive"))
    )
