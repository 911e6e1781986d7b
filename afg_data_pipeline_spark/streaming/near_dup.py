"""Streaming near-duplicate suppression with bounded state.

The batch near-dup pipelines (banded MinHash, winnowing) need
self-joins — unbounded state on a stream. The streaming-feasible
tier is SIGNATURE-EQUALITY dedup: compute a content signature per
arriving document with a STATELESS operator, then
``dropDuplicatesWithinWatermark`` on the signature — state bounded
by the watermark, exactly like the exact-id dedup in
streaming/windows.py.

SimHash is the signature (operators/dedup.simhash_of_texts —
Arrow-batched mapInPandas, stateless, stream-safe, and NOT a
HOF-lambda expression, which matters because this path has no SQL
oracle; CLAUDE.md rule 10): identical 64-bit SimHash means the
token-frequency bit votes coincide — exact duplicates, token
reorderings, and very-near edits collapse to one row. Recall
contract, stated not hidden: this is Hamming-distance-0 dedup; a
doc pair at Hamming distance 1-3 (looser near-dups) needs the
multi-band OR that only the batch pipelines' joins can express —
the standard stream-ingest/batch-sweep split: suppress the heavy
exact/reordered duplication at ingest, run the banded batch sweep
on the stored corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """(id, ts, simhash) via ONE stateless mapInPandas that carries
    the timestamp through — no join back onto the stream (a
    stream-stream self-join would need its own watermark state)."""
    from afg_data_pipeline_spark.operators.dedup import (
        simhash_of_texts,
    )

    out_schema = f"{id_col} long, {ts_col} timestamp, simhash long"

    def batch(iterator):
        import pandas as pd

        for pdf in iterator:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    ts_col: pdf[ts_col].values,
                    "simhash": simhash_of_texts(pdf[text_col]),
                }
            )

    return df.select(
        id_col, F.col(ts_col).cast("timestamp").alias(ts_col), text_col
    ).mapInPandas(batch, schema=out_schema)


def near_dup_within_watermark(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "2 hours",
) -> DataFrame:
    """First-arrival-wins near-dup suppression on a document
    stream: (id, ts, simhash), one row per distinct SimHash within
    the watermark window. The only stateful operator in the query
    is the final watermark dedup — the one-stateful-operator shape
    Structured Streaming supports everywhere."""
    withsig = with_simhash(stream, id_col, text_col, ts_col)
    return withsig.withWatermark(
        ts_col, delay
    ).dropDuplicatesWithinWatermark(["simhash"])
