"""Multimodal-column plumbing: opaque binary media + typed metadata.

North-star requirement: treat image/audio/video as opaque `binary`
columns with typed metadata and run decode / feature-extract /
resize / frame-sample as Arrow-batched pandas stages over
mapInPandas. The image/audio codec libraries are NOT in this
container, so the codec call itself is stubbed (NotImplementedError
for real decoding, a deterministic fake for tests) — but everything
Spark-side is real and tested: the schema contract, the mapInPandas
batch shape, partition-size control, and the metadata struct.

At scale the rules this module encodes:
- media bytes ride in their own column; all filtering/joining
  happens on metadata columns so Parquet column pruning skips the
  heavy bytes unless a stage actually decodes;
- decode stages bound memory by rows-per-batch
  (spark.sql.execution.arrow.maxRecordsPerBatch), not rows-per-task;
- outputs are fixed-width feature vectors, so downstream is normal
  columnar work (see operators/similarity.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, "
    "meta struct<format:string, width:int, height:int>"
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic synthetic media column for plumbing tests.

    The 'image' is the md5 byte stream of the text repeated to a
    size derived from the text — stands in for real bytes whose
    decode is stubbed. Metadata is a typed struct, as a real
    ingest would carry (format/width/height from the container
    header, parsed at ingest time, NOT by decoding pixels).
    """
    return df.select(
        "doc_id",
        F.unhex(F.md5(F.col(text_col))).alias("media"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.length(text_col) % 64 + 1).cast("int").alias("width"),
            (F.length(text_col) % 48 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_media(data: bytes, fmt: str) -> bytes:
    """Codec stub. Real formats need libs absent from this
    container; the contract is bytes -> raw pixel/frame bytes."""
    if fmt == "fake/raw":
        return data
    raise NotImplementedError(
        f"no codec for {fmt!r}: image/audio decode libraries are "
        "not available in this environment (stubbed by design)"
    )


def extract_features(
    df: DataFrame,
    n_features: int = 8,
    decoder: Callable[[bytes, str], bytes] = decode_media,
) -> DataFrame:
    """Decode + featurize media via Arrow-batched mapInPandas.

    Output: (doc_id, feature array<double>) — a deterministic
    byte-histogram over the decoded bytes stands in for a model
    embedding; the batch shape (iterator of pandas frames, one
    output row per input row, fixed-width vector) is exactly what a
    real model-inference stage uses.
    """
    import numpy as np
    import pandas as pd

    out_schema = "doc_id long, feature array<double>"

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = []
            for media, meta in zip(pdf["media"], pdf["meta"]):
                raw = decoder(bytes(media), meta["format"])
                arr = np.frombuffer(raw, dtype=np.uint8)
                hist, _ = np.histogram(
                    arr, bins=n_features, range=(0, 256)
                )
                total = hist.sum()
                feats.append(
                    (hist / total if total else hist).astype(float).tolist()
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "feature": feats}
            )

    return df.select("doc_id", "media", "meta").mapInPandas(
        batches, schema=out_schema
    )


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    fps_out: float = 1.0,
) -> DataFrame:
    """Sample n_frames per media row — the row-EXPANDING multimodal
    stage (1 video -> N frame rows), Arrow-batched.

    Output: (doc_id, frame_idx, frame_ts, frame binary). The
    "decode + seek" is stubbed deterministically (frame i is a
    keyed md5 stream over the media bytes); the Spark-side contract
    is real: fixed output schema, per-batch pandas expansion, and —
    critically — a round-robin repartition of the INPUT, because
    AQE sizes partitions from input shuffle bytes and cannot see
    the N× row expansion (CLAUDE.md rule: pre-expansion side must
    be spread or the whole expansion runs in few tasks). Frame
    bytes dominate output size, so downstream stages should select
    metadata columns only unless they consume pixels.
    """
    import hashlib

    import pandas as pd

    out_schema = (
        "doc_id long, frame_idx int, frame_ts double, frame binary"
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select("doc_id", "media", "meta").repartition(par)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(media)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i / fps_out)
                    frames.append(
                        hashlib.md5(raw + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_ts": tss,
                    "frame": frames,
                }
            )

    return src.mapInPandas(batches, schema=out_schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize contract: new meta dims; pixel work is codec-stubbed.

    Real implementation maps decode->resample->encode per batch;
    the Spark plumbing (metadata update + passthrough of the bytes
    column) is what this verifies.
    """
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
        ),
    )
