"""Multimodal-column plumbing: opaque binary media + typed metadata.

North-star requirement: treat image/audio/video as opaque `binary`
columns with typed metadata and run decode / feature-extract /
resize / frame-sample as Arrow-batched pandas stages over
mapInPandas. No codec library ships in this container, so
operators/codecs.py implements the codecs themselves in pure
NumPy — WAV/BMP/PPM, PNG (zlib + defiltering), baseline JPEG
(T.81 huffman + IDCT) — and only the MP3/H.264/progressive-JPEG
class still raises NotImplementedError. Everything Spark-side is
real and tested: the schema contract, the mapInPandas batch shape,
partition-size control, and the metadata struct.

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


_WAV_MIMES = frozenset({"audio/wav", "audio/x-wav"})
_BMP_MIMES = frozenset({"image/bmp", "image/x-bmp"})
_PPM_MIMES = frozenset({"image/ppm", "image/x-portable-pixmap"})
_PNG_MIMES = frozenset({"image/png"})
_JPEG_MIMES = frozenset({"image/jpeg", "image/jpg"})


def decode_raster(data: bytes, fmt: str):
    """Raster decode shared by every image stage: magic bytes first
    (the authoritative signal), declared mime as fallback — ONE
    dispatch, so feature-extract/resize/frame-sample can't drift
    from decode_media's accepted-format sets.

    Returns an (H, W, 3) uint8 array; raises NotImplementedError
    for formats without an in-environment codec."""
    from afg_data_pipeline_spark.operators import codecs

    if data[:2] == b"P6" or fmt in _PPM_MIMES:
        return codecs.decode_ppm(data)
    if data[:2] == b"BM" or fmt in _BMP_MIMES:
        return codecs.decode_bmp(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n" or fmt in _PNG_MIMES:
        # COMPRESSED format decoded for real: DEFLATE is stdlib
        # zlib, defiltering is numpy (codecs.decode_png — 8-bit
        # gray/RGB/palette/alpha, all 5 filter types).
        return codecs.decode_png(data)
    if data[:2] == b"\xff\xd8" or fmt in _JPEG_MIMES:
        # Baseline JFIF decoded for real from the T.81 spec in
        # numpy (codecs.decode_jpeg — Annex-K tables, huffman,
        # IDCT, 4:4:4/4:2:0, restart markers). Progressive /
        # arithmetic streams raise NotImplementedError from the
        # codec itself.
        return codecs.decode_jpeg(data)
    raise NotImplementedError(
        f"no raster codec for {fmt!r}: TIFF/WebP-class codec "
        "libraries are not available in this environment"
    )


def decode_media(data: bytes, fmt: str) -> bytes:
    """Container decode: bytes -> raw sample/pixel bytes.

    Decoded FOR REAL by the pure-NumPy codecs in
    operators/codecs.py: RIFF/WAVE PCM -> little-endian float64
    sample bytes; BMP/PPM (uncompressed), PNG (stdlib zlib +
    numpy defiltering) and baseline JPEG (T.81 huffman + IDCT in
    numpy) -> packed RGB bytes via the shared decode_raster
    dispatch. The remaining compressed-codec boundary (MP3, H.264,
    progressive JPEG) genuinely needs libraries absent from this
    environment and raises NotImplementedError.
    """
    from afg_data_pipeline_spark.operators import codecs

    if fmt == "fake/raw":
        return data
    if fmt in _WAV_MIMES:
        return codecs.decode_wav(data)["samples"].tobytes()
    if (
        fmt in _BMP_MIMES
        or fmt in _PPM_MIMES
        or fmt in _PNG_MIMES
        or fmt in _JPEG_MIMES
    ):
        return decode_raster(data, fmt).tobytes()
    raise NotImplementedError(
        f"no codec for {fmt!r}: MP3/H.264-class codec "
        "libraries are not available in this environment"
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
    decoder: Callable[[bytes, str], bytes] = decode_media,
) -> DataFrame:
    """Sample n_frames per media row — the row-EXPANDING multimodal
    stage (1 stream -> N frame rows), Arrow-batched.

    Output: (doc_id, frame_idx, frame_ts, frame binary). The decode
    is REAL for in-environment codecs (decode_media: WAV/BMP/PPM);
    frame i is the i-th of n_frames contiguous segments of the
    decoded payload — row strips of a raster, sample windows of a
    PCM stream — i.e. genuine uniform temporal/spatial subsampling,
    not a keyed hash stand-in. The Spark-side contract: fixed
    output schema, per-batch pandas expansion, and — critically — a
    round-robin repartition of the INPUT, because AQE sizes
    partitions from input shuffle bytes and cannot see the N× row
    expansion (CLAUDE.md rule: pre-expansion side must be spread or
    the whole expansion runs in few tasks). Frame bytes dominate
    output size, so downstream stages should select metadata
    columns only unless they consume pixels.
    """
    import pandas as pd

    out_schema = (
        "doc_id long, frame_idx int, frame_ts double, frame binary"
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select("doc_id", "media", "meta").repartition(par)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, media, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["meta"]
            ):
                raw = decoder(bytes(media), meta["format"])
                n = len(raw)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i / fps_out)
                    frames.append(
                        raw[n * i // n_frames : n * (i + 1) // n_frames]
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


def attach_synth_wav(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic REAL WAV media column derived from a text key —
    a PCM16 sine, md5-seeded (operators/codecs.py). Exercises the
    actual RIFF codec end-to-end, not the fake/raw stand-in.

    Built via Arrow-batched mapInPandas: the synth + encode is
    per-row Python work, so it runs on executors over batches, with
    a round-robin repartition first (single-file corpora otherwise
    synthesize on one task)."""
    from collections.abc import Iterator

    import pandas as pd

    from afg_data_pipeline_spark.operators.codecs import synth_wav_for_text

    out_schema = (
        "doc_id long, media binary, "
        "meta struct<format:string, width:int, height:int>"
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select("doc_id", text_col).repartition(par)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            media = [synth_wav_for_text(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media": media,
                    "meta": [
                        {"format": "audio/wav", "width": None, "height": None}
                        for _ in media
                    ],
                }
            )

    return src.mapInPandas(batches, schema=out_schema)


def attach_synth_bmp(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic REAL media column with true pixel dimensions
    in the metadata struct — parsed from the container header the
    way a real ingest would, without decoding pixels.

    MIXED containers, same pixels: even doc_ids carry BMP, odd
    doc_ids carry PNG of the IDENTICAL md5-seeded gradient
    (operators/codecs.py), so every downstream decode exercises
    both the uncompressed and the real zlib-compressed codec
    through the magic-byte dispatch while producing byte-identical
    RGB — feature values are container-independent by
    construction."""
    from collections.abc import Iterator

    import pandas as pd

    from afg_data_pipeline_spark.operators.codecs import (
        decode_bmp,
        encode_png,
        synth_bmp_for_text,
    )

    out_schema = (
        "doc_id long, media binary, "
        "meta struct<format:string, width:int, height:int>"
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select("doc_id", text_col).repartition(par)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct

        for pdf in it:
            media = []
            metas = []
            for did, t in zip(pdf["doc_id"], pdf[text_col]):
                bmp = synth_bmp_for_text(t)
                w, h = _struct.unpack_from("<ii", bmp, 18)
                if int(did) % 2 == 1:
                    media.append(encode_png(decode_bmp(bmp)))
                    fmt = "image/png"
                else:
                    media.append(bmp)
                    fmt = "image/bmp"
                metas.append(
                    {"format": fmt, "width": w, "height": abs(h)}
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media": media,
                    "meta": metas,
                }
            )

    return src.mapInPandas(batches, schema=out_schema)


def attach_synth_jpeg(
    df: DataFrame, text_col: str = "text", quality: int = 90
) -> DataFrame:
    """Deterministic REAL baseline-JPEG media column (4:2:0,
    Annex-K tables at ``quality`` — operators/codecs.py). The
    metadata dims are parsed from the SOF0 header the way a real
    ingest sniffs a crawl: marker walk, no pixel decode.

    Unlike attach_synth_bmp's BMP/PNG mix (lossless twins), JPEG
    is lossy — downstream features measure the DECODED pixels, so
    this column exercises the full entropy-coded path:
    quantization, huffman, chroma subsampling, upsampling."""
    from collections.abc import Iterator

    import pandas as pd

    from afg_data_pipeline_spark.operators.codecs import (
        synth_jpeg_for_text,
    )

    out_schema = (
        "doc_id long, media binary, "
        "meta struct<format:string, width:int, height:int>"
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select("doc_id", text_col).repartition(par)

    def _sof0_dims(data: bytes) -> tuple[int, int]:
        import struct as _struct

        pos = 2
        while pos + 4 <= len(data):
            marker = data[pos + 1]
            (seglen,) = _struct.unpack(">H", data[pos + 2 : pos + 4])
            if marker in (0xC0, 0xC1):
                h, w = _struct.unpack(
                    ">HH", data[pos + 5 : pos + 9]
                )
                return w, h
            pos += 2 + seglen
        raise ValueError("JPEG missing SOF0")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            media = [
                synth_jpeg_for_text(t, quality=quality)
                for t in pdf[text_col]
            ]
            metas = []
            for data in media:
                w, h = _sof0_dims(data)
                metas.append(
                    {"format": "image/jpeg", "width": w, "height": h}
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media": media,
                    "meta": metas,
                }
            )

    return src.mapInPandas(batches, schema=out_schema)


def audio_feature_extract(df: DataFrame, n_bands: int = 4) -> DataFrame:
    """REAL audio decode + featurize: WAV bytes -> [duration, rms,
    peak, zcr, band_energy...] via operators/codecs.py, Arrow-batched.

    Output: (doc_id, sample_rate int, n_frames long,
    feature array<double>). Same scale shape as extract_features —
    executor-side batch decode, fixed-width output, media bytes
    never cross a shuffle after this stage."""
    from collections.abc import Iterator

    import pandas as pd

    from afg_data_pipeline_spark.operators.codecs import (
        audio_features,
        decode_wav,
    )

    out_schema = (
        "doc_id long, sample_rate int, n_frames long, "
        "feature array<double>"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, srs, nfs, feats = [], [], [], []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                d = decode_wav(bytes(media))
                ids.append(doc_id)
                srs.append(d["sample_rate"])
                nfs.append(d["n_frames"])
                feats.append(audio_features(d, n_bands=n_bands))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": srs,
                    "n_frames": nfs,
                    "feature": feats,
                }
            )

    return df.select("doc_id", "media").mapInPandas(
        batches, schema=out_schema
    )


def image_feature_extract(df: DataFrame, n_hist: int = 4) -> DataFrame:
    """REAL image decode + featurize: BMP/PPM bytes -> [w, h, aspect,
    channel means, luma stats, luma histogram] via
    operators/codecs.py, Arrow-batched.

    Output: (doc_id, width int, height int, feature array<double>)."""
    from collections.abc import Iterator

    import pandas as pd

    from afg_data_pipeline_spark.operators.codecs import image_features

    out_schema = (
        "doc_id long, width int, height int, feature array<double>"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, ws, hs, feats = [], [], [], []
            for doc_id, media, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["meta"]
            ):
                img = decode_raster(bytes(media), meta["format"])
                ids.append(doc_id)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                feats.append(image_features(img, n_hist=n_hist))
            yield pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs, "feature": feats}
            )

    return df.select("doc_id", "media", "meta").mapInPandas(
        batches, schema=out_schema
    )


def image_resize(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize for decodable rasters: decode -> area/nearest
    resample -> re-encode BMP -> updated meta dims. (resize_stub
    remains for formats whose codec is unavailable.)

    Output schema matches the input media contract, so resize
    composes with image_feature_extract and frame_sample."""
    from collections.abc import Iterator

    import pandas as pd

    from afg_data_pipeline_spark.operators.codecs import (
        encode_bmp,
        resize_area,
    )

    out_schema = (
        "doc_id long, media binary, "
        "meta struct<format:string, width:int, height:int>"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            media_out, metas = [], []
            for media, meta in zip(pdf["media"], pdf["meta"]):
                img = decode_raster(bytes(media), meta["format"])
                media_out.append(encode_bmp(resize_area(img, width, height)))
                metas.append(
                    {"format": "image/bmp", "width": width, "height": height}
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media": media_out,
                    "meta": metas,
                }
            )

    return df.select("doc_id", "media", "meta").mapInPandas(
        batches, schema=out_schema
    )


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


def phash_of_rgb(rgb) -> int:
    """Perceptual hash (pHash) of one (H, W, 3) uint8 array as a
    signed 64-bit int — the image near-dup signature (same DCT
    recipe as the classic pHash: luma -> 32x32 area resample ->
    2-D DCT-II -> sign-vs-median of the top-left 8x8 block minus
    DC). Deterministic pure function of the pixels: integer luma
    (BT.601 fixed-point), integer area sums, float64 DCT — no
    library resampler, so results are pinned by tests/replicas.

    Container-independent by construction: BMP and PNG encodings
    of identical pixels hash identically (asserted in tests)."""
    import numpy as np

    # BT.601 integer luma (fixed-point, exact)
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    luma = (299 * r + 587 * g + 114 * b) // 1000
    h, w = luma.shape
    # 32x32 area resample: cell (i, j) averages the source block
    # rows [i*h//32, (i+1)*h//32) x cols [j*w//32, (j+1)*w//32)
    # (at least one row/col each — exact integer region sums).
    n = 32
    # Integer block sums via a 2-D prefix sum (exact int64; one
    # float division per cell) — bit-identical to the per-block
    # sum/size loop, handles the clamped/overlapping ranges that
    # sub-32px sources produce, ~20x faster than the 1024-block
    # python loop.

    def _bounds(size: int) -> tuple["np.ndarray", "np.ndarray"]:
        bs = [(i * size) // n for i in range(n + 1)]
        starts = np.array(
            [min(bs[i], size - 1) for i in range(n)],
            dtype=np.intp,
        )
        ends = np.array(
            [
                min(max(bs[i + 1], bs[i] + 1), size)
                for i in range(n)
            ],
            dtype=np.intp,
        )
        return starts, ends

    r0, r1 = _bounds(h)
    c0, c1 = _bounds(w)
    s = np.zeros((h + 1, w + 1), dtype=np.int64)
    s[1:, 1:] = luma.cumsum(axis=0).cumsum(axis=1)
    sums = (
        s[r1[:, None], c1[None, :]]
        - s[r0[:, None], c1[None, :]]
        - s[r1[:, None], c0[None, :]]
        + s[r0[:, None], c0[None, :]]
    )
    sizes = (r1 - r0)[:, None] * (c1 - c0)[None, :]
    cells = sums.astype(np.float64) / sizes.astype(np.float64)
    # 2-D DCT-II via the cosine matrix (float64, deterministic)
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2 * k[None, :] + 1)
               * k[:, None] / (2 * n))
    d = m @ cells @ m.T
    block = d[:8, :8].ravel()[1:]  # drop the DC term
    med = float(np.median(block))
    sig = np.uint64(0)
    for i, v in enumerate(block):
        if v > med:
            sig |= np.uint64(1) << np.uint64(i)
    return int(np.int64(sig))


def image_phash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-image perceptual hash: (id, phash long) via one Arrow-
    batched mapInPandas pass over the media column (binary decode
    is the honest pandas-UDF boundary — SURVEY §2.11). Downstream
    near-dup joins band the 64-bit signature exactly like SimHash
    (16-bit bands -> bucket join -> XOR+bit_count verify), so the
    corpus never self-joins all-pairs."""
    from collections.abc import Iterator

    import pandas as pd

    out_schema = f"{id_col} long, phash long"

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            hashes = [
                phash_of_rgb(
                    decode_raster(bytes(data), str(fmt))
                )
                for data, fmt in zip(
                    pdf["media"], pdf["fmt"]
                )
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "phash": hashes}
            )

    src = df.select(
        id_col,
        "media",
        F.col("meta.format").alias("fmt"),
    )
    return src.mapInPandas(batches, schema=out_schema)
