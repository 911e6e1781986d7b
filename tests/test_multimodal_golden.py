"""Value-level golden checks for the rows-only multimodal queries.

The driver's harness records these five queries rows-only (DuckDB
cannot decode RIFF/BMP/PNG/JPEG bytes), which round 4's verdict
called the residual risk of the multimodal surface. This module is
the compensating exact check: every registered multimodal query's
FULL output frame is compared cell-for-cell against a plain-Python
replica computed directly from the documents table — same codec
functions, but none of the Spark plumbing (mapInPandas batching,
Arrow transfer, struct columns, row expansion) the queries are
meant to exercise. Bit-exact float comparison: both sides do the
same IEEE-754 double ops in the same order.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pd():
    return (
        pq.read_table(
            os.path.join(SF_DIR, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _mixed_raster(doc_id: int, text: str):
    """attach_synth_bmp's container mix: even ids BMP, odd ids PNG
    of the identical pixels."""
    from afg_data_pipeline_spark.operators.codecs import (
        decode_bmp,
        encode_png,
        synth_bmp_for_text,
    )

    bmp = synth_bmp_for_text(text)
    if int(doc_id) % 2 == 1:
        return encode_png(decode_bmp(bmp)), "image/png"
    return bmp, "image/bmp"


def _rows_by_id(df):
    out = {}
    for r in df.collect():
        key = (
            (r["doc_id"], r["frame_idx"])
            if "frame_idx" in r.__fields__
            else r["doc_id"]
        )
        assert key not in out, f"duplicate output row {key}"
        out[key] = r
    return out


def _assert_cells(got, want, key):
    assert len(got) == len(want), (len(got), len(want))
    for name, w in want.items():
        g = got[name]
        if isinstance(w, float):
            assert (
                g == w
                or (math.isnan(g) and math.isnan(w))
            ), (key, name, g, w)
        else:
            assert g == w, (key, name, g, w)


class TestMultimodalGolden:
    def test_multimodal_features(self, spark, docs_pd):
        from afg_data_pipeline_spark.operators.multimodal import (
            decode_raster,
        )
        from afg_data_pipeline_spark.plans import REGISTRY

        got = _rows_by_id(
            REGISTRY["multimodal_features"].fn(spark, SF_DIR)
        )
        assert len(got) == len(docs_pd)
        for _, row in docs_pd.iterrows():
            media, fmt = _mixed_raster(row.doc_id, row.text)
            raw = decode_raster(media, fmt).tobytes()
            arr = np.frombuffer(raw, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=8, range=(0, 256))
            feat = (hist / hist.sum()).astype(float).tolist()
            # Spark computes sqrt of the left-fold sum of squares
            # seeded with 0.0 — replicate the fold order exactly.
            acc = 0.0
            for f in feat:
                acc = acc + f * f
            _assert_cells(
                got[row.doc_id],
                {
                    "doc_id": row.doc_id,
                    "feature_dim": 8,
                    "feature_norm": math.sqrt(acc),
                    "feature_0": feat[0],
                },
                row.doc_id,
            )

    def test_multimodal_frame_sample(self, spark, docs_pd):
        from afg_data_pipeline_spark.operators.multimodal import (
            decode_raster,
        )
        from afg_data_pipeline_spark.plans import REGISTRY

        got = _rows_by_id(
            REGISTRY["multimodal_frame_sample"].fn(spark, SF_DIR)
        )
        assert len(got) == 4 * len(docs_pd)
        import hashlib

        for _, row in docs_pd.iterrows():
            media, fmt = _mixed_raster(row.doc_id, row.text)
            raw = decode_raster(media, fmt).tobytes()
            n = len(raw)
            for i in range(4):
                frame = raw[n * i // 4 : n * (i + 1) // 4]
                _assert_cells(
                    got[(row.doc_id, i)],
                    {
                        "doc_id": row.doc_id,
                        "frame_idx": i,
                        "frame_ts": i / 1.0,
                        # registered query exposes the driver-safe
                        # md5/length projection of the frame bytes
                        "frame_md5": hashlib.md5(frame).hexdigest(),
                        "frame_bytes": len(frame),
                    },
                    (row.doc_id, i),
                )

    def test_multimodal_audio_features(self, spark, docs_pd):
        from afg_data_pipeline_spark.operators.codecs import (
            audio_features,
            decode_wav,
            synth_wav_for_text,
        )
        from afg_data_pipeline_spark.plans import REGISTRY

        got = _rows_by_id(
            REGISTRY["multimodal_audio_features"].fn(spark, SF_DIR)
        )
        assert len(got) == len(docs_pd)
        for _, row in docs_pd.iterrows():
            dec = decode_wav(synth_wav_for_text(row.text))
            feat = audio_features(dec, n_bands=4)
            _assert_cells(
                got[row.doc_id],
                {
                    "doc_id": row.doc_id,
                    "sample_rate": dec["sample_rate"],
                    "n_frames": dec["n_frames"],
                    "duration_s": feat[0],
                    "rms": feat[1],
                    "peak": feat[2],
                    "zcr": feat[3],
                },
                row.doc_id,
            )

    @staticmethod
    def _image_cells(doc_id, img):
        from afg_data_pipeline_spark.operators.codecs import (
            image_features,
        )

        feat = image_features(img, n_hist=4)
        return {
            "doc_id": doc_id,
            "width": img.shape[1],
            "height": img.shape[0],
            "mean_r": feat[3],
            "mean_g": feat[4],
            "mean_b": feat[5],
            "luma_mean": feat[6],
            "luma_std": feat[7],
        }

    def test_multimodal_image_pipeline(self, spark, docs_pd):
        from afg_data_pipeline_spark.operators.codecs import (
            decode_bmp,
            encode_bmp,
            resize_area,
        )
        from afg_data_pipeline_spark.operators.multimodal import (
            decode_raster,
        )
        from afg_data_pipeline_spark.plans import REGISTRY

        got = _rows_by_id(
            REGISTRY["multimodal_image_pipeline"].fn(spark, SF_DIR)
        )
        assert len(got) == len(docs_pd)
        for _, row in docs_pd.iterrows():
            media, fmt = _mixed_raster(row.doc_id, row.text)
            resized = decode_bmp(
                encode_bmp(
                    resize_area(decode_raster(media, fmt), 8, 8)
                )
            )
            _assert_cells(
                got[row.doc_id],
                self._image_cells(row.doc_id, resized),
                row.doc_id,
            )

    def test_multimodal_jpeg_pipeline(self, spark, docs_pd):
        from afg_data_pipeline_spark.operators.codecs import (
            decode_jpeg,
            synth_jpeg_for_text,
        )
        from afg_data_pipeline_spark.plans import REGISTRY

        got = _rows_by_id(
            REGISTRY["multimodal_jpeg_pipeline"].fn(spark, SF_DIR)
        )
        assert len(got) == len(docs_pd)
        for _, row in docs_pd.iterrows():
            img = decode_jpeg(synth_jpeg_for_text(row.text))
            _assert_cells(
                got[row.doc_id],
                self._image_cells(row.doc_id, img),
                row.doc_id,
            )
