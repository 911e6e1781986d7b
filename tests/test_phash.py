"""Perceptual-hash image near-dup (operators/multimodal.phash_of_rgb
+ plans/llm_ops.image_phash_near_dup)."""

import math

import numpy as np

from afg_data_pipeline_spark.operators.codecs import (
    decode_bmp,
    encode_png,
    synth_bmp_for_text,
)
from afg_data_pipeline_spark.operators.multimodal import (
    decode_raster,
    phash_of_rgb,
)


def _phash_replica(rgb):
    """Independent scalar-python pHash (no numpy linear algebra):
    pins the operator kernel value-for-value."""
    h = len(rgb)
    w = len(rgb[0])
    luma = [
        [
            (
                299 * int(rgb[y][x][0])
                + 587 * int(rgb[y][x][1])
                + 114 * int(rgb[y][x][2])
            )
            // 1000
            for x in range(w)
        ]
        for y in range(h)
    ]
    n = 32
    rb = [(i * h) // n for i in range(n + 1)]
    cb = [(j * w) // n for j in range(n + 1)]
    cells = [[0.0] * n for _ in range(n)]
    for i in range(n):
        r0, r1 = rb[i], max(rb[i + 1], rb[i] + 1)
        r0, r1 = min(r0, h - 1), min(r1, h)
        for j in range(n):
            c0, c1 = cb[j], max(cb[j + 1], cb[j] + 1)
            c0, c1 = min(c0, w - 1), min(c1, w)
            vals = [
                luma[y][x]
                for y in range(r0, r1)
                for x in range(c0, c1)
            ]
            cells[i][j] = sum(vals) / len(vals)
    # 2-D DCT-II, scalar triple loop (top-left 8x8 only)
    block = []
    for u in range(8):
        for v in range(8):
            if u == 0 and v == 0:
                continue
            s = 0.0
            for y in range(n):
                for x in range(n):
                    s += (
                        cells[y][x]
                        * math.cos(
                            math.pi * (2 * y + 1) * u / (2 * n)
                        )
                        * math.cos(
                            math.pi * (2 * x + 1) * v / (2 * n)
                        )
                    )
            block.append(s)
    srt = sorted(block)
    med = srt[31]  # np.median of 63 values = middle element
    sig = 0
    for i, val in enumerate(block):
        if val > med:
            sig |= 1 << i
    if sig >= 1 << 63:
        sig -= 1 << 64
    return sig


class TestPhashKernel:
    def test_matches_scalar_replica(self):
        for text in ["hello world", "the quick brown fox", "x"]:
            rgb = decode_bmp(synth_bmp_for_text(text))
            got = phash_of_rgb(rgb)
            want = _phash_replica(
                [[list(px) for px in row] for row in rgb]
            )
            # The operator DCT is a BLAS matmul, the replica a
            # scalar triple loop: the summation ORDERS differ, so
            # a coefficient within ulps of the median can flip a
            # bit on a different BLAS build/platform. Pin hamming
            # distance <= 2 rather than bit-exact equality (the
            # near-dup operator's own threshold is <= 10, so a
            # 2-bit platform wobble cannot change pairing).
            ham = bin((got ^ want) & ((1 << 64) - 1)).count("1")
            assert ham <= 2, (text, got, want, ham)

    def test_container_independent(self):
        for text in ["same pixels", "another doc"]:
            bmp = synth_bmp_for_text(text)
            rgb_bmp = decode_raster(bmp, "image/bmp")
            rgb_png = decode_raster(
                encode_png(decode_bmp(bmp)), "image/png"
            )
            assert np.array_equal(rgb_bmp, rgb_png)
            assert phash_of_rgb(rgb_bmp) == phash_of_rgb(rgb_png)

    def test_identical_text_same_hash(self):
        a = phash_of_rgb(decode_bmp(synth_bmp_for_text("dup")))
        b = phash_of_rgb(decode_bmp(synth_bmp_for_text("dup")))
        assert a == b

    def test_signed_64(self):
        h = phash_of_rgb(decode_bmp(synth_bmp_for_text("neg?")))
        assert -(1 << 63) <= h < (1 << 63)


class TestPhashNearDupQuery:
    def test_exact_text_dups_surface_at_hamming_zero(self, spark):
        # plant exact duplicate texts across container parity
        # (doc 2 even -> BMP, doc 3 odd -> PNG, same pixels)
        rows = [
            (0, "alpha beta gamma"),
            (1, "unrelated text entirely"),
            (2, "planted duplicate body"),
            (3, "planted duplicate body"),
            (5, "another unique document"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        from afg_data_pipeline_spark.operators.multimodal import (
            attach_synth_bmp,
            image_phash,
        )

        sigs = image_phash(attach_synth_bmp(docs))
        got = {r.doc_id: r.phash for r in sigs.collect()}
        assert got[2] == got[3]
        # and distinct texts hash apart (md5-seeded gradients)
        assert got[0] != got[1]


class TestPhashQueryLevel:
    def test_registered_query_runs_and_orders_pairs(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY

        rows = REGISTRY["image_phash_near_dup"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        for r in rows:
            assert r.doc_a < r.doc_b
            assert 0 <= r.hamming <= 10


class TestBandedHammingPairs:
    """The shared signature->pairs operator (certified with a full
    SQL oracle via simhash_band_near_dup; pHash rides the same
    code)."""

    def test_pigeonhole_guarantee_and_verify(self, spark):
        from afg_data_pipeline_spark.operators.dedup import (
            banded_hamming_pairs,
        )

        rows = [
            (1, 0x0123456789ABCDEF),
            (2, 0x0123456789ABCDEF),          # identical -> ham 0
            (3, 0x0123456789ABCDEC),          # 2 low bits flipped
            (4, 0x0123456789ABCDEF ^ 0x7),    # ham 3 < n_bands
            (5, -0x7FEDCBA987654321),         # negative sig, far
            # ham 12 from doc 1 (> max_hamming, shares 3 bands):
            (6, 0x0123456789ABCDEF ^ 0xFFF),
        ]
        sigs = spark.createDataFrame(rows, ["doc_id", "sig"])
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in banded_hamming_pairs(
                sigs, "sig", n_bands=4, band_bits=16,
                max_hamming=10,
            ).collect()
        }
        # pigeonhole: hamming < n_bands pairs MUST surface
        assert got[(1, 2)] == 0
        assert got[(1, 3)] == 2
        assert got[(2, 3)] == 2
        assert got[(1, 4)] == 3
        assert got[(3, 4)] == 1
        # candidate found (3 shared bands) but verify-rejected
        assert (1, 6) not in got
        # far signature pairs with nothing
        assert not any(5 in p for p in got)

    def test_band_width_guard(self, spark):
        import pytest as _pytest

        from afg_data_pipeline_spark.operators.dedup import (
            banded_hamming_pairs,
        )

        sigs = spark.createDataFrame([(1, 0)], ["doc_id", "sig"])
        with _pytest.raises(ValueError):
            banded_hamming_pairs(
                sigs, "sig", n_bands=5, band_bits=16
            )
