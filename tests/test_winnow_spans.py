"""duplicate_span_extract + winnow_fingerprints: python-replica
pins of the interval-merge and winnowing selection logic, plus the
winnowing guarantee (shared >= k+w-1-token substring -> shared
fingerprint)."""

from __future__ import annotations

import hashlib

from afg_data_pipeline_spark.operators.dedup import (
    duplicate_span_extract,
    winnow_fingerprints,
)

DOCS_SCHEMA = "doc_id long, text string"


def _brute_spans(rows, k=5):
    """Reference: positions of corpus-duplicated k-grams, merged."""
    from collections import Counter

    gram_count: Counter = Counter()
    per_doc = {}
    for did, text in rows:
        toks = text.strip().split()
        grams = [
            " ".join(toks[i : i + k])
            for i in range(len(toks) - k + 1)
        ]
        per_doc[did] = grams
        gram_count.update(grams)
    out = []
    for did, grams in per_doc.items():
        dup_pos = [
            i + 1
            for i, g in enumerate(grams)
            if gram_count[g] >= 2
        ]
        cur: list[int] = []
        for p in dup_pos:
            if cur and p <= cur[-1] + k:
                cur.append(p)
            else:
                if cur:
                    e = cur[-1] + k - 1
                    out.append((did, cur[0], e, e - cur[0] + 1))
                cur = [p]
        if cur:
            e = cur[-1] + k - 1
            out.append((did, cur[0], e, e - cur[0] + 1))
    return sorted(out)


def _brute_winnow(rows, k=4, w=5):
    out = set()
    for did, text in rows:
        toks = text.strip().split()
        grams = [
            hashlib.md5(
                " ".join(toks[i : i + k]).encode()
            ).hexdigest()
            for i in range(len(toks) - k + 1)
        ]
        if not grams:
            continue
        if len(grams) < w:
            out.add((did, min(grams)))
            continue
        for p in range(w - 1, len(grams)):
            out.add((did, min(grams[p - w + 1 : p + 1])))
    return sorted(out)


class TestDuplicateSpanExtract:
    ROWS = [
        (1, "a b c d e f g h i j unique one tail x y z w q r s"),
        (2, "a b c d e f g h i j other two tail2 p q r s t u v"),
        (3, "totally different words with no overlap at all here now"),
        (4, "short doc"),
    ]

    def test_matches_brute_force(self, spark):
        df = spark.createDataFrame(self.ROWS, DOCS_SCHEMA)
        got = sorted(
            (r.id, r.span_start, r.span_end, r.n_span_tokens)
            for r in duplicate_span_extract(df, k=5).collect()
        )
        assert got == _brute_spans(self.ROWS, k=5)
        # the planted shared 10-token prefix must surface as one
        # merged span [1, 10] in docs 1 and 2
        assert (1, 1, 10, 10) in got
        assert (2, 1, 10, 10) in got
        assert not any(r[0] in (3, 4) for r in got)

    def test_adjacent_spans_merge(self, spark):
        # two duplicated regions separated by exactly k tokens of
        # unique glue must NOT merge; by k-1 they must.
        shared_a = "alpha beta gamma delta epsilon"
        shared_b = "zeta eta theta iota kappa"
        rows = [
            (1, f"{shared_a} u1 u2 u3 u4 u5 {shared_b}"),
            (2, f"{shared_a} v1 v2 v3 v4 v5 {shared_b}"),
            (3, f"{shared_a} w1 {shared_b} filler filler2 filler3"),
            (4, f"{shared_a} x1 {shared_b} pad1 pad2 pad3 pad4"),
        ]
        df = spark.createDataFrame(rows, DOCS_SCHEMA)
        got = sorted(
            (r.id, r.span_start, r.span_end)
            for r in duplicate_span_extract(df, k=5).collect()
        )
        assert got == [
            (r[0], r[1], r[2]) for r in _brute_spans(rows, k=5)
        ]


class TestWinnowFingerprints:
    ROWS = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "prefix words here the quick brown fox jumps over the lazy dog behind"),
        (3, "completely unrelated tokens without any common substring present"),
        (4, "tiny doc only"),          # < k tokens -> no grams
        (5, "five tokens exactly here now"),  # 2 grams < w
    ]

    def test_matches_brute_force(self, spark):
        df = spark.createDataFrame(self.ROWS, DOCS_SCHEMA)
        got = sorted(
            (r.id, r.fp)
            for r in winnow_fingerprints(df, k=4, w=5).collect()
        )
        assert got == _brute_winnow(self.ROWS, k=4, w=5)

    def test_guarantee_shared_long_substring_shares_fp(self, spark):
        # docs 1 and 2 share a 9-token substring >= k+w-1 = 8 ->
        # guaranteed common fingerprint despite different offsets.
        df = spark.createDataFrame(self.ROWS, DOCS_SCHEMA)
        fps = {}
        for r in winnow_fingerprints(df, k=4, w=5).collect():
            fps.setdefault(r.id, set()).add(r.fp)
        assert fps[1] & fps[2]
        assert not (fps.get(3, set()) & fps[1])

    def test_short_docs_keep_one_fingerprint(self, spark):
        df = spark.createDataFrame(self.ROWS, DOCS_SCHEMA)
        fps = {}
        for r in winnow_fingerprints(df, k=4, w=5).collect():
            fps.setdefault(r.id, set()).add(r.fp)
        assert 4 not in fps          # no 4-gram at all
        assert len(fps[5]) == 1      # global min of its 2 grams


class TestWinnowCandidatePairs:
    def test_copied_passage_found_at_any_offset(self, spark):
        from afg_data_pipeline_spark.operators.dedup import (
            winnow_candidate_pairs,
        )

        passage = (
            "one two three four five six seven eight nine ten "
            "eleven twelve"
        )
        rows = [
            (1, f"{passage} tail tokens here alpha beta gamma"),
            (2, f"unrelated lead-in words go first {passage}"),
            (3, "no shared content at all in this document body x"),
            (4, "another fully distinct set of tokens right here y"),
        ]
        df = spark.createDataFrame(rows, DOCS_SCHEMA)
        got = {
            (r.id_a, r.id_b): r.n_shared_fps
            for r in winnow_candidate_pairs(
                df, k=4, w=5, min_shared=2
            ).collect()
        }
        assert (1, 2) in got
        assert got[(1, 2)] >= 2
        assert all(p == (1, 2) for p in got)

    def test_hot_fingerprint_cap_drops_boilerplate(self, spark):
        from afg_data_pipeline_spark.operators.dedup import (
            winnow_candidate_pairs,
        )

        boiler = [
            (
                100 + i,
                "all rights reserved terms of service apply "
                "to this content always",
            )
            for i in range(30)
        ]
        pair = [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "intro alpha beta gamma delta epsilon zeta eta theta"),
        ]
        df = spark.createDataFrame(boiler + pair, DOCS_SCHEMA)
        capped = {
            (r.id_a, r.id_b)
            for r in winnow_candidate_pairs(
                df, k=4, w=5, min_shared=1, max_fp_docs=10
            ).collect()
        }
        assert (1, 2) in capped
        assert not any(a >= 100 and b >= 100 for a, b in capped)
