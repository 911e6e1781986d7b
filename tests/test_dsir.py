"""DSIR importance scores: python-replica exactness + the semantic
property the operator exists for (target-like docs outscore
off-target docs)."""

from __future__ import annotations

import hashlib
import math

from afg_data_pipeline_spark.operators.dsir import dsir_scores


def _replica(rows, target_rows, n=2, n_hex=2):
    """Plain-python DSIR replica (same md5-prefix buckets, same
    Laplace smoothing, same 1e-9 ln snap, same exact integer sum)."""
    B = 16**n_hex

    def grams(text):
        t = text.strip().split()
        return [
            hashlib.md5(
                " ".join(t[i : i + n]).encode()
            ).hexdigest()[:n_hex]
            for i in range(len(t) - n + 1)
        ]

    raw_counts: dict[str, int] = {}
    doc_counts: dict[int, dict[str, int]] = {}
    for doc_id, text in rows:
        d: dict[str, int] = {}
        for b in grams(text):
            d[b] = d.get(b, 0) + 1
            raw_counts[b] = raw_counts.get(b, 0) + 1
        doc_counts[doc_id] = d
    tgt_counts: dict[str, int] = {}
    for _, text in target_rows:
        for b in grams(text):
            tgt_counts[b] = tgt_counts.get(b, 0) + 1
    rt = sum(raw_counts.values())
    tt = sum(tgt_counts.values())
    lrq = {}
    for i in range(B):
        b = format(i, f"0{n_hex}x")
        lr = math.log(
            (tgt_counts.get(b, 0) + 1) / (tt + B)
        ) - math.log((raw_counts.get(b, 0) + 1) / (rt + B))
        # float(round()) of the scaled double — same as the
        # engines' round-half-away + BIGINT cast for these values.
        v = lr * 1e9
        lrq[b] = int(math.floor(v + 0.5)) if v >= 0 else int(
            math.ceil(v - 0.5)
        )
    out = {}
    for doc_id, d in doc_counts.items():
        sq = sum(c * lrq[b] for b, c in d.items())
        out[doc_id] = (sum(d.values()), float(sq) / 1e9)
    return out


class TestDsir:
    ROWS = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox runs past the sleepy cat"),
        (3, "zzq qqz zqz qzq zzq qqz zqz qzq zzq qqz"),
        (4, "aaa bbb ccc ddd eee fff ggg hhh iii jjj"),
        (5, "short"),  # < 2 tokens: no grams, score 0
        (6, "the lazy dog naps under the brown fox tree"),
    ]
    TARGET_IDS = {1, 2, 6}

    def _frames(self, spark):
        raw = spark.createDataFrame(
            self.ROWS, "doc_id long, text string"
        )
        target = raw.filter(
            raw.doc_id.isin(*self.TARGET_IDS)
        )
        return raw, target

    def test_matches_python_replica_bitexact(self, spark):
        raw, target = self._frames(spark)
        got = {
            r.doc_id: (r.n_grams, r.score)
            for r in dsir_scores(raw, target).collect()
        }
        # Subset-target mode (single corpus pass) must produce the
        # IDENTICAL frame: same buckets, same smoothing, same snap.
        from pyspark.sql import functions as F

        got_cond = {
            r.doc_id: (r.n_grams, r.score)
            for r in dsir_scores(
                raw,
                target_cond=F.col("doc_id").isin(
                    *self.TARGET_IDS
                ),
            ).collect()
        }
        assert got_cond == got
        want = _replica(
            self.ROWS,
            [r for r in self.ROWS if r[0] in self.TARGET_IDS],
        )
        want[5] = (0, 0.0)  # no-gram doc survives with zero score
        assert set(got) == set(r[0] for r in self.ROWS)
        for doc_id, (ng, sc) in want.items():
            assert got[doc_id][0] == ng, doc_id
            assert got[doc_id][1] == sc, (
                doc_id,
                got[doc_id][1],
                sc,
            )

    def test_target_like_docs_outscore_off_target(self, spark):
        raw, target = self._frames(spark)
        got = {
            r.doc_id: r.score
            for r in dsir_scores(raw, target).collect()
        }
        # Every target-vocabulary doc must outscore every
        # disjoint-vocabulary doc (per-gram normalization: compare
        # mean per-gram score to remove length effects).
        ng = {
            r.doc_id: r.n_grams
            for r in dsir_scores(raw, target).collect()
        }
        per_gram = {
            d: got[d] / ng[d] for d in got if ng[d] > 0
        }
        for tgt in (1, 2, 6):
            for off in (3, 4):
                assert per_gram[tgt] > per_gram[off], (
                    tgt,
                    off,
                    per_gram,
                )

    def test_short_doc_scores_zero(self, spark):
        raw, target = self._frames(spark)
        row = {
            r.doc_id: r
            for r in dsir_scores(raw, target).collect()
        }[5]
        assert (row.n_grams, row.score) == (0, 0.0)


class TestDsirEdges:
    def test_empty_target_cond_is_defined(self, spark):
        # No target docs: tc=0 everywhere, Laplace keeps every
        # bucket probability positive — scores are finite and the
        # frame is complete.
        from pyspark.sql import functions as F

        raw = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
            "doc_id long, text string",
        )
        out = dsir_scores(
            raw, target_cond=F.lit(False)
        ).collect()
        assert {r.doc_id for r in out} == {1, 2}
        assert all(
            r.score == r.score for r in out
        )  # no NaN

    def test_all_short_docs(self, spark):
        raw = spark.createDataFrame(
            [(1, "one"), (2, "two")], "doc_id long, text string"
        )
        out = dsir_scores(
            raw, target_cond=raw.doc_id == 1
        ).collect()
        assert {(r.doc_id, r.n_grams, r.score) for r in out} == {
            (1, 0, 0.0),
            (2, 0, 0.0),
        }
