"""Cross-family tokenizer-fertility consistency (VERDICT r9 #6):
the oracle-checked families (whitespace/BPE/WordPiece) and the
rows-only unigram family must agree on corpus invariants — same
docs/words/chars/bytes per language, subword token counts at least
the word count, and the ratios internally consistent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def report(spark):
    rows = (
        REGISTRY["tokenizer_fertility_families"]
        .fn(spark, SF)
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r["family"], {})[r["lang"]] = r
    return by


class TestCrossFamilyConsistency:
    def test_families_present(self, report):
        assert set(report) == {"whitespace", "bpe", "wordpiece"}

    def test_corpus_constants_identical(self, report):
        """docs / words / chars / bytes are corpus facts — every
        family must report the same per-language values."""
        langs = set(report["whitespace"])
        for fam in ("bpe", "wordpiece"):
            assert set(report[fam]) == langs
            for lg in langs:
                a, b = report["whitespace"][lg], report[fam][lg]
                for c in ("n_docs", "n_words", "n_chars", "n_bytes"):
                    assert a[c] == b[c], (fam, lg, c)

    def test_subword_fertility_at_least_one(self, report):
        """A subword tokenizer never merges across words: token
        count per language >= word count (fertility >= 1)."""
        for fam in ("bpe", "wordpiece"):
            for lg, r in report[fam].items():
                assert r["n_tokens"] >= r["n_words"], (fam, lg)
                assert r["fertility"] >= 1.0

    def test_ratios_consistent(self, report):
        for fam, per in report.items():
            for lg, r in per.items():
                assert r["fertility"] == pytest.approx(
                    r["n_tokens"] / r["n_words"]
                )
                assert r["chars_per_token"] == pytest.approx(
                    r["n_chars"] / r["n_tokens"]
                )
                assert r["bytes_per_token"] == pytest.approx(
                    r["n_bytes"] / r["n_tokens"]
                )

    def test_unigram_family_consistent(self, spark, report):
        """The rows-only unigram family (float EM — no SQL oracle
        by design) computed the same way from unigram_tokenize's
        output must land in the same invariant envelope."""
        docs = read_star_table(spark, "documents", SF)
        uni = (
            REGISTRY["unigram_tokenize"]
            .fn(spark, SF)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("token_ids") == "", F.lit(0))
                .otherwise(
                    F.size(F.split(F.col("token_ids"), " "))
                )
                .cast("bigint")
                .alias("n_tok"),
            )
        )
        per = {
            r["lang"]: r
            for r in docs.select("doc_id", "lang")
            .join(uni, "doc_id", "left")
            .groupBy("lang")
            .agg(
                F.sum(F.coalesce(F.col("n_tok"), F.lit(0)))
                .cast("bigint")
                .alias("n_tokens")
            )
            .collect()
        }
        for lg, ws in report["whitespace"].items():
            assert lg in per
            # unigram pieces are per-word subword segmentations:
            # at least one token per word, at most one per char
            assert per[lg]["n_tokens"] >= ws["n_words"], lg
            assert per[lg]["n_tokens"] <= ws["n_chars"], lg
