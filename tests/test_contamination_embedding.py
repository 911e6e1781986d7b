"""Planted-paraphrase test for the embedding-space contamination
audit (VERDICT r9 #4): an eval example whose training twin is a
PARAPHRASE — zero shared word 3-grams, near-identical embedding —
must be invisible to n-gram decontamination and flagged by the
embedding audit.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.dedup import decontaminate
from afg_data_pipeline_spark.operators.similarity import (
    embedding_contamination_report,
)

_DIM = 16


def _unit(seed: int) -> list[float]:
    """Deterministic pseudo-random unit vector (no RNG)."""
    raw = [
        math.sin(0.7 * seed + 1.3 * i + 0.1) for i in range(_DIM)
    ]
    n = math.sqrt(sum(x * x for x in raw))
    return [x / n for x in raw]


def _perturb(v: list[float], eps: float) -> list[float]:
    raw = [x + eps * ((i % 3) - 1) for i, x in enumerate(v)]
    n = math.sqrt(sum(x * x for x in raw))
    return [x / n for x in raw]


class TestPlantedParaphrase:
    def _frames(self, spark):
        # eval doc 0 is a PARAPHRASE of train doc 100: reworded
        # text (no shared 3-gram), almost-identical embedding.
        eval_rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "completely unrelated musings about tax policy"),
        ]
        base = _unit(42)
        train_rows = [
            (
                100,
                "a speedy russet fox leaps above an idle hound",
                _perturb(base, 0.01),
            ),
            (101, "grain futures commentary for the week", _unit(7)),
            (102, "recipe for lentil soup with cumin", _unit(8)),
            (103, "notes on medieval castle architecture", _unit(9)),
        ]
        eval_docs = spark.createDataFrame(
            [
                (i, t, "evalset", [float(x) for x in emb])
                for (i, t), emb in zip(
                    eval_rows, [base, _unit(5)]
                )
            ],
            "vec_id long, text string, eval_set string, "
            "embedding array<float>",
        )
        train_docs = spark.createDataFrame(
            [
                (i, t, [float(x) for x in emb])
                for i, t, emb in train_rows
            ],
            "vec_id long, text string, embedding array<float>",
        )
        return eval_docs, train_docs

    def test_ngram_decontamination_misses_paraphrase(self, spark):
        eval_docs, train_docs = self._frames(spark)
        flagged = decontaminate(
            train_docs.select(
                F.col("vec_id").alias("doc_id"), "text"
            ),
            eval_docs.select(
                F.col("vec_id").alias("doc_id"), "text"
            ),
            n=3,
        ).collect()
        # the paraphrase shares no word trigram: n-gram pass is blind
        assert flagged == []

    def test_embedding_audit_catches_paraphrase(self, spark):
        eval_docs, train_docs = self._frames(spark)
        rows = embedding_contamination_report(
            eval_docs,
            train_docs,
            set_col="eval_set",
            threshold=0.95,
            cand_k=3,
            dim=_DIM,
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["eval_set"] == "evalset"
        assert r["n_eval"] == 2
        # exactly the planted paraphrase is contaminated
        assert r["n_contaminated"] == 1
        assert abs(r["frac_contaminated"] - 0.5) < 1e-12
        assert r["max_cosine"] > 0.99
        assert r["threshold"] == 0.95

    def test_uncontaminated_below_threshold(self, spark):
        """The non-planted eval doc's best train cosine is far from
        the planted one's (sanity that the flag is the vector, not
        the machinery)."""
        eval_docs, train_docs = self._frames(spark)
        from afg_data_pipeline_spark.operators.similarity import (
            binary_hamming_topk,
            exact_rerank_topk,
        )

        cand = binary_hamming_topk(
            eval_docs, train_docs, k=3, dim=_DIM, radius_cut=True
        )
        vectors = eval_docs.select(
            "vec_id", "embedding"
        ).unionByName(train_docs.select("vec_id", "embedding"))
        best = {
            r["query_id"]: r["cosine"]
            for r in exact_rerank_topk(cand, vectors, k=1).collect()
        }
        assert best[0] > 0.99
        assert best[1] < 0.95
