"""Tests for the round-3 corpus-preparation operators: bigram LM
scoring, PMI (both collocation and document-co-occurrence forms),
character entropy, sliding chunking, and hash-based splits.

The registered queries are oracle-checked by test_correctness;
these pin the semantics on crafted inputs where the expected
values are hand-derivable.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.lm import (
    bigram_lm_nll,
    bigram_pmi,
)
from afg_data_pipeline_spark.operators.sampling import hash_split
from afg_data_pipeline_spark.operators.text import (
    char_entropy_profile,
    chunk_documents,
)
from afg_data_pipeline_spark.operators.tfidf import pmi_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBigramLm:
    def test_matches_local_reference(self, spark):
        rows = [
            (1, "a b a b c"),
            (2, "a b c d"),
            (3, "x y"),
        ]
        # local reference
        toks = {i: t.split() for i, t in rows}
        from collections import Counter

        uni = Counter(t for ts in toks.values() for t in ts)
        n = sum(uni.values())
        big = Counter(
            (ts[j], ts[j + 1])
            for ts in toks.values()
            for j in range(len(ts) - 1)
        )
        lam = 0.75
        want = {}
        for i, ts in toks.items():
            if len(ts) < 2:
                continue
            nlls = [
                -math.log(
                    lam * big[(ts[j], ts[j + 1])] / uni[ts[j]]
                    + (1 - lam) * uni[ts[j + 1]] / n
                )
                for j in range(len(ts) - 1)
            ]
            want[i] = (len(nlls), sum(nlls) / len(nlls))

        got = {
            r.id: (r.n_bigrams, r.avg_nll)
            for r in bigram_lm_nll(_docs(spark, rows)).collect()
        }
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0]
            # decimal(18,6) accumulation quantizes each addend to
            # 1e-6 before the mean
            assert got[i][1] == pytest.approx(
                want[i][1], abs=2e-6
            )

    def test_single_token_docs_absent(self, spark):
        rows = [(1, "solo"), (2, "a b")]
        got = bigram_lm_nll(_docs(spark, rows)).collect()
        assert {r.id for r in got} == {2}


class TestBigramPmi:
    def test_known_counts(self, spark):
        # "of the" 3×, tokens: of=3, the=3, N=10
        rows = [
            (1, "of the of the"),
            (2, "of the x y z w"),
        ]
        got = {
            (r.term_a, r.term_b): (r.n_pair, r.pmi)
            for r in bigram_pmi(
                _docs(spark, rows), min_count=3
            ).collect()
        }
        assert set(got) == {("of", "the")}
        n_pair, pmi = got[("of", "the")]
        assert n_pair == 3
        assert pmi == pytest.approx(
            math.log(10 * 3 / (3 * 3)), abs=2e-9
        )

    def test_min_count_filters(self, spark):
        rows = [(1, "a b c d e")]
        assert (
            bigram_pmi(_docs(spark, rows), min_count=2).count()
            == 0
        )


class TestDocPmiPairs:
    def test_doc_cooccurrence(self, spark):
        # u,v co-occur in docs 1,2 (df(u)=df(v)=2, both docs)
        rows = [
            (1, "u v filler1"),
            (2, "u v filler2"),
            (3, "u w"),  # df(u)=3 > max_df=2 -> u pruned? no: 3
            (4, "v z"),  # df(v)=3
        ]
        # with max_df=10, min_df=2: df(u)=3, df(v)=3, c_ab=2
        got = {
            (r.term_a, r.term_b): (r.n_docs_both, r.pmi)
            for r in pmi_pairs(
                _docs(spark, rows),
                min_df=2,
                max_df=10,
                min_pair_count=2,
            ).collect()
        }
        assert ("u", "v") in got
        n_both, pmi = got[("u", "v")]
        assert n_both == 2
        # pmi is snapped to the 1e-9 grid (rule 1c — ln differs by
        # 1 ulp across engines); expect the snapped value exactly.
        assert pmi == round(math.log(4 * 2 / (3 * 3)) * 1e9) / 1e9
        # singleton fillers pruned by min_df -> no pair with them
        assert all(
            a in ("u", "v", "w", "z") and b in ("u", "v", "w", "z")
            for a, b in got
        )


class TestCharEntropy:
    def test_known_entropies(self, spark):
        rows = [
            (1, "aaaa"),  # H = 0
            (2, "abab"),  # H = 1 bit
            (3, "abcd"),  # H = 2 bits
        ]
        got = {
            r.id: (r.n_chars_counted, r.entropy)
            for r in char_entropy_profile(
                _docs(spark, rows)
            ).collect()
        }
        assert got[1] == (4, pytest.approx(0.0, abs=1e-8))
        assert got[2] == (4, pytest.approx(1.0, abs=1e-8))
        assert got[3] == (4, pytest.approx(2.0, abs=1e-8))

    def test_spaces_counted(self, spark):
        rows = [(1, "a a")]  # a:2, space:1, n=3
        got = char_entropy_profile(_docs(spark, rows)).collect()
        n = 3
        want = -(2 / n) * math.log2(2 / n) - (1 / n) * math.log2(
            1 / n
        )
        assert got[0].n_chars_counted == 3
        assert got[0].entropy == pytest.approx(want, abs=1e-8)


class TestChunking:
    def test_short_doc_single_chunk(self, spark):
        rows = [(1, "short text")]
        got = chunk_documents(
            _docs(spark, rows), size=200, stride=150
        ).collect()
        assert len(got) == 1
        assert got[0].chunk_idx == 0
        assert got[0].chunk_text == "short text"
        assert got[0].n_chunk_chars == 10

    def test_cover_and_overlap(self, spark):
        text = "".join(chr(ord("a") + i % 26) for i in range(370))
        rows = [(1, text)]
        got = sorted(
            chunk_documents(
                _docs(spark, rows), size=200, stride=150
            ).collect(),
            key=lambda r: r.chunk_idx,
        )
        # starts 0, 150, 300 -> 3 chunks (k_max = ceil(170/150)=2)
        assert [r.chunk_idx for r in got] == [0, 1, 2]
        assert got[0].chunk_text == text[0:200]
        assert got[1].chunk_text == text[150:350]
        assert got[2].chunk_text == text[300:370]
        # full coverage: every char index falls in some chunk
        covered = set()
        for r in got:
            start = r.chunk_idx * 150
            covered.update(range(start, start + r.n_chunk_chars))
        assert covered == set(range(370))

    def test_exact_fit_no_extra_chunk(self, spark):
        rows = [(1, "x" * 200)]
        got = chunk_documents(
            _docs(spark, rows), size=200, stride=150
        ).collect()
        assert len(got) == 1

    def test_bad_params_raise(self, spark):
        with pytest.raises(ValueError):
            chunk_documents(_docs(spark, [(1, "t")]), size=0)


class TestHashSplit:
    def test_partition_of_ids_and_determinism(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        out = hash_split(df, "doc_id", train=0.8, val=0.1)
        counts = {
            r.split: r.c
            for r in out.groupBy("split")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        assert sum(counts.values()) == 2000
        # ~80/10/10 within generous tolerance
        assert 1500 < counts["train"] < 1700
        assert 130 < counts["val"] < 270
        assert 130 < counts["test"] < 270
        # retry-stable: same assignment on re-evaluation
        a = {r.doc_id: r.split for r in out.collect()}
        b = {r.doc_id: r.split for r in out.collect()}
        assert a == b

    def test_salt_decorrelates(self, spark):
        df = spark.range(500).withColumnRenamed("id", "doc_id")
        s1 = {
            r.doc_id: r.split
            for r in hash_split(df, "doc_id", salt="s1").collect()
        }
        s2 = {
            r.doc_id: r.split
            for r in hash_split(df, "doc_id", salt="s2").collect()
        }
        assert s1 != s2

    def test_bad_fractions_raise(self, spark):
        df = spark.range(10).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError):
            hash_split(df, "doc_id", train=0.9, val=0.2)


class TestVocabOov:
    def test_known_oov(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY  # noqa: F401

        # direct operator-shape check on crafted docs via the same
        # construction the query uses, with a tiny vocab
        from afg_data_pipeline_spark.operators import text as TX

        rows = [(1, "a a b zz"), (2, "a b")]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string"
        )
        toks = docs.select(
            "doc_id", F.explode(TX.tokens("text")).alias("tok")
        )
        vocab = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("tok").asc())
            .limit(2)
            .select("tok", F.lit(1).alias("__in_vocab"))
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_oov)
            for r in toks.join(
                F.broadcast(vocab), "tok", "left"
            )
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_tokens"),
                F.count(
                    F.when(
                        F.col("__in_vocab").isNull(), F.lit(1)
                    )
                ).alias("n_oov"),
            )
            .collect()
        }
        # vocab = {a (3), b (2)}; zz is OOV
        assert got == {1: (4, 1), 2: (2, 0)}

    def test_vocab_selection_is_take_ordered(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY
        from tests.conftest import SF_DIR

        df = REGISTRY["vocab_oov_rate"].fn(spark, SF_DIR)
        plan = (
            df._jdf.queryExecution().executedPlan().toString()
        )
        # top-k vocabulary must be per-task partial top-k, never a
        # partitionless global window
        assert "TakeOrderedAndProject" in plan


class TestValueHourCorrelation:
    def test_matches_numpy(self, spark):
        import numpy as np

        from afg_data_pipeline_spark.plans import REGISTRY
        from tests.conftest import SF_DIR

        got = {
            r.event_type: (r.n, r.corr_value_hour)
            for r in REGISTRY["value_hour_correlation"]
            .fn(spark, SF_DIR)
            .collect()
        }
        from afg_data_pipeline_spark.io import read_star_table

        ev = (
            read_star_table(spark, "events", SF_DIR)
            .select(
                "event_type",
                F.round(F.col("value") * 100, 0)
                .cast("bigint")
                .alias("x"),
                F.hour("ts").alias("y"),
            )
            .collect()
        )
        by_type = {}
        for r in ev:
            by_type.setdefault(r.event_type, []).append(
                (r.x, r.y)
            )
        for et, pts in by_type.items():
            xs = np.array([p[0] for p in pts], dtype=float)
            ys = np.array([p[1] for p in pts], dtype=float)
            n, corr = got[et]
            assert n == len(pts)
            if xs.std() == 0 or ys.std() == 0:
                assert corr is None
            else:
                assert corr == pytest.approx(
                    float(np.corrcoef(xs, ys)[0, 1]), abs=1e-9
                )


class TestTrigramLm:
    def test_matches_local_reference(self, spark):
        from collections import Counter

        from afg_data_pipeline_spark.operators.lm import (
            trigram_lm_nll,
        )

        rows = [
            (1, "a b a b a b c"),
            (2, "a b c a b c"),
            (3, "x y"),  # < 3 tokens -> absent
        ]
        toks = {i: t.split() for i, t in rows}
        uni = Counter(t for ts in toks.values() for t in ts)
        n = sum(uni.values())
        tri = Counter(
            (ts[j], ts[j + 1], ts[j + 2])
            for ts in toks.values()
            for j in range(len(ts) - 2)
        )
        bi = Counter(
            (ts[j], ts[j + 1])
            for ts in toks.values()
            for j in range(len(ts) - 1)
        )
        bictx = Counter()
        for (a, _), c in bi.items():
            bictx[a] += c
        want = {}
        for i, ts in toks.items():
            if len(ts) < 3:
                continue
            nlls = []
            for j in range(len(ts) - 2):
                t2, t1, t = ts[j], ts[j + 1], ts[j + 2]
                p = (
                    0.5 * tri[(t2, t1, t)] / bi[(t2, t1)]
                    + 0.3 * bi[(t1, t)] / bictx[t1]
                    + (1.0 - 0.5 - 0.3) * uni[t] / n
                )
                nlls.append(-math.log(p))
            want[i] = (len(nlls), sum(nlls) / len(nlls))
        got = {
            r.id: (r.n_trigrams, r.avg_nll)
            for r in trigram_lm_nll(
                _docs(spark, rows), l3=0.5, l2=0.3
            ).collect()
        }
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0]
            assert got[i][1] == pytest.approx(
                want[i][1], abs=2e-6
            )

    def test_bad_lambdas_raise(self, spark):
        from afg_data_pipeline_spark.operators.lm import (
            trigram_lm_nll,
        )

        with pytest.raises(ValueError):
            trigram_lm_nll(
                _docs(spark, [(1, "a b c")]), l3=0.8, l2=0.3
            )


class TestContentDefinedChunks:
    def test_offset_robust_chunk_identity(self, spark):
        """The CDC property: a shared region chunks identically
        regardless of what precedes it — after an inserted prefix,
        all interior chunk digests of the shared region must still
        appear. Fixed-size chunking would shift every boundary."""
        from afg_data_pipeline_spark.operators.text import (
            content_defined_chunks,
        )

        import hashlib

        shared = " ".join(
            hashlib.md5(f"w{i}".encode()).hexdigest()[:6]
            for i in range(120)
        )
        rows = [
            (1, shared),
            (2, "an inserted unrelated prefix of seven tokens " + shared),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = content_defined_chunks(df, k=3, divisor=8).collect()
        d1 = {r.chunk_digest for r in out if r.id == 1}
        d2 = {r.chunk_digest for r in out if r.id == 2}
        # every chunk of doc 1 except possibly its first (whose
        # start is the doc boundary, not a content boundary) must
        # reappear verbatim in doc 2
        first1 = min(
            (r.chunk_idx, r.chunk_digest)
            for r in out
            if r.id == 1
        )[1]
        assert (d1 - {first1}) <= d2
        assert len(d1) > 3  # the region actually chunked

    def test_chunks_partition_the_document(self, spark):
        from afg_data_pipeline_spark.operators.text import (
            content_defined_chunks,
        )

        rows = [(1, "a b c d e f g h i j k l m n o p q r s t")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = content_defined_chunks(df, k=3, divisor=8).collect()
        assert sum(r.n_chunk_tokens for r in out) == 20
        idxs = sorted(r.chunk_idx for r in out)
        assert idxs == list(range(len(idxs)))


class TestBpeTrainMerges:
    def _replica(self, texts, n_merges):
        from collections import Counter

        freq = Counter(
            w for t in texts for w in t.strip().split() if w
        )
        syms = {w: list(w) for w in freq}
        merges = []
        for rank in range(1, n_merges + 1):
            pairs: Counter = Counter()
            for w, s in syms.items():
                for i in range(len(s) - 1):
                    pairs[(s[i], s[i + 1])] += freq[w]
            if not pairs:
                break
            best = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0])
            )
            (a, b), n = best
            merges.append((rank, a, b, n))
            for w, s in syms.items():
                out, i = [], 0
                while i < len(s):
                    if (
                        i + 1 < len(s)
                        and s[i] == a
                        and s[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        return merges

    def test_matches_python_replica(self, spark):
        from afg_data_pipeline_spark.operators.bpe import (
            bpe_train_merges,
        )

        texts = [
            "low lower lowest low low",
            "new newer newest new",
            "aaaa aaaa baaa",
        ]
        df = _docs(spark, list(enumerate(texts)))
        got = sorted(
            (r.rank, r.merge_left, r.merge_right, r.pair_count)
            for r in bpe_train_merges(df, n_merges=4).collect()
        )
        assert got == self._replica(texts, 4)

    def test_greedy_non_overlapping(self, spark):
        # "aaaa" with merge (a,a): left-to-right gives [aa, aa] —
        # the second round must then see the (aa, aa) pair.
        from afg_data_pipeline_spark.operators.bpe import (
            bpe_train_merges,
        )

        df = _docs(spark, [(1, "aaaa aaaa aaaa")])
        got = {
            r.rank: (r.merge_left, r.merge_right, r.pair_count)
            for r in bpe_train_merges(df, n_merges=2).collect()
        }
        # round 1: (a,a) appears 3 overlapping times per word x3
        assert got[1] == ("a", "a", 9)
        # after greedy merge each word is [aa, aa]
        assert got[2] == ("aa", "aa", 3)

    def test_encode_compression(self, spark):
        from afg_data_pipeline_spark.operators.bpe import (
            bpe_encode_token_counts,
            bpe_train_merges,
        )

        texts = ["low low lower lowest", "new newer newest"]
        df = _docs(spark, list(enumerate(texts)))
        got = {
            r.id: (r.n_words, r.n_char_tokens, r.n_bpe_tokens)
            for r in bpe_encode_token_counts(
                df, n_merges=3
            ).collect()
        }
        # every doc covered, words/chars exact, and merges strictly
        # compress (the corpus has repeated 'lo'/'ow'-class pairs)
        for i, t in enumerate(texts):
            words = t.split()
            assert got[i][0] == len(words)
            assert got[i][1] == sum(len(w) for w in words)
            assert got[i][2] < got[i][1]
        # 3 merges => each word shrinks by at most 3 per merge site;
        # replica check: apply the learned merges by hand
        merges = [
            (r.merge_left, r.merge_right)
            for r in bpe_train_merges(df, n_merges=3)
            .orderBy("rank")
            .collect()
        ]
        def encode(w):
            s = list(w)
            for a, b in merges:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i+1] == b:
                        out.append(a + b); i += 2
                    else:
                        out.append(s[i]); i += 1
                s = out
            return len(s)
        for i, t in enumerate(texts):
            assert got[i][2] == sum(encode(w) for w in t.split())


class TestHashTopkPerGroup:
    def test_exact_k_deterministic_and_reservoir_property(
        self, spark
    ):
        import hashlib

        from afg_data_pipeline_spark.operators.sampling import (
            hash_topk_per_group,
        )

        rows = [
            (i, "a" if i < 60 else "b") for i in range(80)
        ]
        df = spark.createDataFrame(rows, "doc_id long, g string")
        got = hash_topk_per_group(df, "g", "doc_id", 5).collect()
        by_g: dict = {}
        for r in got:
            by_g.setdefault(r.g, set()).add(r.doc_id)
        assert len(by_g["a"]) == 5 and len(by_g["b"]) == 5
        # replica: 5 smallest md5('ksample:'||id) per group
        for g, ids in (
            ("a", range(60)),
            ("b", range(60, 80)),
        ):
            want = set(
                sorted(
                    ids,
                    key=lambda i: hashlib.md5(
                        f"ksample:{i}".encode()
                    ).hexdigest(),
                )[:5]
            )
            assert by_g[g] == want, g
        # reservoir property: sampling the group's superset keeps
        # any member of the old sample iff it survives the hash
        # order against the new rows — subset consistency
        small = {
            r.doc_id
            for r in hash_topk_per_group(
                df.filter("doc_id < 30"), "g", "doc_id", 5
            ).collect()
        }
        assert by_g["a"] & small == by_g["a"] & set(range(30))

    def test_small_groups_returned_whole(self, spark):
        from afg_data_pipeline_spark.operators.sampling import (
            hash_topk_per_group,
        )

        df = spark.createDataFrame(
            [(1, "x"), (2, "x")], "doc_id long, g string"
        )
        assert (
            hash_topk_per_group(df, "g", "doc_id", 10).count() == 2
        )
