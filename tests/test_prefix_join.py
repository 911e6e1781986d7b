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
