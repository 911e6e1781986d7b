"""containment_pairs operator tests: the quote-in-page scenario
Jaccard misses, a brute-force python replica on a pseudorandom
corpus, duplicate-group expansion, the min_grams floor, and the
announced rare-gram fallback tier."""

from __future__ import annotations

import random

from afg_data_pipeline_spark.operators.dedup import (
    containment_pairs,
)

TNUM, TDEN = 4, 5
MIN_GRAMS = 5


def _grams(text, k=2):
    t = text.split()
    if len(t) < k:
        return {" ".join(t)}
    return {
        " ".join(t[i : i + k]) for i in range(len(t) - k + 1)
    }


def _brute(docs):
    """All directed pairs with containment >= 4/5, |Sa| >= 5."""
    sets = {d: _grams(t) for d, t in docs}
    out = {}
    for a, sa in sets.items():
        if len(sa) < MIN_GRAMS:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if inter * TDEN >= len(sa) * TNUM:
                out[(a, b)] = (inter, len(sa), len(sb))
    return out


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = containment_pairs(df, **kw).collect()
    return {
        (r["id_a"], r["id_b"]): (
            r["n_shared"],
            r["size_a"],
            r["size_b"],
        )
        for r in rows
    }, {r["tier"] for r in rows}


QUOTE = "the quick brown fox jumps over the lazy dog today"


class TestContainment:
    def test_quote_in_page_found_directed(self, spark):
        page = (
            "intro words here . "
            + QUOTE
            + " . closing remarks of a much longer page with many "
            "other distinct tokens one two three four five six"
        )
        docs = [(1, QUOTE), (2, page), (3, "unrelated text body")]
        got, tiers = _run(spark, docs)
        assert got == _brute(docs)
        assert (1, 2) in got  # quote contained in page
        assert (2, 1) not in got  # page not contained in quote
        # Jaccard would be far below the dedup bar for this pair:
        inter, sa, sb = got[(1, 2)]
        assert inter == sa  # full containment
        assert inter / (sa + sb - inter) < 0.5
        assert tiers == {"exact"}

    def test_pseudorandom_matches_bruteforce(self, spark):
        rnd = random.Random(11)
        vocab = [f"w{i}" for i in range(40)]
        docs = []
        for i in range(30):
            n = rnd.randrange(3, 25)
            docs.append(
                (i, " ".join(rnd.choice(vocab) for _ in range(n)))
            )
        # plant a quote relation
        docs.append((100, QUOTE))
        docs.append((101, docs[5][1] + " " + QUOTE))
        got, _ = _run(spark, docs)
        assert got == _brute(docs)

    def test_duplicate_group_expands_both_directions(self, spark):
        docs = [(1, QUOTE), (2, QUOTE), (3, "other thing here")]
        got, _ = _run(spark, docs)
        assert (1, 2) in got and (2, 1) in got
        n, sa, sb = got[(1, 2)]
        assert n == sa == sb

    def test_min_grams_floor(self, spark):
        # 3 tokens -> 2 bigrams < 5: never a contained side
        docs = [(1, "tiny doc here"), (2, "tiny doc here plus " + QUOTE)]
        got, _ = _run(spark, docs)
        assert all(a != 1 for (a, _b) in got)

    def test_fallback_tier_announced_and_verified(self, spark):
        # 20 boilerplate variants make the shared shingles hot
        # (df=20) while the quote pair's shingles stay rare (df=2):
        # the adaptive df cap keeps the rare buckets, so the quote
        # pair survives the fallback while the hot boilerplate
        # cross-pairs are the (documented) recall loss.
        page = "lead in . " + QUOTE + " . trailing tail tokens"
        boiler = "alpha beta gamma delta epsilon zeta eta theta"
        docs = [(1, QUOTE), (2, page)] + [
            (100 + i, f"{boiler} uniq{i}") for i in range(20)
        ]
        want = _brute(docs)
        got, tiers = _run(spark, docs, max_cand=100)
        assert tiers == {"rare_gram_subset"}
        # every emitted pair is exactly verified...
        assert set(got) <= set(want)
        assert all(got[k] == want[k] for k in got)
        # ...the rare-gram quote pair survives the cap...
        assert (1, 2) in got
        # ...and the hot boilerplate pairs are the recall loss
        assert len(got) < len(want)
