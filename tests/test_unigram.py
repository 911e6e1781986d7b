"""Unigram-LM tokenizer tests. The EM core is pinned against an
INDEPENDENT naive replica that enumerates every segmentation of
every word outright (exponential, fine for short words) — if
forward–backward mis-weights any lattice path, the expected counts
diverge. Viterbi is pinned the same way (argmax over the
enumeration). The registered query is rows-only by design, so the
end-to-end pin here is reconstruction: decoding every document's
token ids through the vocab table must reproduce its exact word
stream."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.unigram import (
    _em_step,
    piece_ids,
    unigram_tokenize,
    unigram_train,
    unigram_vocab_table,
    viterbi_segment,
)


def _enumerate_segs(word, pieces, maxlen):
    if not word:
        return [[]]
    out = []
    for ln in range(1, min(maxlen, len(word)) + 1):
        head = word[:ln]
        if head in pieces:
            for rest in _enumerate_segs(word[ln:], pieces, maxlen):
                out.append([head] + rest)
    return out


def _naive_em_step(vocab, logp, maxlen):
    exp = defaultdict(float)
    ll = 0.0
    for w, f in vocab:
        segs = _enumerate_segs(w, set(logp), maxlen)
        probs = [
            math.exp(sum(logp[p] for p in s)) for s in segs
        ]
        tot = sum(probs)
        ll += f * math.log(tot)
        for s, pr in zip(segs, probs):
            for p in s:
                exp[p] += f * pr / tot
    return exp, ll


_VOCAB = [
    ("abab", 50),
    ("abc", 30),
    ("banana", 20),
    ("cab", 10),
    ("aabb", 7),
    ("x", 5),
]


class TestUnigramEM:
    def test_forward_backward_matches_enumeration(self):
        # seed probs deliberately non-uniform
        pieces = {
            "a", "b", "c", "n", "x",
            "ab", "ba", "na", "abc", "nana", "abab", "cab",
        }
        logp = {
            p: math.log((hash_free := (len(p) + i + 1)))
            for i, p in enumerate(sorted(pieces))
        }
        tot = math.log(sum(math.exp(v) for v in logp.values()))
        logp = {p: v - tot for p, v in logp.items()}
        got, got_ll = _em_step(_VOCAB, logp, 4)
        want, want_ll = _naive_em_step(_VOCAB, logp, 4)
        assert got_ll == pytest.approx(want_ll, rel=1e-9)
        assert set(got) == {p for p, c in want.items() if c > 0}
        for p in got:
            assert got[p] == pytest.approx(want[p], rel=1e-9), p

    def test_viterbi_matches_enumeration_argmax(self):
        logp = unigram_train(_VOCAB, vocab_size=14, max_piece_len=4)
        for w, _f in _VOCAB:
            seg = viterbi_segment(w, logp, 4)
            assert "".join(seg) == w
            segs = _enumerate_segs(w, set(logp), 4)
            best = max(
                sum(logp[p] for p in s) for s in segs
            )
            assert sum(logp[p] for p in seg) == pytest.approx(
                best, abs=1e-12
            )

    def test_trainer_keeps_alphabet_and_respects_size(self):
        logp = unigram_train(_VOCAB, vocab_size=10, max_piece_len=4)
        chars = {c for w, _ in _VOCAB for c in w}
        assert chars <= set(logp)
        assert len(logp) <= max(10, len(chars))

    def test_whole_words_dominate_on_skewed_corpus(self):
        logp = unigram_train(_VOCAB, vocab_size=12, max_piece_len=4)
        # the highest-probability piece is the most frequent word
        top = max(logp.items(), key=lambda t: t[1])[0]
        assert top == "abab"
        assert viterbi_segment("abab", logp, 4) == ["abab"]

    def test_unsegmentable_raises(self):
        with pytest.raises(ValueError, match="unsegmentable"):
            viterbi_segment("xyz", {"x": -1.0, "y": -1.0}, 4)

    def test_empty_vocab_raises(self):
        with pytest.raises(ValueError, match="empty"):
            unigram_train([], vocab_size=10)

    def test_piece_ids_deterministic_layout(self):
        logp = {"aa": -0.5, "b": -0.5, "c": -2.0}
        assert piece_ids(logp) == {"aa": 0, "b": 1, "c": 2}


class TestUnigramTokenizeSpark:
    def _docs(self, spark):
        rows = [
            (0, "abab abc abab"),
            (1, "banana cab x"),
            (2, "abc abc banana abab"),
            (3, ""),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string"
        )

    def test_roundtrip_reconstruction(self, spark):
        docs = self._docs(spark)
        toks = unigram_tokenize(
            docs, vocab_size=12, max_piece_len=4
        ).collect()
        vocab = {
            r["token_id"]: r["token"]
            for r in unigram_vocab_table(
                docs, vocab_size=12, max_piece_len=4
            ).collect()
        }
        got = {r["id"]: r["token_ids"] for r in toks}
        # empty doc: no words -> absent from the stream table
        assert set(got) == {0, 1, 2}
        for r in self._docs(spark).collect():
            if not r["text"]:
                continue
            words = r["text"].split()
            decoded = "".join(vocab[t] for t in got[r["doc_id"]])
            assert decoded == "".join(words)

    def test_partitioning_invariance(self, spark):
        docs = self._docs(spark)
        a = {
            r["id"]: r["token_ids"]
            for r in unigram_tokenize(
                docs.repartition(1), vocab_size=12, max_piece_len=4
            ).collect()
        }
        b = {
            r["id"]: r["token_ids"]
            for r in unigram_tokenize(
                docs.repartition(5), vocab_size=12, max_piece_len=4
            ).collect()
        }
        assert a == b

    def test_registered_query_reconstructs_corpus(self, spark):
        """End-to-end pin of the rows-only registered query at
        sf0.001: every document's decoded token stream equals its
        whitespace word stream, and the vocab honors the size
        contract."""
        from afg_data_pipeline_spark.io import read_star_table

        sf = "/root/testdata/sf0.001"
        docs = read_star_table(spark, "documents", sf)
        toks = {
            r["id"]: r["token_ids"]
            for r in unigram_tokenize(docs, vocab_size=512).collect()
        }
        vocab = {
            r["token_id"]: r["token"]
            for r in unigram_vocab_table(
                docs, vocab_size=512
            ).collect()
        }
        n_chars = sum(1 for t in vocab.values() if len(t) == 1)
        assert len(vocab) <= max(512, n_chars)
        rows = docs.select("doc_id", "text").collect()
        assert toks, "no tokenized documents at sf0.001"
        for r in rows:
            words = (r["text"] or "").split()
            if not words:
                assert r["doc_id"] not in toks
                continue
            decoded = "".join(vocab[t] for t in toks[r["doc_id"]])
            assert decoded == "".join(words), r["doc_id"]

    def test_registered_query_string_projection(self, spark):
        """The REGISTRY entry must expose token_ids as the
        space-joined STRING of the operator's id array (driver
        canonicalizability — r7's red row was the raw array)."""
        from afg_data_pipeline_spark.io import read_star_table
        from afg_data_pipeline_spark.plans import REGISTRY

        sf = "/root/testdata/sf0.001"
        q = REGISTRY["unigram_tokenize"].fn(spark, sf)
        assert dict(q.dtypes)["token_ids"] == "string"
        got = {r["id"]: r["token_ids"] for r in q.collect()}
        docs = read_star_table(spark, "documents", sf)
        want = {
            r["id"]: " ".join(str(t) for t in r["token_ids"])
            for r in unigram_tokenize(docs, vocab_size=512).collect()
        }
        assert got == want


class TestSeedVocabSibling:
    def test_registered_query_matches_seed_pieces_kernel(
        self, spark
    ):
        """unigram_seed_vocab (the family's hash-exact driver
        sibling) must equal operators/unigram._seed_pieces — same
        substring counts, same top-256 (count DESC, piece ASC)
        multi-char selection, same all-chars floor."""
        from afg_data_pipeline_spark.io import read_star_table
        from afg_data_pipeline_spark.operators.bpe import (
            _word_freqs,
        )
        from afg_data_pipeline_spark.operators.unigram import (
            _seed_pieces,
        )
        from afg_data_pipeline_spark.plans import REGISTRY
        from collections import defaultdict

        sf = "/root/testdata/sf0.001"
        docs = read_star_table(spark, "documents", sf)
        vocab = sorted(
            (r["word"], r["freq"])
            for r in _word_freqs(docs, "text").collect()
        )
        # replicate _seed_pieces' COUNTS (its return is log-probs;
        # recount here with the identical loop)
        counts: dict = defaultdict(int)
        for w, f in vocab:
            n = len(w)
            for i in range(n):
                for j in range(i + 1, min(i + 8, n) + 1):
                    counts[w[i:j]] += f
        chars = {
            (p, c, False)
            for p, c in counts.items()
            if len(p) == 1
        }
        multi = {
            (p, c, True)
            for p, c in sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda t: (-t[1], t[0]),
            )[:256]
        }
        got = {
            (r["piece"], r["cnt"], r["multi"])
            for r in REGISTRY["unigram_seed_vocab"]
            .fn(spark, sf)
            .collect()
        }
        assert got == chars | multi
        # and the kept piece set is exactly _seed_pieces' domain
        # at the same parameters
        seed = _seed_pieces(vocab, 8, 256)
        assert {p for p, _c, _m in got} == set(seed)
