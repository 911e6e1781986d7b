"""Unigram-LM subword tokenizer (Kudo 2018, "Subword
Regularization" — the SentencePiece `--model_type=unigram`
algorithm), completing the tokenizer family next to BPE
(operators/bpe.py): where BPE grows a vocabulary bottom-up by
merge rules, unigram starts from a large seed of candidate pieces
and prunes it down under an EM-fitted unigram language model;
encoding is the Viterbi-best segmentation under the final piece
probabilities.

Scale split — identical to the fast BPE trainer:

- The ONLY corpus-sized computation is the (word, freq) aggregate
  (map-side combinable; Zipf keeps the result vocabulary-sized at
  any corpus scale).
- Seeding, EM (forward–backward over each word's segmentation
  lattice), pruning, and per-word Viterbi all run driver-side over
  that collected table — O(Σ|word|² · pieces-per-position) work on
  KB–MB of state, regardless of corpus size.
- Encoding never touches the model: the per-word token-id arrays
  broadcast back and documents rebuild their streams with the
  bpe_tokenize join shape (one broadcast join + ordered per-doc
  aggregate, no UDF on the corpus path).

EM runs in float log-space (log-sum-exp), so unlike BPE's integer
counts there is no SQL-expressible oracle — the registered query
is rows-only BY DESIGN (SURVEY §5.1) and its full output is
value-pinned in tests against an independently-written naive
replica (tests/test_unigram.py), the same strategy as the
multimodal codecs and KNN imputation.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.bpe import _word_freqs

_NEG_INF = float("-inf")


def _seed_pieces(
    vocab: list[tuple[str, int]],
    max_piece_len: int,
    seed_size: int,
) -> dict[str, float]:
    """Seed candidate set: every substring of length ≤
    ``max_piece_len``, scored by frequency-weighted occurrence
    count; the top ``seed_size`` multi-char candidates (count DESC,
    piece ASC — deterministic) plus ALL single characters (the
    coverage floor: any word stays segmentable no matter how hard
    pruning bites). Returns initial log-probs ∝ count."""
    counts: dict[str, int] = defaultdict(int)
    for w, f in vocab:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                counts[w[i : j]] += f
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    kept = {p: counts[p] for p in chars}
    kept.update(dict(multi))
    total = sum(kept.values())
    return {p: math.log(c) - math.log(total) for p, c in kept.items()}


def _em_step(
    vocab: list[tuple[str, int]],
    logp: dict[str, float],
    max_piece_len: int,
) -> tuple[dict[str, float], float]:
    """One E-step: expected piece counts via forward–backward over
    each word's segmentation lattice, plus the corpus
    log-likelihood. Unsegmentable words cannot occur (single chars
    are never pruned)."""
    exp_counts: dict[str, float] = defaultdict(float)
    ll = 0.0
    for w, f in vocab:
        n = len(w)
        alpha = [_NEG_INF] * (n + 1)
        alpha[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - max_piece_len), i):
                lp = logp.get(w[j:i])
                if lp is not None and alpha[j] != _NEG_INF:
                    alpha[i] = _logaddexp(alpha[i], alpha[j] + lp)
        beta = [_NEG_INF] * (n + 1)
        beta[n] = 0.0
        for j in range(n - 1, -1, -1):
            for i in range(j + 1, min(j + max_piece_len, n) + 1):
                lp = logp.get(w[j:i])
                if lp is not None and beta[i] != _NEG_INF:
                    beta[j] = _logaddexp(beta[j], lp + beta[i])
        total = alpha[n]
        ll += f * total
        for j in range(n):
            if alpha[j] == _NEG_INF:
                continue
            for i in range(j + 1, min(j + max_piece_len, n) + 1):
                lp = logp.get(w[j:i])
                if lp is not None and beta[i] != _NEG_INF:
                    exp_counts[w[j:i]] += f * math.exp(
                        alpha[j] + lp + beta[i] - total
                    )
    return exp_counts, ll


def _logaddexp(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def unigram_train(
    vocab: list[tuple[str, int]],
    vocab_size: int = 512,
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_rounds: int = 2,
    shrink: float = 0.75,
) -> dict[str, float]:
    """Train the unigram LM: seed → repeat [EM ×``em_rounds``,
    prune to max(vocab_size, shrink·current) multi-char pieces by
    expected count (DESC, piece ASC)] until ≤ ``vocab_size`` pieces
    remain, then one final EM fit. Single characters are exempt
    from pruning (coverage). Returns piece → log-prob."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1: {vocab_size}")
    if not vocab:
        raise ValueError("empty word-frequency table")
    logp = _seed_pieces(
        vocab, max_piece_len, seed_size or 8 * vocab_size
    )
    n_chars = sum(1 for p in logp if len(p) == 1)

    def _fit(cur: dict[str, float]) -> dict[str, float]:
        for _ in range(em_rounds):
            counts, _ll = _em_step(vocab, cur, max_piece_len)
            total = sum(counts.values())
            nxt = {
                p: math.log(c) - math.log(total)
                for p, c in counts.items()
                if c > 0.0
            }
            # a zero-expectation single char keeps a floor so the
            # coverage guarantee survives (cannot happen when the
            # char occurs in any word, but guard the degenerate)
            for p in cur:
                if len(p) == 1 and p not in nxt:
                    nxt[p] = math.log(1e-12)
            cur = nxt
        return cur

    while True:
        logp = _fit(logp)
        multi = [p for p in logp if len(p) > 1]
        # the alphabet is never pruned: if it alone exceeds
        # vocab_size, the result is the alphabet (SentencePiece
        # hard-errors there; coverage wins here).
        if not multi or n_chars + len(multi) <= vocab_size:
            break
        target_multi = max(vocab_size - n_chars, 0)
        keep = int(shrink * len(multi))
        if keep <= target_multi:
            keep = target_multi
        counts, _ll = _em_step(vocab, logp, max_piece_len)
        ranked = sorted(
            multi, key=lambda p: (-counts.get(p, 0.0), p)
        )[:keep]
        kept = {p for p in logp if len(p) == 1} | set(ranked)
        logp = {p: lp for p, lp in logp.items() if p in kept}
    counts, _ll = _em_step(vocab, logp, max_piece_len)
    total = sum(counts.values())
    return {
        p: (
            math.log(counts[p]) - math.log(total)
            if counts.get(p, 0.0) > 0.0
            else math.log(1e-12)
        )
        for p in logp
    }


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = 8
) -> list[str]:
    """Most-probable segmentation. Deterministic tie-break: at
    equal score the EARLIER start (longer final piece) wins —
    replacement only on strictly greater score while scanning
    starts in ascending order."""
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and best[j] != _NEG_INF:
                cand = best[j] + lp
                if cand > best[i]:
                    best[i] = cand
                    back[i] = j
    if best[n] == _NEG_INF:
        raise ValueError(
            f"unsegmentable word {word!r}: character(s) missing "
            "from the piece set"
        )
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def piece_ids(logp: dict[str, float]) -> dict[str, int]:
    """Deterministic token-id layout: pieces sorted by (log-prob
    DESC, piece ASC) — the SentencePiece convention of
    score-ordered vocab files."""
    ranked = sorted(logp.items(), key=lambda t: (-t[1], t[0]))
    return {p: i for i, (p, _) in enumerate(ranked)}


def unigram_vocab_table(
    docs: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    max_piece_len: int = 8,
    max_vocab_rows: int = 5_000_000,
) -> DataFrame:
    """The trained unigram vocabulary as a table:
    (token, token_id, logprob)."""
    _vocab, logp = _train_from_docs(
        docs, vocab_size, text_col, max_piece_len, max_vocab_rows
    )
    ids = piece_ids(logp)
    return docs.sparkSession.createDataFrame(
        sorted(
            ((p, ids[p], logp[p]) for p in logp),
            key=lambda t: t[1],
        ),
        "token string, token_id int, logprob double",
    )


def _train_from_docs(
    docs, vocab_size, text_col, max_piece_len, max_vocab_rows
) -> tuple[list[tuple[str, int]], dict[str, float]]:
    # limit(bound+1) caps the driver transfer BEFORE the overflow
    # check (the wordpiece/bpe trainer pattern) — len == bound+1
    # still trips the guard below, so semantics are unchanged
    rows = (
        _word_freqs(docs, text_col)
        .limit(max_vocab_rows + 1)
        .collect()
    )
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"vocabulary has {len(rows)} words > max_vocab_rows="
            f"{max_vocab_rows}; raise the bound or pre-filter"
        )
    # deterministic driver iteration order (collect order is not)
    vocab = sorted((r["word"], r["freq"]) for r in rows)
    return vocab, unigram_train(
        vocab, vocab_size=vocab_size, max_piece_len=max_piece_len
    )


def unigram_tokenize(
    docs: DataFrame,
    vocab_size: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
    max_vocab_rows: int = 5_000_000,
) -> DataFrame:
    """Tokenize every document into its unigram TOKEN-ID STREAM —
    (id, token_ids array<int>), the bpe_tokenize contract: the
    driver Viterbi-segments each DISTINCT word once, the per-word
    id arrays broadcast, and documents rebuild their streams with
    one ordered per-doc aggregate."""
    vocab, logp = _train_from_docs(
        docs, vocab_size, text_col, max_piece_len, max_vocab_rows
    )
    ids = piece_ids(logp)
    word_ids = docs.sparkSession.createDataFrame(
        [
            (
                w,
                [
                    ids[p]
                    for p in viterbi_segment(w, logp, max_piece_len)
                ],
            )
            for w, _f in vocab
        ],
        "word string, ids array<int>",
    )
    doc_words = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("wpos", "word"),
    ).filter(F.length("word") > 0)
    return (
        doc_words.join(F.broadcast(word_ids), "word")
        .groupBy("id")
        .agg(
            F.flatten(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(wpos, ids))), x -> x.ids)"
                )
            ).alias("token_ids")
        )
    )
