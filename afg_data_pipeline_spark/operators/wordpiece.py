"""WordPiece tokenizer (Schuster–Nakajima / BERT) — completes the
tokenizer family next to BPE (operators/bpe.py) and the unigram LM
(operators/unigram.py). Two halves, split exactly like fast BPE:

- TRAIN: one map-side-combinable (word, freq) corpus aggregate
  (Zipf keeps it vocabulary-sized at any corpus scale), collected
  and trained driver-side. WordPiece differs from BPE only in the
  merge objective: argmax of score(a,b) = count(ab) /
  (count(a)·count(b)) — the pair whose merge most increases corpus
  likelihood under a unigram model — instead of raw pair count.
  Scores are compared as EXACT integer cross-products (never
  floats), ties break on the (left, right) pair lexicographically,
  so training is bit-deterministic.
- ENCODE: greedy longest-match-first per word against the trained
  piece set (word-initial pieces plain, continuations '##'-
  prefixed, the BERT convention); a word with any unmatchable
  position encodes to the single [UNK] piece. Encoding touches
  only DISTINCT words (aggregate first), with the piece set a
  plain broadcast — the corpus never sees python row-at-a-time
  work beyond one Arrow-batched pass over the distinct-word table.

No SQL oracle is expressible for the likelihood-ratio argmax
(rows-only by design, like unigram_tokenize); tests pin an
independent python replica of both halves plus the published
greedy-matching semantics (word-initial vs ## pieces, UNK,
longest-match-first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"


def _join_pieces(left: str, right: str) -> str:
    """Merge two adjacent pieces: '##'-continuation of the right
    piece is absorbed ('a' + '##b' -> 'ab'; '##a' + '##b' ->
    '##ab')."""
    return left + (right[2:] if right.startswith("##") else right)


def _word_symbols(word: str) -> list[str]:
    """BERT symbol split: first char plain, rest '##'-prefixed."""
    return [word[0]] + ["##" + ch for ch in word[1:]]


def train_wordpiece_driver(
    vocab: list[tuple[str, int]], n_merges: int
) -> tuple[list[tuple], set[str]]:
    """Train up to ``n_merges`` WordPiece merges over a collected
    (word, freq) vocabulary. Returns (merges, piece set); merges
    are (rank, left, right, pair_count, left_count, right_count)
    so the argmax is auditable.

    Each round recomputes pair and unigram counts from the current
    symbol arrays (vocabulary-sized work) and picks the pair
    maximizing count(ab)/(count(a)count(b)) by exact integer
    cross-multiplication; the score denominator uses the CURRENT
    round's unigram counts, the published WordPiece objective.
    """
    from collections import defaultdict

    arrs = {w: _word_symbols(w) for w, _ in vocab}
    freqs = dict(vocab)
    merges: list[tuple] = []
    pieces: set[str] = set()
    for a in arrs.values():
        pieces.update(a)
    for rank in range(1, n_merges + 1):
        pair_n: dict[tuple[str, str], int] = defaultdict(int)
        sym_n: dict[str, int] = defaultdict(int)
        for w, a in arrs.items():
            f = freqs[w]
            for s in a:
                sym_n[s] += f
            for p in zip(a, a[1:]):
                pair_n[p] += f
        best = None  # (cnt, l_n, r_n, left, right)
        for (lft, rgt), n in pair_n.items():
            ln, rn = sym_n[lft], sym_n[rgt]
            if best is None:
                best = (n, ln, rn, lft, rgt)
                continue
            bn, bl, br, blft, brgt = best
            # n/(ln*rn) vs bn/(bl*br): exact cross-products
            lhs = n * bl * br
            rhs = bn * ln * rn
            if lhs > rhs or (
                lhs == rhs and (lft, rgt) < (blft, brgt)
            ):
                best = (n, ln, rn, lft, rgt)
        if best is None or best[0] < 2:
            break  # nothing merge-worthy (singleton pairs stay)
        n, ln, rn, lft, rgt = best
        merged = _join_pieces(lft, rgt)
        merges.append((rank, lft, rgt, n, ln, rn))
        pieces.add(merged)
        for w, a in list(arrs.items()):
            out: list[str] = []
            i = 0
            while i < len(a):
                if (
                    i + 1 < len(a)
                    and a[i] == lft
                    and a[i + 1] == rgt
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(a[i])
                    i += 1
            arrs[w] = out
    return merges, pieces


def encode_word(
    word: str, pieces: set[str], max_word_len: int = 100
) -> list[str]:
    """Greedy longest-match-first WordPiece encode of one word;
    [UNK] when any position has no matching piece (or the word
    exceeds ``max_word_len``, the BERT guard)."""
    if not word or len(word) > max_word_len:
        return [UNK]
    out: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in pieces:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        out.append(cur)
        start = end
    return out


def word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) corpus aggregate — identical contract to
    operators/bpe._word_freqs (kept separate so the two tokenizer
    modules stay independently readable)."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def wordpiece_encode_stats(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab_rows: int = 2_000_000,
) -> DataFrame:
    """Per-document WordPiece encode statistics: (id, n_words,
    n_pieces, n_unk). Train on the corpus's own word table, then
    encode only DISTINCT words (Arrow-batched, piece set broadcast)
    and join the per-word result back to per-(doc, word) counts —
    the fast-BPE scale split, documents never see python work.

    ``max_vocab_rows`` guards the driver collect: the word table is
    vocabulary-sized by Zipf, and the bound makes the assumption
    explicit instead of silently OOMing the driver."""
    from collections.abc import Iterator

    import pandas as pd

    wf = word_freqs(docs, text_col).localCheckpoint(eager=False)
    rows = wf.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"word vocabulary exceeds max_vocab_rows="
            f"{max_vocab_rows}; raise the bound deliberately"
        )
    vocab = sorted((r["word"], r["freq"]) for r in rows)
    _, pieces = train_wordpiece_driver(vocab, n_merges)
    spark = docs.sparkSession
    pieces_b = spark.sparkContext.broadcast(pieces)

    def batches(
        it: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        ps = pieces_b.value
        for pdf in it:
            enc = [encode_word(w, ps) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"].values,
                    "w_pieces": [len(e) for e in enc],
                    "w_unk": [
                        1 if e == [UNK] else 0 for e in enc
                    ],
                }
            )

    enc = wf.select("word").mapInPandas(
        batches, schema="word string, w_pieces int, w_unk int"
    )
    doc_words = (
        docs.select(
            id_col,
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word"),
        )
        .filter(F.length("word") > 0)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        doc_words.join(F.broadcast(enc), "word")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("w_pieces"))
            .cast("bigint")
            .alias("n_pieces"),
            F.sum(F.col("cnt") * F.col("w_unk"))
            .cast("bigint")
            .alias("n_unk"),
        )
    )


def wordpiece_train_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    max_vocab_rows: int = 2_000_000,
) -> DataFrame:
    """The learned WordPiece merges as a table: (rank, merge_left,
    merge_right, pair_count, left_count, right_count) — the full
    auditable argmax record, so the likelihood-ratio objective
    score(a,b) = count(ab)/(count(a)·count(b)) is externally
    checkable by exact integer cross-multiplication. Training is
    driver-side over the vocabulary-sized word table (the fast-BPE
    split); the collect is bound-checked BEFORE materializing."""
    wf = word_freqs(docs, text_col)
    rows = wf.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"word vocabulary exceeds max_vocab_rows="
            f"{max_vocab_rows}; raise the bound deliberately"
        )
    vocab = sorted((r["word"], r["freq"]) for r in rows)
    merges, _pieces = train_wordpiece_driver(vocab, n_merges)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges,
        "rank int, merge_left string, merge_right string, "
        "pair_count long, left_count long, right_count long",
    )
