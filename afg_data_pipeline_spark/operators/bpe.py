"""Distributed BPE merge training (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units") — the
tokenizer-training step of an LLM data pipeline, expressed
relationally so a 100 TB corpus can learn merges without ever
funneling through one machine.

Classic BPE trains on the WORD FREQUENCY table, not the corpus:
aggregate words once (Zipf makes this table tiny relative to the
corpus), split each word into character symbols, then repeat:
count adjacent symbol pairs weighted by word frequency, merge the
most frequent pair everywhere, re-count. Each round here is:

1. pair counts: posexplode symbols + a per-word lead() window →
   partial-aggregated Σ freq per (left, right) — one shuffle of
   (pair, partial) rows;
2. best pair: global argmax with (count DESC, left ASC, right ASC)
   tie-break — a 1-row TakeOrderedAndProject, collected like
   PageRank's dangling mass / k-means' centroids (O(1) model
   state per round);
3. merge application, the subtle part: BPE merges LEFT-TO-RIGHT
   NON-OVERLAPPING ("aaaa" + merge (a,a) → [aa, aa], not three
   overlapping pairs). Sequential greediness looks iterative, but
   it is exactly: within each maximal RUN of consecutive matching
   positions, merge the positions at EVEN offsets from the run
   start — a gaps-and-islands window + row-number parity, fully
   relational, no UDFs;
4. rebuild each word's symbol array (ordered collect_list — the
   per-word rebuild pattern of boilerplate_line_dedup).

Every quantity is an integer count with deterministic tie-breaks,
so the DuckDB oracle (merges unrolled as MATERIALIZED CTEs, the
PageRank pattern) reproduces the learned merges bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pair_counts(syms: DataFrame) -> DataFrame:
    """(left, right, n) over the symbol table (word, freq, arr)."""
    w = Window.partitionBy("word").orderBy("pos")
    pairs = (
        syms.select(
            "word",
            "freq",
            F.posexplode("arr").alias("pos", "sym"),
        )
        .withColumn("nxt", F.lead("sym").over(w))
        .filter(F.col("nxt").isNotNull())
    )
    return pairs.groupBy(
        F.col("sym").alias("left"), F.col("nxt").alias("right")
    ).agg(F.sum("freq").alias("n"))


def _apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Merge every left-to-right non-overlapping (left, right)
    occurrence in each word's symbol array."""
    w = Window.partitionBy("word").orderBy("pos")
    toks = syms.select(
        "word", "freq", F.posexplode("arr").alias("pos", "sym")
    ).withColumn("nxt", F.lead("sym").over(w))
    flagged = toks.withColumn(
        "m",
        (
            (F.col("sym") == F.lit(left))
            & (F.col("nxt") == F.lit(right))
        ).cast("int"),
    )
    # islands of consecutive matches: a new island starts where m=1
    # and the previous position was not a match. Within an island,
    # even offsets merge (left-to-right greedy); a position
    # consumed by the previous merge never starts one.
    island = flagged.withColumn(
        "new_island",
        F.when(
            (F.col("m") == 1)
            & (
                F.coalesce(F.lag("m").over(w), F.lit(0))
                == 0
            ),
            1,
        ).otherwise(0),
    ).withColumn(
        "island_id",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    wi = Window.partitionBy("word", "island_id").orderBy("pos")
    marked = island.withColumn(
        "offset",
        F.when(
            F.col("m") == 1, F.row_number().over(wi) - 1
        ),
    ).withColumn(
        "do_merge",
        (
            (F.col("m") == 1)
            & (F.col("offset") % 2 == 0)
        ).cast("int"),
    )
    consumed = marked.withColumn(
        "consumed",
        F.coalesce(F.lag("do_merge").over(w), F.lit(0)),
    )
    rebuilt = (
        consumed.filter(F.col("consumed") == 0)
        .withColumn(
            "out_sym",
            F.when(
                F.col("do_merge") == 1,
                F.concat(F.col("sym"), F.col("nxt")),
            ).otherwise(F.col("sym")),
        )
        .groupBy("word")
        .agg(
            F.max("freq").alias("freq"),
            F.expr(
                "transform(array_sort(collect_list("
                "struct(pos, out_sym))), x -> x.out_sym)"
            ).alias("arr"),
        )
    )
    return rebuilt


def _train(
    docs: DataFrame,
    n_merges: int,
    text_col: str,
) -> tuple[list[tuple], DataFrame]:
    """(learned merges, final symbol table) — shared by the
    train-only and encode entry points."""
    words = (
        docs.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = words.select(
        "word",
        "freq",
        F.split(F.col("word"), "").alias("arr"),
    ).localCheckpoint(eager=True)
    out: list[tuple] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(syms)
            .orderBy(
                F.col("n").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        out.append((rank, b["left"], b["right"], b["n"]))
        syms = _apply_merge(
            syms, b["left"], b["right"]
        ).localCheckpoint(eager=True)
    return out, syms


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus:
    (rank, merge_left, merge_right, pair_count), rank 1-based in
    merge order ("left"/"right" are SQL keywords — avoided).

    The word-frequency table is the only corpus-sized aggregate;
    every round after that works on the (tiny) vocabulary. Ties in
    pair frequency break (left ASC, right ASC) — deterministic and
    mirrored in the oracle.
    """
    out, _syms = _train(docs, n_merges, text_col)
    spark = docs.sparkSession
    return spark.createDataFrame(
        out,
        "rank int, merge_left string, merge_right string, "
        "pair_count long",
    )


def bpe_encode_token_counts(
    docs: DataFrame,
    n_merges: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ENCODE half of the tokenizer story: train ``n_merges``
    merges, then tokenize every document with them — per doc,
    (id, n_words, n_char_tokens, n_bpe_tokens): whitespace words,
    character-level token count (the pre-merge baseline), and the
    subword count after the learned merges. n_bpe_tokens <
    n_char_tokens exactly where merges fired — the compression the
    tokenizer buys, measured on the corpus that trained it.

    Scale shape: encoding is a broadcast join of the corpus word
    stream against the (vocabulary-sized) word → subword-count
    table — the same word table that trained the merges; no
    per-document merge application ever runs.
    """
    _merges, syms = _train(docs, n_merges, text_col)
    lens = syms.select(
        "word", F.size("arr").alias("n_sub")
    )
    doc_words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("word"),
    ).filter(F.length("word") > 0)
    return (
        doc_words.join(F.broadcast(lens), "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word"))
            .cast("bigint")
            .alias("n_char_tokens"),
            F.sum("n_sub").cast("bigint").alias("n_bpe_tokens"),
        )
    )
