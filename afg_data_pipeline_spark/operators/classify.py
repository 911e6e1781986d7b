"""Multinomial Naive Bayes text classification — the quality/domain
classifier of a training-data pipeline (a fastText-style corpus
filter: train per-class token statistics, score every document,
keep/route by predicted class), built engine-portably exact.

The reference has no ML classifier; this extends its text surface
the way a 100 TB curation pipeline needs (CCNet/fastText-style
source filtering). Design:

- TRAIN is two map-side-combinable aggregates over the exploded
  token stream: per-(class, token) counts and (derived from them)
  per-class token totals + the global vocabulary size. The model
  is vocabulary-sized — tiny relative to any corpus.
- SCORE is one token-keyed join of the test corpus's (doc, token,
  count) aggregate against the model (the per-class branch is a
  broadcast of |classes| rows), one per-(doc, class) sum, and one
  per-doc argmax via min(struct(...)) — groupBy, never a window
  (CLAUDE.md rule 19: map-side combine applies).
- EXACTNESS: each Laplace-smoothed log-likelihood term
  ln((n_tc+1)/(T_c+V)) is an irrational double — quantized ONCE to
  the 1e9 integer grid (rule 1c) so per-document accumulation is
  exact integer arithmetic, order-free and identical across
  engines; the final reported score is the one correctly-rounded
  double division score_q/1e9. Accumulation is DECIMAL(38,0): the
  per-document bound (tokens × 1e10-scale terms) is not provably
  under 2^63 for arbitrary corpora (rule 11).

Tokens in a scored document that never occur in the training
vocabulary are ignored (standard OOV handling); tokens in the
vocabulary but unseen for a class contribute the class's smoothing
floor ln(1/(T_c+V)) — realised via COALESCE after a left join, so
no dense classes×vocab grid is ever materialised.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID = 1_000_000_000  # rule-1c ln() quantization grid (1e9)

# NB/AUC integer accumulations use DECIMAL(38,0) explicitly — NOT
# functions/numeric.dsum_expr, whose DECIMAL(18,6) bounds |values|
# under 1e12: a single high-multiplicity token's cnt·term_q
# (~1e3·2e10) or an AUC U-term (n_pos_v·2·cum_neg at millions of
# rows per class) exceeds that at realistic corpus sizes and would
# ARITHMETIC_OVERFLOW under the driver's ANSI-on session (rule 11).
_D38 = "decimal(38,0)"


def _q(x: Column) -> Column:
    """Quantize an ln-derived double to the exact integer grid."""
    return F.round(x * F.lit(float(GRID))).cast("bigint")


def nb_train(
    docs: DataFrame,
    class_col: str,
    tokens_col: Column,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB: returns (token_model, class_model).

    token_model: (cls, token, term_q) — quantized smoothed
      log-likelihood per (class, token) seen in training.
    class_model: (cls, floor_q, prior_q) — the per-class smoothing
      floor for vocabulary tokens unseen in the class, and the
      quantized log prior.

    Both are vocabulary/class-sized. The (class, token) count
    aggregate feeds three downstream branches (class totals,
    vocabulary size, the term table), so it is localCheckpointed
    once (rule 12) — it is narrow (three columns) and its upstream
    is the full corpus token explode.
    """
    counts = (
        docs.select(
            F.col(class_col).alias("cls"),
            F.explode(tokens_col).alias("token"),
        )
        .groupBy("cls", "token")
        .agg(F.count(F.lit(1)).alias("n_tc"))
        .localCheckpoint(eager=False)
    )
    # Class totals + global vocabulary size + doc priors: all from
    # vocabulary-sized inputs (never the corpus again), and all
    # LAZY — the scalars (V, N) ride 1-row broadcast cross joins
    # instead of eager .count() actions, so building the model
    # runs zero driver jobs and the whole train+score pipeline
    # materializes in one pass.
    totals = counts.groupBy("cls").agg(
        F.sum("n_tc").alias("t_c")
    )
    vocab_n = counts.agg(
        F.countDistinct("token").alias("v")
    )
    priors = (
        docs.groupBy(F.col(class_col).alias("cls"))
        .agg(F.count(F.lit(1)).alias("n_docs_c"))
        .localCheckpoint(eager=False)  # feeds N and the join
    )
    n_docs = priors.agg(
        F.sum("n_docs_c").alias("n")
    )
    class_model = (
        totals.join(priors, "cls")
        .crossJoin(F.broadcast(vocab_n))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "cls",
            _q(
                F.log(
                    F.lit(1.0)
                    / (
                        F.col("t_c").cast("double")
                        + F.col("v").cast("double")
                    )
                )
            ).alias("floor_q"),
            _q(
                F.log(
                    F.col("n_docs_c").cast("double")
                    / F.col("n").cast("double")
                )
            ).alias("prior_q"),
            F.col("t_c"),
            F.col("v"),
        )
    )
    token_model = counts.join(
        F.broadcast(class_model.select("cls", "t_c", "v")),
        "cls",
    ).select(
        "cls",
        "token",
        _q(
            F.log(
                (F.col("n_tc").cast("double") + F.lit(1.0))
                / (
                    F.col("t_c").cast("double")
                    + F.col("v").cast("double")
                )
            )
        ).alias("term_q"),
    )
    # NOT checkpointed (measured, rule 17): the scoring consumers
    # broadcast these frames several times, but those broadcast
    # futures run CONCURRENTLY as independent driver jobs over the
    # already-checkpointed ``counts``; a lazy checkpoint here
    # serializes the first broadcast behind the materialization and
    # measured +0.7s on ece_calibration (3.0 -> 3.6s) with no job
    # eliminated.
    return token_model, class_model.drop("t_c", "v")


def _scored_pairs(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    token_model: DataFrame,
    class_model: DataFrame,
) -> DataFrame:
    """Per-(doc, class) quantized log-posterior frame
    (_id, cls, score_q DECIMAL) for documents with at least one
    in-vocabulary token. Shared by nb_score (argmax on top) and
    nb_class_scores (full frame for calibration / label-noise
    consumers) so the scoring plan can never drift between them.

    Vocabulary restriction (semi-join: OOV tokens drop), then a
    broadcast fan-out to |classes| rows per token and ONE
    token-keyed left join against the term table; classes with
    the token unseen take the smoothing floor.
    """
    doc_tokens = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens_col).alias("token"),
        )
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = token_model.select("token").distinct()
    # Constant-key BroadcastHashJoin, NOT crossJoin: BNLJ is
    # excluded from whole-stage codegen, so the doc-token x class
    # pair stream (corpus-token-sized x |classes|) would evaluate
    # every downstream decimal expression interpreted (the
    # brute_force_topk_streamed lesson, measured 8x there).
    # The key must be attribute-DERIVED (const_join_key, r11): the
    # original lit(1) key was constant-folded out of the
    # equi-condition and the join silently degraded back to BNLJ.
    from afg_data_pipeline_spark.functions.gate import (
        const_join_key,
    )

    per_class = (
        doc_tokens.join(F.broadcast(vocab), "token", "left_semi")
        .withColumn("__k", const_join_key("token"))
        .join(
            F.broadcast(
                class_model.select(
                    "cls", "floor_q"
                ).withColumn("__k", const_join_key("cls"))
            ),
            "__k",
        )
        .drop("__k")
        .join(F.broadcast(token_model), ["token", "cls"], "left")
        .select(
            "_id",
            "cls",
            (
                F.col("cnt").cast(_D38)
                * F.coalesce(F.col("term_q"), F.col("floor_q"))
                .cast(_D38)
            ).alias("tok_q"),
        )
        .groupBy("_id", "cls")
        .agg(F.sum("tok_q").alias("tok_sum_q"))
    )
    # Add the prior map-side (broadcast); no doc × |classes| spine
    # expansion — documents whose tokens are all OOV are absent
    # here (callers handle the prior-only fallback).
    return per_class.join(
        F.broadcast(class_model.select("cls", "prior_q")), "cls"
    ).select(
        "_id",
        "cls",
        (F.col("tok_sum_q") + F.col("prior_q")).alias("score_q"),
    )


def nb_class_scores(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    token_model: DataFrame,
    class_model: DataFrame,
) -> DataFrame:
    """FULL per-(doc, class) score frame (id, cls, score_q
    DECIMAL(38,0) on the 1e9 log grid): every document gets a row
    for every class — the frame calibration and label-noise
    analyses need. All-OOV documents (no in-vocabulary token)
    score prior-only; they are completed by an anti-join of the
    doc spine against the scored ids crossed with the
    |classes|-row broadcast model — a spine expansion over ONLY
    the OOV stragglers, never the corpus (nb_score's no-spine rule
    holds for the hot path)."""
    # ``scored`` feeds two branches (the emitted rows and the
    # straggler anti-join's id set); without materialization the
    # whole corpus-scoring pipeline runs twice (rule 12 — the frame
    # is three narrow columns per (doc, class)).
    scored = _scored_pairs(
        docs, id_col, tokens_col, token_model, class_model
    ).localCheckpoint(eager=False)
    spine = docs.select(F.col(id_col).alias("_id"))
    missing = spine.join(
        scored.select("_id").distinct(), "_id", "left_anti"
    )
    prior_rows = missing.crossJoin(
        F.broadcast(
            class_model.select(
                "cls", F.col("prior_q").cast(_D38).alias("score_q")
            )
        )
    ).select("_id", "cls", "score_q")
    return (
        scored.unionByName(prior_rows)
        .withColumnRenamed("_id", id_col)
    )


def nb_score(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    token_model: DataFrame,
    class_model: DataFrame,
) -> DataFrame:
    """Score documents: (id, pred_cls, score) — argmax class with
    the quantized-exact log-posterior as a double.

    Per-document token multiplicities aggregate first (map-side
    combinable), then semi-restrict to the training vocabulary via
    the token-keyed model join itself. Documents whose tokens are
    all OOV still score (prior only) via a left join from the doc
    spine with a lazy 1-row prior-argmax fallback. Ties break to
    the lexicographically smallest class via min(struct(-score,
    cls)).

    The model joins carry broadcast hints: a text-classifier model
    is vocabulary-sized (a fastText-scale 2M-token vocabulary ×
    a handful of classes ≈ tens of MB) — small at any corpus
    scale. For an out-of-contract model too large to broadcast,
    drop the hints and let AQE pick a shuffle join; the plan stays
    correct.
    """
    scored = _scored_pairs(
        docs, id_col, tokens_col, token_model, class_model
    )
    best = scored.groupBy("_id").agg(
        F.min(F.struct((-F.col("score_q")).alias("neg"), "cls"))
        .alias("b")
    )
    prior_best = class_model.agg(
        F.min(
            F.struct(
                (-F.col("prior_q").cast("decimal(38,0)"))
                .alias("neg"),
                "cls",
            )
        ).alias("pb")
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(best, "_id", "left")
        .crossJoin(F.broadcast(prior_best))
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("b.cls"), F.col("pb.cls"))
            .alias("pred_cls"),
            (
                (
                    -F.coalesce(F.col("b.neg"), F.col("pb.neg"))
                ).cast("double")
                / F.lit(float(GRID))
            ).alias("score"),
        )
    )


def exact_auc(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney U, mid-rank ties) of a score
    against a 0/1 label: one row (auc, n_pos, n_neg).

    Scale design: the corpus collapses FIRST to one row per
    distinct score value (map-side-combinable pos/neg counts); the
    cumulative negative count runs over that value-space-sized
    table via sharded_cumsum (bit-identical to the single global
    window, n_shards-way parallel); U accumulates with the
    doubled-rank trick in DECIMAL(38,0) — n_pos·n_neg products
    have no provable 2^63 bound at corpus scale (rule 11). The
    only float is one final correctly-rounded division.
    """
    from afg_data_pipeline_spark.operators.prefixsum import (
        sharded_cumsum,
    )

    scored = df.select(
        F.col(score_col).alias("score"),
        F.col(label_col).cast("int").alias("is_pos"),
    )
    per_value = scored.groupBy("score").agg(
        F.sum("is_pos").cast("bigint").alias("n_pos_v"),
        F.sum(1 - F.col("is_pos")).cast("bigint")
        .alias("n_neg_v"),
    )
    cum = sharded_cumsum(
        per_value,
        value_col="n_neg_v",
        order_col="score",
        out_col="cum_neg_incl",
    )

    def d(c: str) -> Column:
        return F.col(c).cast(_D38)

    u2 = d("n_pos_v") * (
        F.lit(2).cast(_D38)
        * (d("cum_neg_incl") - d("n_neg_v"))
        + d("n_neg_v")
    )
    return cum.agg(
        (
            F.sum(u2).cast("double")
            / (
                F.lit(2.0)
                * F.sum("n_pos_v").cast("double")
                * F.sum("n_neg_v").cast("double")
            )
        ).alias("auc"),
        F.sum("n_pos_v").cast("bigint").alias("n_pos"),
        F.sum("n_neg_v").cast("bigint").alias("n_neg"),
    )
