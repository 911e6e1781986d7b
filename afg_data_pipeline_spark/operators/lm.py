"""Corpus-self-trained n-gram language-model scoring.

`plans/llm_ops.unigram_lm_score` is the cheapest LM filter; this
module adds the next rung — an interpolated BIGRAM model trained on
the corpus itself (the CCNet-style quality signal, one order up):

    p(t | prev) = λ · c(prev,t)/c(prev)  +  (1-λ) · c(t)/N

with c(·) raw corpus counts and N total tokens. The context mass
uses the FULL unigram count of ``prev`` (including document-final
occurrences), so the conditional is slightly sub-normalized at doc
boundaries — a deliberate simplification, documented rather than
hidden: the score is a quality-ranking heuristic, not a calibrated
probability, and dropping the boundary bookkeeping keeps the plan
to two count aggregations and three equi-joins.

Scale shape: token positions come from posexplode (no window over
anything wider than one document); bigram and unigram count tables
are partial-aggregated (map-side combine) before their shuffles;
the count joins are plain equi-joins AQE can re-plan for stopword
skew; the corpus total N rides in as a broadcast 1-row cross join.
Per-document reduction quantizes each row's -ln(p) to an integer
1e-9 grid and sums exactly (CLAUDE.md rules 1b/1c) —
order-invariant and engine-portable, so the result is bit-stable
under any partitioning and reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators import text as TX


def _nll_mean(p, n_alias: str):
    """Per-doc mean NLL of per-row probabilities ``p``, computed
    portably: quantize each row's -ln(p) ONCE to an integer 1e-9
    grid (integer rounding of the same double agrees across
    engines), sum exactly in DECIMAL(38,0) (ANSI-proof, no long
    overflow), then divide. CLAUDE.md rules 1b/1c: a decimal cast
    of the raw irrational double diverges between Spark
    (shortest-string rounding) and DuckDB (binary expansion);
    integer quantization does not.

    Returns (count_expr, avg_expr) aggregate expressions.
    """
    q = F.round(-F.log(p) * F.lit(1e9), 0).cast("bigint")
    cnt = F.count(F.lit(1))
    avg = (
        F.sum(q.cast("decimal(38,0)")).cast("double")
        / F.lit(1e9)
        / cnt.cast("double")
    )
    return cnt.alias(n_alias), avg.alias("avg_nll")


def bigram_lm_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's
    interpolated bigram LM: (id, n_bigrams, avg_nll), one row per
    document with >= 2 tokens.

    Both count tables derive from one tokenized projection; the
    bigram stream pairs each token with its predecessor via a
    per-document lag window (partitioned by ``id_col`` — thousands
    of tiny windows, never a corpus-wide sort).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(TX.tokens(text_col)).alias("pos", "t"),
    )
    uni = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cu"))
    tot = toks.agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("id").orderBy("pos")
    pairs = toks.withColumn("prev", F.lag("t").over(w)).filter(
        F.col("prev").isNotNull()
    )
    big = pairs.groupBy("prev", "t").agg(
        F.count(F.lit(1)).alias("cb")
    )
    cu_prev = uni.select(
        F.col("t").alias("prev"), F.col("cu").alias("cu_prev")
    )
    p = (
        F.lit(float(lam))
        * F.col("cb").cast("double")
        / F.col("cu_prev").cast("double")
        + F.lit(1.0 - float(lam))
        * F.col("cu").cast("double")
        / F.col("n").cast("double")
    )
    n_expr, avg_expr = _nll_mean(p, "n_bigrams")
    return (
        pairs.join(big, ["prev", "t"])
        .join(cu_prev, "prev")
        .join(uni, "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("id")
        .agg(n_expr, avg_expr)
        .select("id", "n_bigrams", "avg_nll")
    )


def bigram_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information of ADJACENT token pairs —
    collocation mining in its classical form: (term_a, term_b,
    n_pair, pmi) for bigrams occurring >= ``min_count`` times,
    pmi = ln(N·c(a,b) / (c(a)·c(b))) over corpus token counts.

    Adjacency (not document co-occurrence) keeps the statistic
    LINEAR in corpus size: bigram and unigram count tables are
    partial-aggregated before their shuffles, the final join is
    vocabulary-sized, and there is no quadratic per-document pair
    fanout at all — the right collocation shape for 100 TB. All
    counts are integers, so pmi is one deterministic double
    expression per output row.

    operators/tfidf.pmi_pairs is the document-co-occurrence
    sibling (df-pruned posting-list self-join) for topic-level
    association; this one is for phrase-level collocation.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(TX.tokens(text_col)).alias("pos", "t"),
    )
    uni = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cu"))
    tot = toks.agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("id").orderBy("pos")
    pairs = toks.withColumn("prev", F.lag("t").over(w)).filter(
        F.col("prev").isNotNull()
    )
    big = (
        pairs.groupBy("prev", "t")
        .agg(F.count(F.lit(1)).alias("cb"))
        .filter(F.col("cb") >= min_count)
    )
    cu_prev = uni.select(
        F.col("t").alias("prev"), F.col("cu").alias("cu_prev")
    )
    pmi = F.log(
        F.col("n").cast("double")
        * F.col("cb").cast("double")
        / (
            F.col("cu_prev").cast("double")
            * F.col("cu").cast("double")
        )
    )
    # ln() can differ by 1 ulp across engines; snap to a 1e-9 grid
    # through an integer round (see operators/text.py note).
    pmi = F.round(pmi * F.lit(1e9), 0).cast("bigint").cast(
        "double"
    ) / F.lit(1e9)
    return (
        big.join(cu_prev, "prev")
        .join(uni, "t")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("prev").alias("term_a"),
            F.col("t").alias("term_b"),
            F.col("cb").alias("n_pair"),
            pmi.alias("pmi"),
        )
    )


def trigram_lm_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    l3: float = 0.5,
    l2: float = 0.3,
) -> DataFrame:
    """Interpolated TRIGRAM LM mean NLL per document — the top rung
    of the module's LM ladder (unigram → bigram → trigram):

        p(t | t2,t1) = l3·c(t2,t1,t)/c(t2,t1)
                     + l2·c(t1,t)/c(t1)
                     + (1−l3−l2)·c(t)/N

    Context counts: c(t1) is the followed-count (t1 in non-final
    position), so the middle term is properly normalized; c(t2,t1)
    is the full bigram count, so the trigram term is slightly
    sub-normalized at boundaries — the same documented trade as
    ``bigram_lm_nll``. Scale shape identical: one posexplode, two
    per-doc lag windows, three partial-aggregated count tables
    joined back by equi-join, decimal-accumulated per-doc mean.
    Output rows are documents with >= 3 tokens.
    """
    l1 = 1.0 - float(l3) - float(l2)
    if l1 <= 0:
        raise ValueError("l3 + l2 must be < 1")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(TX.tokens(text_col)).alias("pos", "t"),
    )
    uni = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cu"))
    tot = toks.agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("id").orderBy("pos")
    ctx = (
        toks.withColumn("t1", F.lag("t", 1).over(w))
        .withColumn("t2", F.lag("t", 2).over(w))
    )
    tri_stream = ctx.filter(F.col("t2").isNotNull())
    bi_stream = ctx.filter(F.col("t1").isNotNull())
    tri = tri_stream.groupBy("t2", "t1", "t").agg(
        F.count(F.lit(1)).alias("c3")
    )
    bi = bi_stream.groupBy("t1", "t").agg(
        F.count(F.lit(1)).alias("c2")
    )
    bictx = bi.groupBy("t1").agg(F.sum("c2").alias("cb"))
    # trigram-context count c(t2,t1) = occurrences of the bigram
    # (t2,t1) as a PREFIX, i.e. the bigram table re-keyed
    trictx = bi.select(
        F.col("t1").alias("t2"),
        F.col("t").alias("t1"),
        F.col("c2").alias("cc"),
    )
    p = (
        F.lit(float(l3))
        * F.col("c3").cast("double")
        / F.col("cc").cast("double")
        + F.lit(float(l2))
        * F.col("c2").cast("double")
        / F.col("cb").cast("double")
        + F.lit(l1)
        * F.col("cu").cast("double")
        / F.col("n").cast("double")
    )
    n_expr, avg_expr = _nll_mean(p, "n_trigrams")
    return (
        tri_stream.join(tri, ["t2", "t1", "t"])
        .join(trictx, ["t2", "t1"])
        .join(bi, ["t1", "t"])
        .join(bictx, "t1")
        .join(uni, "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("id")
        .agg(n_expr, avg_expr)
        .select("id", "n_trigrams", "avg_nll")
    )


def kn_p_sql() -> str:
    """Interpolated Kneser-Ney bigram probability as ONE infix
    string evaluated verbatim by BOTH engines (the ols/_cramer3
    shared-infix discipline — identical operation order, so the
    resulting double is bit-identical on identical integer
    inputs). Expects columns: cb (bigram count), ctx (context
    bigram-token count sum_w c(v,w)), n1v (distinct continuations
    of v), n1w (distinct left contexts of w), n1/n2 (bigram types
    seen once/twice), n1tot (distinct bigram types).

    P(w|v) = max(cb - D, 0)/ctx + D*n1v/ctx * n1w/n1tot with the
    standard discount D = n1/(n1 + 2*n2) (Chen & Goodman 1998);
    D's denominator is guarded for degenerate corpora.
    """
    d = (
        "(CASE WHEN n1 + 2 * n2 > 0 THEN CAST(n1 AS DOUBLE)"
        " / CAST(n1 + 2 * n2 AS DOUBLE) ELSE 0.5 END)"
    )
    return (
        f"greatest(CAST(cb AS DOUBLE) - {d}, 0.0)"
        " / CAST(ctx AS DOUBLE)"
        f" + ({d} * CAST(n1v AS DOUBLE) / CAST(ctx AS DOUBLE))"
        " * (CAST(n1w AS DOUBLE) / CAST(n1tot AS DOUBLE))"
    )


def kneser_ney_bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean NLL under an interpolated KNESER-NEY
    bigram LM — the smoothing that actually ships in n-gram LM
    toolkits (absolute discounting + CONTINUATION-count backoff:
    'Francisco' is frequent but only ever follows 'San', so its
    unigram backoff mass is tiny). One rung above
    bigram_lm_nll's fixed-lambda interpolation.

    All model statistics are exact integers from two aggregations
    of the bigram-type table; the probability is evaluated through
    kn_p_sql()'s shared infix and the per-row NLL quantized once
    to the 1e-9 integer grid (rules 1b/1c). Context mass here IS
    the bigram-token count sum_w c(v,w) (not the raw unigram
    count), so the discounted conditional normalizes properly.

    Scale shape mirrors bigram_lm_nll: per-doc lag windows, map-
    side-combined counts, equi-joins, scalars on one broadcast row.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(TX.tokens(text_col)).alias("pos", "t"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    pairs = toks.withColumn("prev", F.lag("t").over(w)).filter(
        F.col("prev").isNotNull()
    )
    big = pairs.groupBy("prev", "t").agg(
        F.count(F.lit(1)).alias("cb")
    )
    vstats = big.groupBy("prev").agg(
        F.sum("cb").alias("ctx"),
        F.count(F.lit(1)).alias("n1v"),
    )
    wstats = big.groupBy("t").agg(
        F.count(F.lit(1)).alias("n1w")
    )
    scal = big.agg(
        F.sum(F.when(F.col("cb") == 1, 1).otherwise(0)).alias(
            "n1"
        ),
        F.sum(F.when(F.col("cb") == 2, 1).otherwise(0)).alias(
            "n2"
        ),
        F.count(F.lit(1)).alias("n1tot"),
    )
    p = F.expr(kn_p_sql())
    n_expr, avg_expr = _nll_mean(p, "n_bigrams")
    return (
        pairs.join(big, ["prev", "t"])
        .join(vstats, "prev")
        .join(wstats, "t")
        .crossJoin(F.broadcast(scal))
        .groupBy("id")
        .agg(n_expr, avg_expr)
        .select("id", "n_bigrams", "avg_nll")
    )
