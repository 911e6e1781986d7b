"""TF-IDF sparse document similarity via an inverted-index join.

The dense-embedding near-dup family (operators/similarity.py) needs
a model to produce vectors; this is its classical sparse sibling —
cosine similarity over TF-IDF term vectors, computed WITHOUT ever
materializing a vector: the dot product decomposes over terms, so a
self-join of the (doc, term, weight) posting list on term yields
exactly the nonzero products, and a per-pair sum is the dot.

Scale shape (the reason this formulation is the industry standard
for sparse all-pairs similarity):
- pair candidates come only from shared terms — disjoint-vocabulary
  doc pairs are never enumerated;
- the term self-join fans out O(df²) per term, so ubiquitous terms
  (stopwords) would dominate; they are pruned by ``max_df`` BEFORE
  the join. This is principled, not just expedient: a term in
  nearly every doc has idf ≈ 0 and contributes ≈ nothing to any
  dot product, while costing the quadratic worst case. Norms are
  computed on the pruned vocabulary, so cosine stays a true cosine
  of the compared vectors.

Determinism: the raw weight w = tf·ln(N/df) is irrational, and
Spark's double→decimal cast goes through the double's SHORTEST
string representation (``BigDecimal.valueOf``) while DuckDB rounds
the exact binary expansion — so decimal accumulation of w·w is NOT
portable across engines (measured: 23.560031374719504000 vs
…504384). Instead the weight is quantized ONCE to an integer,
``s = round(w · 1e6)`` (integer rounding of the same double agrees
across engines: any half-integer is exactly representable, so the
shortest string can never straddle a rounding boundary the binary
value doesn't), and every sum downstream is EXACT integer
arithmetic in DECIMAL(38,0) — associative, partitioning/retry
invariant, map-side combinable, and bit-identical in the DuckDB
oracle. The cosine then divides doubles derived from exact
integers: deterministic scalar ops only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for quantized TF-IDF weights (1e-6 resolution;
#: relative cosine error ~1e-6 — far below any similarity
#: threshold's meaningful precision)
QUANT = 1_000_000


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(id, term, s) posting list over whitespace tokens, with
    ``s = round(tf · ln(N/df) · 1e6)`` as BIGINT.

    ``max_df`` drops terms appearing in more than that many
    documents (None keeps all). N in the idf is the full corpus
    count, taken BEFORE pruning, so weights don't shift when the
    cap changes which terms survive.
    """
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_tab = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    if max_df is not None:
        df_tab = df_tab.filter(F.col("df") <= max_df)
    w = (
        F.col("tf").cast("double")
        * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        * F.lit(float(QUANT))
    )
    return tf.join(df_tab, "term").select(
        "id",
        "term",
        F.round(w, 0).cast("bigint").alias("s"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sim: float = 0.3,
    max_df: int | None = 50,
) -> DataFrame:
    """All document pairs (id_a < id_b) with TF-IDF cosine >=
    ``min_sim``, as (id_a, id_b, cosine).

    Decomposition: dot(a,b) = Σ_t s_a(t)·s_b(t) over shared terms —
    a posting-list self-join on term + one EXACT integer sum per
    pair (DECIMAL(19,0) factors → DECIMAL(38,0) products/sums, no
    rounding anywhere). Norms are integer sums of squares per doc;
    the division order (dot_double / (√na² · √nb²)) is fixed so the
    DuckDB oracle reproduces the exact float result.
    """
    # The posting list feeds THREE plan branches (norms, both
    # self-join sides); materialize it once — otherwise each branch
    # re-tokenizes the corpus and recomputes tf/df. The checkpoint
    # holds only (id, term, s): never raw text.
    w = tfidf_weights(docs, id_col, text_col, max_df).localCheckpoint(
        eager=True
    )
    dec = F.col("s").cast("decimal(19,0)")
    norms = w.groupBy("id").agg(
        F.sqrt(
            F.sum(dec * dec).cast("double")
        ).alias("norm")
    )
    a = w.select(
        F.col("id").alias("id_a"),
        "term",
        F.col("s").cast("decimal(19,0)").alias("sa"),
    )
    b = w.select(
        F.col("id").alias("id_b"),
        "term",
        F.col("s").cast("decimal(19,0)").alias("sb"),
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("__dot"))
    )
    na = norms.select(
        F.col("id").alias("id_a"), F.col("norm").alias("__na")
    )
    nb = norms.select(
        F.col("id").alias("id_b"), F.col("norm").alias("__nb")
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("__dot").cast("double")
                / (F.col("__na") * F.col("__nb"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(float(min_sim)))
    )


def pmi_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int | None = 50,
    min_pair_count: int = 2,
) -> DataFrame:
    """Pointwise mutual information of term pairs co-occurring in
    the same document: (term_a, term_b, n_docs_both, pmi) with
    term_a < term_b, pmi = ln(n·c_ab / (c_a·c_b)) over DOCUMENT
    frequencies — the classic collocation / topic-signal statistic.

    Shares the posting-list shape with the cosine join above, and
    the same df pruning argument: singleton terms (df < min_df)
    can't form a pair worth counting, ubiquitous terms (df >
    max_df) cost the O(df²) worst case while carrying no
    information (pmi → 0 as df → n). All counts are integers, so
    pmi is one deterministic double expression per output row —
    no accumulation-order concern at all.

    Scale: the pair fanout is Σ_d k_d² over PRUNED per-doc distinct
    terms k_d — the df cap bounds the per-term join width, and the
    groupBy(term_a, term_b) partial-aggregates before its shuffle.
    """
    n_docs = docs.count()
    # Three plan branches read the tokenized (id, term) table (the
    # df counts and both self-join sides); materialize it once so
    # tokenization runs once, not three times.
    dt = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.split(F.trim(F.col(text_col)), r"\s+")
            )
        ).alias("term"),
    ).localCheckpoint(eager=True)
    dfs = dt.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    dfs = dfs.filter(F.col("c") >= min_df)
    if max_df is not None:
        dfs = dfs.filter(F.col("c") <= max_df)
    pruned = dt.join(dfs, "term")
    a = pruned.select(
        "id", F.col("term").alias("term_a"), F.col("c").alias("ca")
    )
    b = pruned.select(
        "id", F.col("term").alias("term_b"), F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, "id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "ca", "cb")
        .agg(F.count(F.lit(1)).alias("n_docs_both"))
        .filter(F.col("n_docs_both") >= min_pair_count)
    )
    pmi = F.log(
        F.lit(float(n_docs))
        * F.col("n_docs_both").cast("double")
        / (F.col("ca").cast("double") * F.col("cb").cast("double"))
    )
    # ln() can differ by 1 ulp across engines (CLAUDE.md rule 1c);
    # snap to the 1e-9 grid through an integer round, same as
    # operators/lm.bigram_pmi.
    pmi = F.round(pmi * F.lit(1e9), 0).cast("bigint").cast(
        "double"
    ) / F.lit(1e9)
    return pairs.select(
        "term_a", "term_b", "n_docs_both", pmi.alias("pmi")
    )
