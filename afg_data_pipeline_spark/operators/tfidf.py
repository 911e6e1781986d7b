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
- All sums (dot products, squared norms) accumulate in
  DECIMAL(28,18): associative, so partitioning/retry-invariant and
  bit-reproducible in the DuckDB oracle (CLAUDE.md rule 1).

Weights: w(d,t) = tf(d,t) * ln(N / df(t)) — raw counts, natural
log, computed in double on both sides (scalar per (doc,term), no
order-dependence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,18)"


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(id, term, w) posting list over whitespace tokens.

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
    return tf.join(df_tab, "term").select(
        "id",
        "term",
        (
            F.col("tf").cast("double")
            * F.log(
                F.lit(float(n_docs)) / F.col("df").cast("double")
            )
        ).alias("w"),
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

    Decomposition: dot(a,b) = Σ_t w_a(t)·w_b(t) over shared terms —
    a posting-list self-join on term + one decimal sum per pair.
    Norms are decimal sums of squares per doc, sqrt'd in double;
    the division order (dot → double, divided by na·nb) is fixed so
    the DuckDB oracle reproduces the exact float result.
    """
    w = tfidf_weights(docs, id_col, text_col, max_df)
    norms = w.groupBy("id").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast(_DEC)).cast(
                "double"
            )
        ).alias("norm")
    )
    a = w.select(
        F.col("id").alias("id_a"),
        "term",
        F.col("w").alias("wa"),
    )
    b = w.select(
        F.col("id").alias("id_b"),
        "term",
        F.col("w").alias("wb"),
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum((F.col("wa") * F.col("wb")).cast(_DEC)).alias(
                "__dot"
            )
        )
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
