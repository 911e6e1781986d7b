"""Declared queries: integer-exact k-means clustering and
SemDeDup-style semantic dedup over the embeddings table.

The oracle for the iterative k-means is the PageRank pattern
(plans/product_analytics.py precedent): iterations unrolled as a
chained CTE with AS MATERIALIZED (CLAUDE.md rule 5 — DuckDB inlines
plain CTEs and the plan tree would grow exponentially). Every
quantity is exact integer arithmetic on the 1e-6 grid, so the
unrolled SQL reproduces Spark's assignments and distances
bit-for-bit (see operators/kmeans.py for the portability argument:
integer rounding, non-negative-shifted floor division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from afg_data_pipeline_spark.io import read_star_table
from afg_data_pipeline_spark.operators.kmeans import OFF, QUANT
from afg_data_pipeline_spark.plans.registry import register

_K = 8
_ITERS = 3
_DIM = 64


def _kmeans_cte(k: int, iterations: int, dim: int) -> str:
    """Shared CTE chain ending in the final assignment a{T+1}."""
    dist = (
        "list_sum(list_transform(generate_series(1, {dim}), "
        "j -> (v.q[j] - c.q[j]) * (v.q[j] - c.q[j])))"
    ).format(dim=dim)
    parts = [
        f"""
        qv AS MATERIALIZED (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}.0)
                     AS BIGINT)) AS q
            FROM embeddings
        ),
        c0 AS MATERIALIZED (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                        AS INTEGER) AS cid, q
            FROM (SELECT vec_id, q FROM qv
                  ORDER BY vec_id LIMIT {k})
        )"""
    ]
    for i in range(1, iterations + 2):
        parts.append(
            f"""
        a{i} AS MATERIALIZED (
            SELECT vec_id, q, cluster, dist FROM (
                SELECT vec_id, q, cluster, dist,
                       row_number() OVER (PARTITION BY vec_id
                           ORDER BY dist, cluster) AS rn
                FROM (
                    SELECT v.vec_id, v.q, c.cid AS cluster,
                           {dist} AS dist
                    FROM qv v CROSS JOIN c{i - 1} c))
            WHERE rn = 1
        )"""
        )
        if i <= iterations:
            parts.append(
                f"""
        c{i} AS MATERIALIZED (
            SELECT cid, list(val ORDER BY dim) AS q FROM (
                SELECT cluster AS cid, g.j AS dim,
                       (CAST(SUM(q[g.j]) AS BIGINT)
                        + count(*) * {OFF}) // count(*)
                       - {OFF} AS val
                FROM a{i}, generate_series(1, {dim}) g(j)
                GROUP BY cluster, g.j)
            GROUP BY cid
        )"""
            )
    return "WITH" + ",".join(parts)


_FINAL = f"a{_ITERS + 1}"


@register(
    "kmeans_cluster_assign",
    oracle=_kmeans_cte(_K, _ITERS, _DIM)
    + f"""
        SELECT vec_id,
               CAST(cluster AS INTEGER) AS cluster,
               CAST(dist AS BIGINT) AS dist_q
        FROM {_FINAL}
    """,
    ops=("ANN", "A1"),
)
def kmeans_cluster_assign(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Integer-exact Lloyd's k-means (k=8, 3 rounds, deterministic
    smallest-id seeds) over the embeddings: final (vec_id, cluster,
    dist_q) with the exact integer squared distance on the 1e-6
    grid. operators/kmeans.kmeans_assign: one checkpointed
    quantized scan, one map-side-combinable aggregate per round,
    O(k·d) driver model state (the Spark MLlib shape) — distances
    are flat codegen against centroid literals, no explode/join on
    the data path. Oracle: iterations unrolled as MATERIALIZED
    CTEs, bit-identical by integer construction."""
    from afg_data_pipeline_spark.operators.kmeans import (
        kmeans_assign,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    return kmeans_assign(
        emb, k=_K, iterations=_ITERS, dim=_DIM
    ).select(
        F.col("id").alias("vec_id"), "cluster", "dist_q"
    )


@register(
    "semantic_dedup_pairs",
    oracle=_kmeans_cte(_K, _ITERS, _DIM)
    + f""",
        vecs AS MATERIALIZED (
            SELECT e.vec_id, e.embedding, a.cluster,
                   sqrt(list_aggregate(list_transform(
                       generate_series(1, len(e.embedding)),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * CAST(e.embedding[i] AS DOUBLE)),
                       'sum')) AS nrm
            FROM embeddings e
            JOIN {_FINAL} a ON a.vec_id = e.vec_id
        )
        SELECT x.vec_id AS id_a, y.vec_id AS id_b,
               CAST(x.cluster AS INTEGER) AS cluster,
               list_aggregate(list_transform(
                   generate_series(1, len(x.embedding)),
                   i -> CAST(x.embedding[i] AS DOUBLE)
                        * CAST(y.embedding[i] AS DOUBLE)),
                   'sum') / (x.nrm * y.nrm) AS cosine
        FROM vecs x JOIN vecs y ON x.cluster = y.cluster
        WHERE x.vec_id < y.vec_id
          AND list_aggregate(list_transform(
                  generate_series(1, len(x.embedding)),
                  i -> CAST(x.embedding[i] AS DOUBLE)
                       * CAST(y.embedding[i] AS DOUBLE)),
                  'sum') / (x.nrm * y.nrm) >= 0.2
    """,
    ops=("ANN", "DEDUP"),
)
def semantic_dedup_pairs_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup (Abbas et al.): embedding-space near-dup pairs
    restricted to the SAME k-means cluster — the pair space drops
    from n² to Σ n_c², with the integer-exact clustering as the
    blocking key. Threshold 0.2 surfaces the heavy-overlap tail of
    this synthetic corpus (as embedding_near_dup). Cosine is the
    sequential double fold every ANN oracle here uses —
    bit-identical across engines."""
    from afg_data_pipeline_spark.operators.kmeans import (
        semantic_dedup_pairs,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    return semantic_dedup_pairs(
        emb, k=_K, iterations=_ITERS, threshold=0.2
    )


@register(
    "hamming_topk",
    oracle="""
        WITH pairs AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(list_sum(list_transform(
                       generate_series(1, 64),
                       i -> CASE WHEN (q.embedding[i] > 0)
                                  <> (c.embedding[i] > 0)
                             THEN 1 ELSE 0 END)) AS INTEGER)
                       AS hamming
            FROM embeddings q CROSS JOIN embeddings c
            WHERE q.vec_id < 32 AND q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, hamming, rn AS rank
        FROM (
            SELECT query_id, neighbor_id, hamming,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY hamming ASC, neighbor_id ASC
                   ) AS rn
            FROM pairs)
        WHERE rn <= 5
    """,
    ops=("ANN",),
)
def hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-code ANN tier: top-5 neighbors per query (first 32
    vectors) by Hamming distance between sign-binarized 64-bit
    codes — 8 bytes/vector, one XOR + POPCNT per candidate in
    whole-stage codegen, ~two orders cheaper than the exact float
    dot; E[hamming] ∝ angular distance, so this is the cheap
    funnel stage ahead of exact re-ranking.
    operators/similarity.binary_hamming_topk / binarize_code. The
    oracle counts per-dimension sign mismatches — the same integer
    by definition, without assuming DuckDB bit intrinsics."""
    from afg_data_pipeline_spark.operators.similarity import (
        binary_hamming_topk,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    return binary_hamming_topk(
        emb.filter(F.col("vec_id") < 32), emb, k=5, dim=64
    )


@register(
    "ann_pq_topk",
    oracle="""
        WITH jsp AS (SELECT unnest(generate_series(0, 7)) AS j),
        isp AS (SELECT unnest(generate_series(1, 8)) AS i),
        seeds AS MATERIALIZED (
            SELECT embedding,
                   ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
            FROM embeddings ORDER BY vec_id LIMIT 16
        ),
        cent AS MATERIALIZED (
            SELECT jsp.j, s.c, isp.i,
                   CAST(round(CAST(s.embedding[jsp.j * 8 + isp.i]
                              AS DOUBLE) * 1000000.0) AS BIGINT)
                       AS cv
            FROM seeds s CROSS JOIN jsp CROSS JOIN isp
        ),
        vecq AS MATERIALIZED (
            SELECT e.vec_id, jsp.j, isp.i,
                   CAST(round(CAST(e.embedding[jsp.j * 8 + isp.i]
                              AS DOUBLE) * 1000000.0) AS BIGINT)
                       AS qv
            FROM embeddings e CROSS JOIN jsp CROSS JOIN isp
        ),
        dists AS MATERIALIZED (
            SELECT v.vec_id, v.j, c.c,
                   CAST(SUM((v.qv - c.cv) * (v.qv - c.cv))
                        AS BIGINT) AS d
            FROM vecq v JOIN cent c ON v.j = c.j AND v.i = c.i
            GROUP BY v.vec_id, v.j, c.c
        ),
        codes AS MATERIALIZED (
            SELECT vec_id, j, c FROM (
                SELECT vec_id, j, c,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id, j
                           ORDER BY d ASC, c ASC) AS rn
                FROM dists) WHERE rn = 1
        ),
        adc AS (
            SELECT qd.vec_id AS query_id, x.vec_id AS neighbor_id,
                   CAST(SUM(qd.d) AS BIGINT) AS adc
            FROM codes x
            JOIN dists qd ON qd.j = x.j AND qd.c = x.c
            WHERE qd.vec_id < 32 AND qd.vec_id <> x.vec_id
            GROUP BY qd.vec_id, x.vec_id
        )
        SELECT query_id, neighbor_id, adc, rn AS rank
        FROM (
            SELECT query_id, neighbor_id, adc,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY adc ASC, neighbor_id ASC) AS rn
            FROM adc)
        WHERE rn <= 5
    """,
    ops=("ANN",),
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN tier (Jégou et al. 2011): top-5
    neighbors per query (first 32 vectors) by Asymmetric Distance
    Computation over m=8 subspaces × k=16 seeded codebooks — the
    memory tier between the 8-byte Hamming codes and full vectors
    (4 bits/code × 8 codes ≈ 4 bytes/vector), with per-candidate
    cost of 8 table lookups + adds. Codebooks are driver literals
    (iterations=0 seeds = the 16 lowest-id vectors, deterministic
    and SQL-replicable; the production iterations>0 Lloyd knob is
    python-replica-pinned in tests). All distances are exact
    integers on the 1e-6 grid, so the oracle — which re-derives
    seeds, codes, and ADC sums relationally, reusing one `dists`
    CTE as both the encode argmin and the query LUT — matches bit
    for bit. operators/pq.py."""
    from afg_data_pipeline_spark.operators.pq import (
        pq_adc_topk,
        pq_train,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    books = pq_train(emb, m=8, k=16, dim=64, iterations=0)
    # Self-query mode: the corpus distance relation is computed
    # once and the query LUT is a filter of it.
    return pq_adc_topk(
        None,
        emb,
        books,
        topk=5,
        query_filter=F.col("id") < 32,
    )


@register(
    "ann_funnel_topk",
    oracle="""
        WITH ham AS MATERIALIZED (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(list_sum(list_transform(
                       generate_series(1, 64),
                       i -> CASE WHEN (q.embedding[i] > 0)
                                  <> (c.embedding[i] > 0)
                             THEN 1 ELSE 0 END)) AS INTEGER)
                       AS hamming
            FROM embeddings q CROSS JOIN embeddings c
            WHERE q.vec_id < 32 AND q.vec_id <> c.vec_id
        ),
        cand AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY hamming ASC, neighbor_id ASC
                       ) AS rn
                FROM ham) WHERE rn <= 50
        ),
        vecs AS MATERIALIZED (
            SELECT vec_id, embedding,
                   sqrt(list_aggregate(list_transform(
                       generate_series(1, len(embedding)),
                       i -> CAST(embedding[i] AS DOUBLE)
                            * CAST(embedding[i] AS DOUBLE)),
                       'sum')) AS nrm
            FROM embeddings
        ),
        scored AS MATERIALIZED (
            SELECT k.query_id, k.neighbor_id,
                   list_aggregate(list_transform(
                       generate_series(1, len(q.embedding)),
                       i -> CAST(q.embedding[i] AS DOUBLE)
                            * CAST(c.embedding[i] AS DOUBLE)),
                       'sum') / (q.nrm * c.nrm) AS cosine
            FROM cand k
            JOIN vecs q ON q.vec_id = k.query_id
            JOIN vecs c ON c.vec_id = k.neighbor_id
        )
        SELECT query_id, neighbor_id, cosine, rn AS rank
        FROM (
            SELECT query_id, neighbor_id, cosine,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC
                   ) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    ops=("ANN",),
)
def ann_funnel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN FUNNEL as one runnable pipeline: 8-byte Hamming
    codes generate 50 candidates per query (XOR+POPCNT per pair —
    two orders cheaper than a float dot), then ONLY those 50 pay
    the exact-cosine re-rank (operators/similarity.
    exact_rerank_topk) for the final top-5. This is the composition
    the per-tier queries (hamming_topk, ann_pq_topk,
    embedding_near_dup_lsh, ann_cosine_topk) exist to feed: at
    100 TB the exact tier touches |queries|·50 pairs instead of
    |queries|·|corpus|. Bit-exact oracle: the Hamming CTE is
    hamming_topk's (rn <= 50) and the re-rank CTE is
    ann_cosine_topk's sequential-fold cosine restricted to the
    candidate set."""
    from afg_data_pipeline_spark.operators.similarity import (
        binary_hamming_topk,
        exact_rerank_topk,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    cand = binary_hamming_topk(
        emb.filter(F.col("vec_id") < 32), emb, k=50, dim=64,
        radius_cut=True,
    )
    return exact_rerank_topk(cand, emb, k=5)


@register(
    "ann_ivfpq_topk",
    oracle="""
        WITH coarse AS MATERIALIZED (
            SELECT vec_id AS centroid_id, embedding AS centroid
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
            LIMIT 16
        ),
        coarse_d AS MATERIALIZED (
            SELECT e.vec_id, c.centroid_id,
                   list_aggregate(list_transform(
                       generate_series(1, len(e.embedding)),
                       i -> (CAST(e.embedding[i] AS DOUBLE)
                             - CAST(c.centroid[i] AS DOUBLE))
                          * (CAST(e.embedding[i] AS DOUBLE)
                             - CAST(c.centroid[i] AS DOUBLE))),
                       'sum') AS d2
            FROM embeddings e CROSS JOIN coarse c
        ),
        ranked AS MATERIALIZED (
            SELECT vec_id, centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY d2 ASC, centroid_id ASC
                   ) AS probe_rank
            FROM coarse_d
        ),
        corpus_cells AS MATERIALIZED (
            SELECT vec_id AS neighbor_id, centroid_id
            FROM ranked WHERE probe_rank = 1
        ),
        query_cells AS MATERIALIZED (
            SELECT vec_id AS query_id, centroid_id
            FROM ranked WHERE probe_rank <= 4 AND vec_id < 32
        ),
        cand AS MATERIALIZED (
            SELECT DISTINCT q.query_id, c.neighbor_id
            FROM query_cells q
            JOIN corpus_cells c USING (centroid_id)
            WHERE q.query_id <> c.neighbor_id
        ),
        jsp AS (SELECT unnest(generate_series(0, 7)) AS j),
        isp AS (SELECT unnest(generate_series(1, 8)) AS i),
        seeds AS MATERIALIZED (
            SELECT embedding,
                   ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
            FROM embeddings ORDER BY vec_id LIMIT 16
        ),
        pq_cent AS MATERIALIZED (
            SELECT jsp.j, s.c, isp.i,
                   CAST(round(CAST(s.embedding[jsp.j * 8 + isp.i]
                              AS DOUBLE) * 1000000.0) AS BIGINT)
                       AS cv
            FROM seeds s CROSS JOIN jsp CROSS JOIN isp
        ),
        vecq AS MATERIALIZED (
            SELECT e.vec_id, jsp.j, isp.i,
                   CAST(round(CAST(e.embedding[jsp.j * 8 + isp.i]
                              AS DOUBLE) * 1000000.0) AS BIGINT)
                       AS qv
            FROM embeddings e CROSS JOIN jsp CROSS JOIN isp
        ),
        pq_d AS MATERIALIZED (
            SELECT v.vec_id, v.j, c.c,
                   CAST(SUM((v.qv - c.cv) * (v.qv - c.cv))
                        AS BIGINT) AS d
            FROM vecq v JOIN pq_cent c ON v.j = c.j AND v.i = c.i
            GROUP BY v.vec_id, v.j, c.c
        ),
        codes AS MATERIALIZED (
            SELECT vec_id, j, c FROM (
                SELECT vec_id, j, c,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id, j
                           ORDER BY d ASC, c ASC) AS rn
                FROM pq_d) WHERE rn = 1
        ),
        adc AS (
            SELECT cd.query_id, cd.neighbor_id,
                   CAST(SUM(qd.d) AS BIGINT) AS adc
            FROM cand cd
            JOIN codes x ON x.vec_id = cd.neighbor_id
            JOIN pq_d qd ON qd.vec_id = cd.query_id
                        AND qd.j = x.j AND qd.c = x.c
            GROUP BY cd.query_id, cd.neighbor_id
        )
        SELECT query_id, neighbor_id, adc, rn AS rank
        FROM (
            SELECT query_id, neighbor_id, adc,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY adc ASC, neighbor_id ASC) AS rn
            FROM adc)
        WHERE rn <= 5
    """,
    ops=("ANN",),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (the FAISS IVFADC architecture) as one oracle-exact
    query: the coarse inverted index (ann_ivf_topk's seeded 16-cell
    contract, 4 probes) prunes candidates to ~n·n_probe/n_centroids,
    and only those pay the PQ/ADC distance (ann_pq_topk's m=8×k=16
    integer codebooks). Double-approximate by design — cell pruning
    AND code quantization — with the composed semantics pinned
    bit-exactly by the oracle (the coarse CTEs are ann_ivf_topk's,
    the PQ CTEs ann_pq_topk's, the ADC join gains the candidate
    restriction) and recall pinned in pytest.
    operators/pq.ivfpq_topk."""
    from afg_data_pipeline_spark.operators.pq import (
        ivfpq_topk,
        pq_train,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    books = pq_train(emb, m=8, k=16, dim=64, iterations=0)
    return ivfpq_topk(
        emb.filter(F.col("vec_id") < 32),
        emb,
        books,
        k=5,
        n_centroids=16,
        n_probe=4,
    )


@register(
    "semantic_dedup_keep",
    oracle=_kmeans_cte(_K, _ITERS, _DIM).replace(
        "WITH", "WITH RECURSIVE", 1
    )
    + f""",
        vecs AS MATERIALIZED (
            SELECT e.vec_id, e.embedding, a.cluster,
                   sqrt(list_aggregate(list_transform(
                       generate_series(1, len(e.embedding)),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * CAST(e.embedding[i] AS DOUBLE)),
                       'sum')) AS nrm
            FROM embeddings e
            JOIN {_FINAL} a ON a.vec_id = e.vec_id
        ),
        sd_pairs AS MATERIALIZED (
            SELECT x.vec_id AS ida, y.vec_id AS idb
            FROM vecs x JOIN vecs y ON x.cluster = y.cluster
            WHERE x.vec_id < y.vec_id
              AND list_aggregate(list_transform(
                      generate_series(1, len(x.embedding)),
                      i -> CAST(x.embedding[i] AS DOUBLE)
                           * CAST(y.embedding[i] AS DOUBLE)),
                      'sum') / (x.nrm * y.nrm) >= 0.2
        ),
        sym AS (
            SELECT ida AS src, idb AS dst FROM sd_pairs
            UNION ALL
            SELECT idb, ida FROM sd_pairs
        ),
        reach AS (
            SELECT src AS v, src AS r FROM sym
            UNION
            SELECT reach.v, s.dst
            FROM reach JOIN sym s ON reach.r = s.src
        ),
        comp AS (
            SELECT v, min(r) AS component FROM reach GROUP BY v
        )
        SELECT e.vec_id,
               COALESCE(c.component, e.vec_id) AS canonical_id,
               (e.vec_id = COALESCE(c.component, e.vec_id))
                   AS is_kept
        FROM embeddings e LEFT JOIN comp c ON c.v = e.vec_id
    """,
    ops=("ANN", "DEDUP"),
)
def semantic_dedup_keep_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup carried to its ACTUAL output — the pruned corpus:
    same-cluster cosine pairs become an edge list, connected
    components collapse transitive near-dup chains, and each vector
    reports (vec_id, canonical_id, is_kept) — keep the minimum id
    per component (unpaired vectors keep themselves). A caller
    filters is_kept to materialize the deduplicated corpus.
    Composition of semantic_dedup_pairs + operators/graph.
    connected_components; transitive-closure WITH RECURSIVE
    oracle."""
    from afg_data_pipeline_spark.operators.graph import (
        connected_components,
    )
    from afg_data_pipeline_spark.operators.kmeans import (
        semantic_dedup_pairs,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    pairs = semantic_dedup_pairs(
        emb, k=_K, iterations=_ITERS, threshold=0.2
    )
    comps = connected_components(pairs, src="id_a", dst="id_b")
    return (
        emb.select("vec_id")
        .join(
            comps.select(
                F.col("vertex").alias("vec_id"), "component"
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias(
                "canonical_id"
            ),
            (
                F.col("vec_id")
                == F.coalesce(F.col("component"), F.col("vec_id"))
            ).alias("is_kept"),
        )
    )


from afg_data_pipeline_spark.plans.registry import (  # noqa: E402
    REGISTRY as _REG,
)


@register(
    "ann_ivfpq_persisted",
    # Same parameters, same semantics, same SQL: the persisted
    # path must reproduce the one-shot query bit-for-bit.
    oracle=_REG["ann_ivfpq_topk"].oracle,
    ops=("ANN",),
)
def ann_ivfpq_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PERSISTED-index lifecycle of ann_ivfpq_topk: the coarse
    quantizer, PQ codebooks, and per-cell code postings are built
    ONCE into a parquet index directory (postings partitioned BY
    centroid_id — the partition layout IS the inverted index), and
    queries are served from it with the probed cells pushed into
    the postings scan as literal partition filters, so serving
    reads ~n_probe/n_centroids of the corpus bytes. Bit-identical
    to the one-shot composition — it registers the SAME oracle —
    and pinned against it in tests/test_pq.py along with the
    partition-pruning plan shape.
    operators/pq.build_ivfpq_index / query_ivfpq_index."""
    import os

    from afg_data_pipeline_spark.operators.pq import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    index_dir = os.path.join(
        "/tmp/afg_ivfpq_index",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    build_ivfpq_index(
        emb, index_dir, m=8, k=16, n_centroids=16, dim=64
    )
    return query_ivfpq_index(
        spark,
        index_dir,
        emb.filter(F.col("vec_id") < 32),
        k=5,
        n_probe=4,
    )



def _pca_oracle_sql(
    iterations: int = 12, grid: int = 10**6, v_scale: int = 10**6
) -> str:
    """Unrolled-CTE DuckDB replica of operators/pca.py: the same
    integer-grid Gram moments, centered covariance, and fixed-count
    power iteration, in HUGEINT (the pagerank_centrality pattern —
    recursive CTEs can't aggregate in the recursive term, but a
    FIXED iteration count unrolls to plain SQL). Division operands
    are kept non-negative by a sign CASE so DuckDB's floor `//`
    agrees with Python's `//` on the Spark driver."""
    parts = [
        f"""
        WITH g AS MATERIALIZED (
            SELECT vec_id, i,
                   CAST(round(CAST(embedding[i] AS DOUBLE) * {grid})
                        AS BIGINT) AS gv
            FROM (SELECT vec_id, embedding,
                         unnest(generate_series(1, len(embedding)))
                             AS i
                  FROM embeddings)
        ),
        nn AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
        s1 AS MATERIALIZED (
            SELECT i, SUM(CAST(gv AS HUGEINT)) AS s
            FROM g GROUP BY i
        ),
        s2 AS MATERIALIZED (
            SELECT a.i AS i, b.i AS j,
                   SUM(CAST(a.gv AS HUGEINT) * b.gv) AS s
            FROM g a JOIN g b ON a.vec_id = b.vec_id
            GROUP BY a.i, b.i
        ),
        c AS MATERIALIZED (
            SELECT s2.i, s2.j,
                   CAST(nn.n AS HUGEINT) * s2.s - sa.s * sb.s AS cv
            FROM s2 CROSS JOIN nn
            JOIN s1 sa ON sa.i = s2.i
            JOIN s1 sb ON sb.i = s2.j
        ),
        cm AS (SELECT max(abs(cv)) AS m FROM c),
        cn AS MATERIALIZED (
            SELECT i, j,
                   CASE WHEN cv < 0
                        THEN -(((-cv) * {v_scale}) // m)
                        ELSE (cv * {v_scale}) // m END AS w
            FROM c CROSS JOIN cm
        ),
        v0 AS MATERIALIZED (
            SELECT i AS j, CAST({v_scale} AS HUGEINT) AS v FROM s1
        )"""
    ]
    prev = "v0"
    for t in range(1, iterations + 1):
        parts.append(
            f""",
        w{t} AS MATERIALIZED (
            SELECT cn.i AS j, SUM(cn.w * v.v) AS wv
            FROM cn JOIN {prev} v ON v.j = cn.j
            GROUP BY cn.i
        ),
        m{t} AS (SELECT max(abs(wv)) AS m FROM w{t}),
        v{t} AS MATERIALIZED (
            SELECT j,
                   CASE WHEN wv < 0
                        THEN -(((-wv) * {v_scale}) // m)
                        ELSE (wv * {v_scale}) // m END AS v
            FROM w{t} CROSS JOIN m{t}
        )"""
        )
        prev = f"v{t}"
    parts.append(
        f"""
        SELECT g.vec_id,
               CAST(SUM(g.gv * v.v) AS BIGINT) AS pc1_score_scaled,
               CAST(CAST(SUM(g.gv * v.v) AS BIGINT) AS DOUBLE)
                   / {float(grid * v_scale)} AS pc1_score
        FROM g JOIN {prev} v ON v.j = g.i
        GROUP BY g.vec_id"""
    )
    return "".join(parts)


@register(
    "pca_top_component",
    oracle=_pca_oracle_sql(iterations=12),
    ops=("A1", "M1"),
)
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA projection (operators/pca.py): every vector's
    score along the corpus's dominant centered-covariance direction
    — the standard embedding-analytics primitive (dataset drift,
    1-D curriculum ordering, sharding by dominant direction). The
    corpus is touched by exactly two aggregate-shaped scans (d²
    Gram moments, then the broadcast-literal projection); the d×d
    eigensolve runs driver-side in exact Python integers. Oracle:
    the identical arithmetic unrolled into HUGEINT CTEs —
    hash-exact, which pins every step including the 12 integer
    renormalizations."""
    from afg_data_pipeline_spark.operators.pca import (
        pca_top_component_scores,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    return pca_top_component_scores(
        emb, "vec_id", "embedding", dim=64
    )


@register(
    "ann_sq8_topk",
    oracle="""
        WITH isp AS (SELECT unnest(generate_series(1, 64)) AS i),
        comp AS MATERIALIZED (
            SELECT vec_id, i,
                   CAST(round(CAST(embedding[i] AS DOUBLE)
                              * 1000000.0) AS BIGINT) AS v
            FROM embeddings CROSS JOIN isp
        ),
        b AS (
            SELECT i, min(v) AS mn,
                   GREATEST(max(v) - min(v), 1) AS span
            FROM comp GROUP BY i
        ),
        codes AS MATERIALIZED (
            SELECT vec_id, comp.i,
                   LEAST(GREATEST(((v - mn) * 255) // span, 0),
                         255) AS code
            FROM comp JOIN b USING (i)
        ),
        d AS (
            SELECT q.vec_id AS query_id,
                   x.vec_id AS neighbor_id,
                   CAST(SUM((q.code - x.code)
                            * (q.code - x.code)) AS BIGINT)
                       AS sqdist
            FROM codes q JOIN codes x USING (i)
            WHERE q.vec_id < 32 AND q.vec_id <> x.vec_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, sqdist,
               CAST(rn AS INTEGER) AS rank
        FROM (
            SELECT query_id, neighbor_id, sqdist,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY sqdist ASC, neighbor_id ASC
                   ) AS rn
            FROM d)
        WHERE rn <= 5
    """,
    ops=("ANN",),
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantization ANN tier (operators/sq.py): top-5
    neighbors for the first 32 vectors by exact integer L2 over
    per-dimension min-max 8-bit codes — the 1-byte/dim memory tier
    between full vectors and PQ (faiss ScalarQuantizer SQ8
    semantics). Bounds are 128 driver literals from ONE aggregate
    (rule 14); encode is a pure codegen'd projection; the pair
    distance is a single rule-15 zip_with fold, bit-exact against
    the relational DuckDB replica."""
    from afg_data_pipeline_spark.operators.sq import sq8_topk

    emb = read_star_table(spark, "embeddings", sf_dir)
    return sq8_topk(
        None,
        emb,
        k=5,
        dim=64,
        query_filter=F.col("neighbor_id") < 32,
    )


def _kcenter_oracle_sql(
    k: int = 8, grid: int = 10**6, dim: int = 64
) -> str:
    """Unrolled MATERIALIZED-CTE replica of
    operators/coreset.kcenter_select: one (argmax, distance-update)
    CTE pair per greedy round, all-integer grid distances."""

    def dist(a: str, b: str) -> str:
        return (
            "list_aggregate(list_transform("
            f"generate_series(1, {dim}), "
            f"i -> ({a}.qa[i] - {b}.qa[i])"
            f" * ({a}.qa[i] - {b}.qa[i])), 'sum')"
        )

    parts = [
        f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * {grid}.0)
                     AS BIGINT)) AS qa
            FROM embeddings
        ),
        c0 AS (SELECT vec_id AS sid, qa FROM q
               ORDER BY vec_id ASC LIMIT 1),
        d1 AS MATERIALIZED (
            SELECT d.vec_id, d.qa, {dist('d', 'c')} AS dmin
            FROM q d CROSS JOIN c0 c
        )"""
    ]
    rows = [
        """
        SELECT 0 AS sel_round, (SELECT sid FROM c0) AS vec_id,
               CAST(0 AS BIGINT) AS dist_sq"""
    ]
    for r in range(1, k):
        parts.append(
            f""",
        s{r} AS (SELECT vec_id, qa, dmin FROM d{r}
                 ORDER BY dmin DESC, vec_id ASC LIMIT 1)"""
        )
        rows.append(
            f"""
        SELECT {r}, (SELECT vec_id FROM s{r}),
               (SELECT CAST(dmin AS BIGINT) FROM s{r})"""
        )
        if r < k - 1:
            parts.append(
                f""",
        d{r + 1} AS MATERIALIZED (
            SELECT d.vec_id, d.qa,
                   LEAST(d.dmin, {dist('d', 'c')}) AS dmin
            FROM d{r} d CROSS JOIN s{r} c
        )"""
            )
    return "".join(parts) + " UNION ALL ".join(rows)


@register(
    "kcenter_coreset_select",
    oracle=_kcenter_oracle_sql(k=8),
    ops=("EMB", "SAMPLE"),
)
def kcenter_coreset_select(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K-CENTER CORESET (farthest-point sampling, Gonzalez 1985):
    greedily select 8 maximally-diverse embedding vectors — the
    data-pruning / diverse-eval-set / annotation-batch seeding
    primitive (a 2-approximation of the optimal k-center cover).
    All distances are exact int64 squared-Euclidean on the 1e6
    grid, so the greedy trajectory (dist DESC, vec_id ASC
    tie-break, min-vec_id seed) is bit-identical to the unrolled
    CTE oracle. Per round: ONE projection updating the running
    min-distance against the newest driver-literal center + one
    max(struct) aggregate — no joins, no windows, no corpus
    shuffle (rule 14 literal model state; rule 15 HOF fold
    distances). operators/coreset.kcenter_select."""
    from afg_data_pipeline_spark.operators.coreset import (
        kcenter_select,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    out = kcenter_select(emb, k=8)
    return out.select(
        F.col("round").alias("sel_round"), "vec_id", "dist_sq"
    )


_CONTAM_EVAL_SETS = ("src0", "src1")
_CONTAM_TAU = 0.40
_CONTAM_CAND_K = 20


@register(
    "embedding_contamination_audit",
    oracle=f"""
        WITH tagged AS MATERIALIZED (
            SELECT e.vec_id, e.embedding, d.source
            FROM embeddings e JOIN documents d
              ON e.vec_id = d.doc_id
        ),
        ham AS MATERIALIZED (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(list_sum(list_transform(
                       generate_series(1, 64),
                       i -> CASE WHEN (q.embedding[i] > 0)
                                  <> (c.embedding[i] > 0)
                             THEN 1 ELSE 0 END)) AS INTEGER)
                       AS hamming
            FROM tagged q CROSS JOIN tagged c
            WHERE q.source IN ('src0', 'src1')
              AND c.source NOT IN ('src0', 'src1')
        ),
        cand AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY hamming ASC, neighbor_id ASC
                       ) AS rn
                FROM ham) WHERE rn <= {_CONTAM_CAND_K}
        ),
        vecs AS MATERIALIZED (
            SELECT vec_id, embedding,
                   sqrt(list_aggregate(list_transform(
                       generate_series(1, len(embedding)),
                       i -> CAST(embedding[i] AS DOUBLE)
                            * CAST(embedding[i] AS DOUBLE)),
                       'sum')) AS nrm
            FROM embeddings
        ),
        best AS (
            SELECT k.query_id,
                   max(list_aggregate(list_transform(
                       generate_series(1, len(q.embedding)),
                       i -> CAST(q.embedding[i] AS DOUBLE)
                            * CAST(c.embedding[i] AS DOUBLE)),
                       'sum') / (q.nrm * c.nrm)) AS max_cos
            FROM cand k
            JOIN vecs q ON q.vec_id = k.query_id
            JOIN vecs c ON c.vec_id = k.neighbor_id
            GROUP BY k.query_id
        ),
        flags AS (
            SELECT t.source AS eval_set, b.max_cos
            FROM tagged t LEFT JOIN best b
              ON b.query_id = t.vec_id
            WHERE t.source IN ('src0', 'src1')
        )
        SELECT eval_set,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN max_cos >= {_CONTAM_TAU}
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated,
               CAST(sum(CASE WHEN max_cos >= {_CONTAM_TAU}
                        THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE)
                   AS frac_contaminated,
               max(max_cos) AS max_cosine,
               CAST({_CONTAM_TAU} AS DOUBLE) AS threshold
        FROM flags
        GROUP BY eval_set
    """,
    ops=("ANN", "DEDUP", "A1"),
)
def embedding_contamination_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EMBEDDING-SPACE contamination audit — per benchmark (the
    src0/src1 eval slices of contamination_report), the fraction
    of eval examples with a TRAINING neighbor above cosine 0.40.
    This is the paraphrase-leak direction the n-gram queries
    (eval_decontamination, contamination_report) structurally
    miss: a reworded eval example shares no 3-grams with its
    training twin but sits next to it in embedding space.

    operators/similarity.embedding_contamination_report — a pure
    composition of the two certified funnel tiers (Hamming
    candidates, exact-cosine rerank of only those); the oracle
    replicates the same funnel CTE-for-CTE (hamming_topk's pair
    count + ann_funnel_topk's sequential-fold cosine), so the row
    is bit-exact, and the tier's recall is separately MEASURED by
    ann_recall_audit rather than assumed here."""
    from afg_data_pipeline_spark.operators.similarity import (
        embedding_contamination_report,
    )

    emb = read_star_table(spark, "embeddings", sf_dir)
    docs = read_star_table(spark, "documents", sf_dir).select(
        F.col("doc_id").alias("vec_id"),
        F.col("source").alias("eval_set"),
    )
    tagged = emb.join(docs, "vec_id")
    is_eval = F.col("eval_set").isin(*_CONTAM_EVAL_SETS)
    return embedding_contamination_report(
        tagged.filter(is_eval),
        tagged.filter(~is_eval),
        set_col="eval_set",
        threshold=_CONTAM_TAU,
        cand_k=_CONTAM_CAND_K,
        dim=64,
    )
