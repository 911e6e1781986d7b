"""Product Quantization ANN (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011) — the fourth tier of the
engine's similarity funnel:

    SRP-LSH buckets  →  64-bit Hamming codes  →  PQ/ADC  →  exact

PQ splits each vector into ``m`` subspaces, vector-quantizes each
subspace against a ``k``-entry codebook, and stores only the m code
indices (m=8, k=16 → 4 bits/code ≈ 4 bytes/vector vs 512 bytes of
float64 — the memory tier between Hamming's 8 bytes and full
vectors). Query time is Asymmetric Distance Computation (ADC): the
query precomputes an m×k table of exact subspace-to-centroid
distances and each candidate costs m lookups + adds.

Exactness contract (the repo-wide ANN conventions):
- all distances live on the 1e-6 integer grid (same quantization as
  operators/kmeans): exact integer arithmetic, bit-identical across
  engines and retries; per-group sums are DECIMAL-accumulated then
  cast (CLAUDE.md rule 11);
- ``iterations=0`` (the oracle-pinned default) seeds codebooks from
  the k lowest-id vectors; ``iterations>0`` runs integer Lloyd
  rounds per subspace for production codebook quality
  (python-replica-pinned in tests);
- argmin tie-breaks on the smallest code index; top-k ranking
  tie-breaks on neighbor id.

Physical shape — RELATIONAL, not expression-unrolled: the first cut
built each of the m×k distances as a literal expression tree
(m·k·dsub = 1024 squared-diff terms per row); that blew Janino's
64 KB generated-method limit, whole-stage codegen bailed to
interpreted evaluation, and encode ran ~50× slow (11 s for 2 000
vectors at sf0.1). Instead the codebook is a 1 024-row broadcast
table joined against the posexploded component stream — tiny
codegen bodies, map-side-combinable partial aggregates, and the
exact same relational shape as the DuckDB oracle:

  components (id, j, i, v)  ⋈  codebook (j, i, c, cv)   [broadcast]
    → groupBy (id, j, c): d = Σ (v−cv)²                 [dists]
    → groupBy (id, j): argmin_c                         [codes]
  ADC: codes(corpus) ⋈ dists(queries) on (j, c)
    → groupBy (query, neighbor): Σ d                    [adc]

At 100 TB: encode is one narrow shuffle-free pass over the corpus
(the broadcast is m·k·dsub rows regardless of corpus size); the ADC
join's intermediate is |corpus|·m·|queries| rows but partial
aggregation combines map-side, and queries arrive in bounded
batches in the funnel (PQ is the candidate tier, not an all-pairs
engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 10**6  # 1e-6 grid — same as operators/kmeans


def _quantized_arr(vec_col: str, dim: int):
    """BIGINT array of the vector's components on the 1e-6 grid."""
    return F.array(
        *[
            F.round(
                F.element_at(F.col(vec_col), i + 1).cast("double")
                * F.lit(float(QUANT)),
                0,
            ).cast("bigint")
            for i in range(dim)
        ]
    )


def _components(
    df: DataFrame, id_col: str, vec_col: str, dim: int, m: int
):
    """(id, j, i, v) — posexploded quantized components with the
    subspace index j (0-based) and within-subspace index i
    (1-based, matching the oracle's generate_series)."""
    dsub = dim // m
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        # Pre-expansion repartition (CLAUDE.md rule 3): the
        # explode×dim then ×k join expansion is invisible to AQE's
        # input-byte sizing — a single-file corpus would otherwise
        # run the whole component stream in one task.
        df.select(F.col(id_col).alias("id"), vec_col)
        .repartition(par)
        .select(
            "id",
            F.posexplode(_quantized_arr(vec_col, dim)).alias(
                "pos0", "v"
            ),
        )
        .select(
            "id",
            (F.col("pos0") / F.lit(dsub))
            .cast("int")
            .alias("j"),
            (F.col("pos0") % F.lit(dsub) + 1)
            .cast("int")
            .alias("i"),
            "v",
        )
    )


def _codebook_df(spark, codebooks: list) -> DataFrame:
    """The m·k·dsub-row broadcastable codebook table
    (j, c, i, cv)."""
    rows = [
        (j, c, i + 1, int(cv))
        for j, book in enumerate(codebooks)
        for c, cent in enumerate(book)
        for i, cv in enumerate(cent)
    ]
    return spark.createDataFrame(
        rows, "j int, c int, i int, cv long"
    )


def _dists_long(
    df: DataFrame,
    codebooks: list,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, j, c, d) — exact integer distance of every vector's
    subspace-j subvector to every centroid c. DECIMAL-accumulated,
    cast BIGINT (the oracle's HUGEINT-sum-cast twin)."""
    m = len(codebooks)
    dim = len(codebooks[0][0]) * m
    comp = _components(df, id_col, vec_col, dim, m)
    cb = _codebook_df(df.sparkSession, codebooks)
    diff = F.col("v") - F.col("cv")
    return (
        comp.join(F.broadcast(cb), ["j", "i"])
        .groupBy("id", "j", "c")
        .agg(
            F.sum((diff * diff).cast("decimal(38,0)"))
            .cast("long")
            .alias("d")
        )
    )


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    iterations: int = 0,
) -> list:
    """Train codebooks: ``codebooks[j][c]`` = the dsub integer
    components of centroid c of subspace j. iterations=0 seeds from
    the k lowest-id vectors (deterministic, SQL-replicable);
    iterations>0 refines each subspace with integer Lloyd rounds
    (floor-div means via the same offset trick as
    operators/kmeans, so results are shift-portable)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    seeds = (
        df.select(
            F.col(id_col).alias("id"),
            _quantized_arr(vec_col, dim).alias("qarr"),
        )
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(
            f"pq_train needs at least k={k} vectors, got {len(seeds)}"
        )
    codebooks = [
        [
            [int(seeds[c]["qarr"][j * dsub + i]) for i in range(dsub)]
            for c in range(k)
        ]
        for j in range(m)
    ]
    if iterations == 0:
        return codebooks

    OFF = 1 << 40
    for _ in range(iterations):
        codes = _argmin_codes(
            _dists_long(df, codebooks, id_col, vec_col)
        )
        comp = _components(df, id_col, vec_col, dim, m)
        agg = (
            comp.join(codes, ["id", "j"])
            .groupBy("j", "code", "i")
            .agg(
                # decimal accumulation BEFORE the sum (rule 11).
                F.sum(F.col("v").cast("decimal(38,0)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_books = [
            [list(codebooks[j][c]) for c in range(k)]
            for j in range(m)
        ]
        for row in agg:
            s, n = int(row["s"]), int(row["n"])
            new_books[row["j"]][row["code"]][row["i"] - 1] = (
                s + n * OFF
            ) // n - OFF
        codebooks = new_books
    return codebooks


def _argmin_codes(dists: DataFrame) -> DataFrame:
    """(id, j, code) — argmin_c of d, ties to the smallest c
    (min over (d, c) structs: exact lexicographic tie-break)."""
    return dists.groupBy("id", "j").agg(
        F.min(F.struct("d", "c"))["c"].alias("code")
    )


def pq_encode_long(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, j, code) — the join/aggregate form every downstream
    stage consumes (ADC joins on (j, code) directly)."""
    return _argmin_codes(
        _dists_long(df, codebooks, id_col, vec_col)
    )


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, codes array<int>) — the storage form: m small ints per
    vector. Assembled from the long form with an ordered
    collect_list (per-id arrays of m entries — never a corpus-wide
    sort)."""
    m = len(codebooks)
    long = pq_encode_long(
        df, codebooks, id_col=id_col, vec_col=vec_col
    )
    return long.groupBy("id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(j, code))),"
            " x -> x.code)"
        ).alias("codes")
    )


def pq_adc_topk(
    queries: DataFrame | None,
    corpus: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 5,
    query_filter=None,
) -> DataFrame:
    """Top-``topk`` corpus neighbors per query by ADC distance:
    (query_id, neighbor_id, adc, rank); adc is the exact integer
    Σ_j d(query_sub_j, centroid_j[code_j(neighbor)]), ranking ties
    break on neighbor id.

    The query-side lookup table is the same (id, j, c, d) distance
    relation the encoder uses — one definition, two roles (the
    oracle mirrors this reuse). When the queries ARE corpus rows,
    pass ``query_filter`` (a boolean Column over ``id``) instead of
    a ``queries`` frame: the corpus distance relation is computed
    ONCE (localCheckpointed for its two consumers, rule 12) and
    the LUT is a filter of it — half the distance work of the
    two-frame form. The ADC join is an ordinary (j, c) equi-join
    whose per-(query, neighbor) sum partial-aggregates map-side."""
    if (queries is None) == (query_filter is None):
        raise ValueError(
            "pass exactly one of queries= or query_filter="
        )
    if query_filter is not None:
        dists = _dists_long(
            corpus, codebooks, id_col, vec_col
        ).localCheckpoint(eager=False)
        codes_src = _argmin_codes(dists)
        lut = dists.filter(query_filter).select(
            F.col("id").alias("query_id"), "j", "c", "d"
        )
    else:
        codes_src = pq_encode_long(
            corpus, codebooks, id_col=id_col, vec_col=vec_col
        )
        lut = _dists_long(
            queries, codebooks, id_col, vec_col
        ).select(F.col("id").alias("query_id"), "j", "c", "d")
    codes = codes_src.select(
        F.col("id").alias("neighbor_id"),
        "j",
        F.col("code").alias("c"),
    )
    pairs = (
        codes.join(F.broadcast(lut), ["j", "c"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("d").cast("decimal(38,0)"))
            .cast("long")
            .alias("adc")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "adc", "rank")
    )
