"""Connected components over an edge list — the cluster-resolution
step of near-duplicate detection (pair list -> duplicate groups ->
one canonical doc per group).

Iterative min-label propagation: every vertex starts labeled with
itself; each round, every vertex takes the minimum label in its
closed neighborhood; fixpoint = components labeled by their minimum
vertex id. Rounds needed = graph diameter, and near-dup graphs are
shallow (clusters, not paths), so convergence is fast in practice;
``max_iter`` bounds the pathological chain.

Scale notes:
- Each round is one equi-join on vertex id + one min-aggregate —
  both shuffle on the same key, so AQE reuses the partitioning.
- The label frame is localCheckpoint()ed every round: iterative
  plans otherwise stack joins into an ever-deeper lineage that
  grows the optimizer's work quadratically and breaks past ~20
  rounds.
- Convergence is detected from a per-round CHECKSUM probe — two
  independently-seeded xxhash64 label sums in one scalar
  aggregate — not an expensive frame-vs-frame anti-join. The probe
  is type-agnostic (numeric AND string vertex ids). It is a
  checksum, not a proof: a cross-round collision (BOTH hash sums
  equal while labels changed, ~2^-128) would terminate a round
  early with unmerged components — negligible but nonzero, stated
  honestly (a count(distinct) alternative was measured to cost an
  extra shuffle per fixpoint round: ~0.9s/query, r7 bench).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns (vertex, component) where component is the minimum
    vertex id reachable from ``vertex``. Vertices are whatever ids
    appear in the edge list; isolated vertices (no edges) are the
    caller's concern — they are their own component trivially.
    """
    # Materialize the symmetrized edge list ONCE: it feeds every
    # round's join, and without truncation each iteration would
    # re-run the upstream edge pipeline (e.g. the full MinHash
    # candidate generation) from scratch.
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(max_iter):
        msgs = sym.join(
            labels, sym.a == labels.vertex
        ).select(F.col("b").alias("vertex"), "component")
        labels = (
            labels.unionByName(msgs)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        # Type-agnostic fixpoint probe: sum of xxhash64(component)
        # — works for numeric AND string vertex ids (entity
        # resolution components are canonical NAMES). DECIMAL(38,0)
        # accumulation: xxhash64 is uniform over ±2^63, a BIGINT
        # sum overflows almost surely and the driver's ANSI-on
        # session makes that a hard ARITHMETIC_OVERFLOW
        # (CLAUDE.md rule 11) — never a bare long sum.
        probe_row = labels.agg(
            F.sum(
                F.xxhash64("component").cast("decimal(38,0)")
            ).alias("s"),
            # cheap hardening of the checksum: a SECOND,
            # independently-seeded hash sum in the same aggregate
            # pass (xxhash64 of (component, 1) — different input,
            # independent value). A terminating collision must now
            # hit both sums simultaneously (~2^-128). Unlike a
            # count_distinct, this adds NO extra shuffle — the r7
            # bench measured count_distinct costing ~0.9s/query on
            # the components family (one distinct aggregate per
            # fixpoint round).
            F.sum(
                F.xxhash64("component", F.lit(1)).cast(
                    "decimal(38,0)"
                )
            ).alias("s2"),
        ).collect()[0]
        cur_sum = (probe_row["s"], probe_row["s2"])
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def _edge_checksum(edges: DataFrame) -> tuple:
    """Order-independent fingerprint of an edge set: (count,
    sum(xxhash64(u,v))). One tiny scalar row per round — the same
    cheap-convergence idea as connected_components' sum(label).

    The hash sum accumulates in DECIMAL(38,0): xxhash64 values are
    uniform over ±2^63, so a BIGINT sum overflows almost surely
    beyond a handful of edges — silently wrapping under ANSI-off,
    but a hard ARITHMETIC_OVERFLOW under the driver's default
    ANSI-on session (the round-3 red row; CLAUDE.md rule 11)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("u", "v").cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    probe_every: int = 1,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — same (vertex, component) contract as
    ``connected_components``, converging in O(log² n) rounds
    instead of O(diameter).

    Min-label propagation is the right default for near-dup graphs
    (tiny diameters) and stays the oracle; this is the escape for
    adversarial diameters (chains, lattices) where O(diameter)
    rounds of joins would dominate.

    Each operation is explode-free and HOF-lambda-free (CLAUDE.md
    rule 10): a symmetrize/orient, a per-vertex min aggregate, and
    an equi-join back — all shuffling on vertex id.

    - large-star: every vertex u links each strictly-larger
      neighbor to m = min(Γ(u) ∪ {u});
    - small-star: orient edges large→small; every vertex u links
      its smaller neighbors and itself to m = min(Γ(u)).

    Both preserve connectivity and strictly shrink the potential
    function; the fixpoint is a star forest rooted at component
    minima. Convergence is detected from an order-independent edge
    checksum (count + sum of xxhash64), matching the scalar-probe
    pattern of the min-label variant.

    ``probe_every``: the checksum probe is a full Spark job on the
    checkpointed edge frame, so it CAN run every N rounds; the
    output is bit-identical at any frequency (the potential
    function strictly decreases at every non-fixpoint step, so the
    edge set never revisits a state — two equal probes N apart
    imply every intervening round was already at the fixpoint, and
    iterating at the fixpoint is the identity). Default 1, unlike
    PageRank's checkpoint_every=2: PageRank runs a FIXED iteration
    count, so sparser checkpoints only remove jobs, while here
    sparser probes DELAY convergence detection by up to
    2(N-1) extra star rounds — and a round (two shuffled
    aggregates + join + distinct + checkpoint) costs ~10x a probe.
    Measured at sf0.1 (min-of-3): probe_every=1 5.91s,
    probe_every=2 8.52s.
    """
    probe_every = max(1, int(probe_every))
    # Self-loop-free undirected edge set, canonicalized u < v.
    base = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    all_vertices = (
        base.select(F.col("u").alias("vertex"))
        .unionByName(base.select(F.col("v").alias("vertex")))
        .distinct()
        .localCheckpoint()
    )
    e = base.localCheckpoint()
    prev = None
    for it in range(max_iter):
        # --- large-star ---------------------------------------
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("__mv"))
        m = F.least(F.col("u"), F.col("__mv"))
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star ---------------------------------------
        oriented = e.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        mins = oriented.groupBy("u").agg(F.min("v").alias("__m"))
        e = (
            oriented.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("__m").alias("v"))
            .unionByName(
                mins.select(
                    F.col("u"), F.col("__m").alias("v")
                )
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        if (it + 1) % probe_every == 0 or it == max_iter - 1:
            cur = _edge_checksum(e)
            if cur == prev:
                break
            prev = cur
    # Fixpoint edges point every non-root vertex at its component
    # minimum; roots (the minima) carry no outgoing edge.
    pointed = e.select(
        F.col("u").alias("vertex"), F.col("v").alias("component")
    )
    return (
        all_vertices.join(pointed, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("component", "vertex").alias("component"),
        )
    )


def canonical_per_component(
    members: DataFrame,
    id_col: str = "vertex",
    component_col: str = "component",
) -> DataFrame:
    """One keeper per component: the minimum id (which, under
    min-label propagation, is the component label itself)."""
    return members.groupBy(component_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


def radius_edges_grid2d(
    nodes: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """Exact radius graph: every undirected edge (id_a < id_b) whose
    euclidean distance is <= ``radius`` — built scale-safely via
    grid bucketing, never an all-pairs cross join.

    This is the graph-construction analogue of the reference's
    ``carga_comunas_gnn`` import (ingestion.py:8,63 — the module is
    absent from the snapshot; SURVEY treats its contract as
    inferred): turn a table of georeferenced units into the
    node/edge tables a GNN consumer loads.

    Algorithm (exact): hash both sides to square cells of width
    ``radius``. Any pair within ``radius`` differs by at most one
    cell per axis, so probing each point's own + 8 neighbor cells
    finds every qualifying pair. Probe side explodes 9x (cell id
    arithmetic only — coordinates ride along, no media/payload
    columns), build side stays in its own cell, and the pair space
    is a shuffle equi-join on cell id. A pair is discovered from
    both endpoints' probes; ``dropDuplicates`` collapses it.

    Scale notes: the 9x explode is pre-repartitioned (AQE cannot
    see row expansion in input shuffle bytes — CLAUDE.md rule 3);
    per-cell population bounds the join fan-out, so degenerate
    clustering (everything in one cell) degrades toward the dense
    O(n_cell²) that a radius graph genuinely has there. Output
    carries (id_a, id_b, dist) only.
    """
    par = nodes.sparkSession.sparkContext.defaultParallelism
    pts = nodes.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    w = float(radius) if radius > 0 else 1.0
    cell = pts.withColumns(
        {
            "__cx": F.floor(F.col("__x") / F.lit(w)),
            "__cy": F.floor(F.col("__y") / F.lit(w)),
        }
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probe = (
        cell.repartition(par)
        .withColumn(
            "__probe",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("__cx") + F.lit(dx)).alias("cx"),
                            (F.col("__cy") + F.lit(dy)).alias("cy"),
                        )
                        for dx, dy in offsets
                    ]
                )
            ),
        )
        .select(
            F.col("__id").alias("id_a"),
            F.col("__x").alias("xa"),
            F.col("__y").alias("ya"),
            F.col("__probe.cx").alias("__cx"),
            F.col("__probe.cy").alias("__cy"),
        )
    )
    build = cell.select(
        F.col("__id").alias("id_b"),
        F.col("__x").alias("xb"),
        F.col("__y").alias("yb"),
        "__cx",
        "__cy",
    )
    dist = F.sqrt(
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    return (
        probe.join(build, ["__cx", "__cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") <= F.lit(float(radius)))
        .select("id_a", "id_b", "dist")
        .dropDuplicates(["id_a", "id_b"])
    )


def node_degrees(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Undirected degree per vertex from an (id_a, id_b) edge list —
    the node-feature side of the GNN graph-table contract. One
    union + one count aggregate; shuffles vertex ids only."""
    return (
        edges.select(F.col(src).alias("vertex"))
        .unionByName(edges.select(F.col(dst).alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    scale: int = 10**12,
    checkpoint_every: int = 2,
    symmetrize: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank with damping 0.85, computed in EXACT
    integer arithmetic: (vertex, rank_scaled, rank) where
    rank_scaled is the rank × ``scale`` as BIGINT and rank is the
    derived double.

    Why integers: distributed PageRank sums per-vertex double
    contributions in shuffle order — irreproducible across
    partitionings and engines. Here ranks live on a 1/scale grid:

        contrib(u→v)  = (85 · r_u) div (100 · outdeg_u)
        teleport      = (15 · scale) div (100 · n)
        dangling      = (Σ_dangling (85 · r_u) div 100) div n
        r_v'          = teleport + dangling + Σ contrib(u→v)

    Every operation is BIGINT multiply / floor-divide / sum —
    associative and bit-identical in any engine (Spark ``div`` and
    DuckDB ``//`` agree on non-negatives), so a DuckDB replica with
    the iterations unrolled as chained CTEs matches bit-for-bit.
    With scale = 1e12 and Σr ≈ scale, intermediates stay ≤ ~1e14 —
    orders of magnitude under 2^63 even for extreme hub nodes.

    Scale shape: each iteration is one equi-join of the edge list
    with the rank frame on src (AQE reuses the partitioning — same
    key every round) + one partial-aggregated groupBy(dst); the
    dangling mass is a 1-row broadcast, never a collect; the rank
    frame is localCheckpoint()ed per round to truncate lineage
    (same discipline as connected_components above). Total work
    O(iterations · |E|) with no global sort anywhere.
    """
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank over an empty node set")
    # ``symmetrize`` (default True) treats the edge list as
    # UNDIRECTED — each input edge contributes both directions,
    # matching the radius-graph use case where (id_a, id_b) is a
    # canonicalized undirected pair. Pass False for a genuinely
    # directed graph (src -> dst only).
    dedges = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    )
    if symmetrize:
        dedges = dedges.unionByName(
            edges.select(
                F.col(dst).alias("s"), F.col(src).alias("d")
            )
        )
    # Materialize the directed edge list and degree table ONCE:
    # they feed every iteration, and without truncation each
    # iteration's action would re-run the upstream graph
    # construction (e.g. the grid-bucketed radius join) from
    # scratch.
    dedges = dedges.localCheckpoint()
    outdeg = dedges.groupBy("s").agg(
        F.count(F.lit(1)).alias("od")
    ).localCheckpoint()
    teleport = (15 * scale) // (100 * n)
    vertices = nodes.select(
        F.col(id_col).alias("vertex")
    ).localCheckpoint()
    ranks = vertices.withColumn(
        "rank", F.lit(scale // n).cast("bigint")
    ).localCheckpoint()
    for it in range(iterations):
        with_od = ranks.join(
            outdeg, ranks.vertex == outdeg.s, "left"
        )
        dangling = with_od.filter(F.col("od").isNull()).agg(
            F.coalesce(
                F.sum(F.expr("(85 * rank) div 100")), F.lit(0)
            ).alias("dm")
        )
        contribs = (
            dedges.join(ranks, dedges.s == ranks.vertex)
            .join(outdeg, "s")
            .groupBy("d")
            .agg(
                F.sum(
                    F.expr("(85 * rank) div (100 * od)")
                ).alias("contrib")
            )
        )
        ranks = (
            vertices
            .join(
                contribs,
                F.col("vertex") == F.col("d"),
                "left",
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "vertex",
                (
                    F.lit(teleport)
                    + F.expr("dm div " + str(n))
                    + F.coalesce(F.col("contrib"), F.lit(0))
                )
                .cast("bigint")
                .alias("rank"),
            )
        )
        # truncate lineage every OTHER round: each eager
        # localCheckpoint costs a full job, but un-truncated
        # lineage makes re-planning superlinear — measured at
        # sf0.1 / 10 iterations: every=1 9.0s, every=2 6.2s,
        # every=3 7.4s, every=5 14.3s. Output is bit-identical at
        # any frequency.
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "vertex",
        F.col("rank").alias("rank_scaled"),
        (F.col("rank").cast("double") / F.lit(float(scale))).alias(
            "rank"
        ),
    )


def _dec_floordiv(num, den):
    """Exact floor division of two non-negative DECIMAL(38,0)
    columns: ``(num - num % den) / den``. The subtraction makes the
    quotient an exact integer, so Spark's HALF_UP rounding of the
    decimal division is a no-op and the result matches DuckDB's
    HUGEINT ``//`` bit-for-bit (characterized over random 24-digit
    numerators in tests/test_graph_hits.py)."""
    return (
        (num - F.pmod(num, den)) / den
    ).cast("decimal(38,0)")


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 10**12,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Kleinberg HITS (hubs & authorities) over a DIRECTED edge
    list, computed in EXACT integer arithmetic on a 1/``scale``
    grid: returns (vertex, authority_scaled, hub_scaled, authority,
    hub).

    Per iteration (L1 normalization — scores sum to ~``scale``,
    floor loss aside, which keeps every intermediate bounded and
    the arithmetic engine-portable):

        a_raw(v) = Σ_{(u,v)∈E} h(u)          -- DECIMAL(38,0) sum
        a(v)     = (scale · a_raw(v)) // Σ a_raw
        h_raw(u) = Σ_{(u,v)∈E} a(v)
        h(u)     = (scale · h_raw(u)) // Σ h_raw

    Why integers: like pagerank above, double contributions sum in
    shuffle order; on the integer grid every step is an associative
    DECIMAL(38,0) multiply/floor-div/sum, bit-identical in the
    unrolled-CTE DuckDB replica (HUGEINT ``//``). Bounds: after
    normalization each score ≤ scale = 1e12, so a_raw ≤ 1e12·outdeg
    and scale·a_raw ≤ ~1e30 « 10^38; BIGINT would overflow at high
    degree, hence DECIMAL accumulation throughout (rule 11).

    Scale shape: each half-iteration is one equi-join of the edge
    list with the score frame + one partial-aggregated groupBy; the
    normalizing total is a 1-row broadcast crossJoin, never a
    collect. Lineage localCheckpoint()ed every ``checkpoint_every``
    rounds (the pagerank discipline). O(iterations · |E|), no
    global sort.

    Empty-graph semantics: a zero (or absent) normalizing total —
    no edges at all, or all remaining mass stranded on sink nodes —
    yields all-zero scores for that side (guarded BEFORE the
    floor-div: ANSI would otherwise raise DIVIDE_BY_ZERO), matching
    the oracle's ``COALESCE(x // NULLIF(t, 0), 0)``. The sf0.001
    supplier radius graph is exactly this case (10 nodes, no pair
    within radius)."""
    dedges = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint()
    n = nodes.count()
    if n == 0:
        raise ValueError("hits over an empty node set")
    vertices = nodes.select(
        F.col(id_col).alias("vertex")
    ).localCheckpoint()
    dec = "decimal(38,0)"
    # Degree tables, once: the normalizing totals below derive from
    # them instead of re-aggregating the edge-score join a second
    # time per half-iteration —
    #   Σ_v a_raw(v) = Σ_{(u,v)∈E} h(u) = Σ_u h(u)·outdeg(u)
    # (and symmetrically for hubs with indeg), an EXACT integer
    # identity, so the DECIMAL(38,0) totals are bit-identical to
    # the oracle's SUM(raw) while the per-iteration plan drops one
    # whole edge-join branch (the old ta/th broadcasts re-evaluated
    # araw/hraw; measured 87 driver jobs -> fewer stages, and at
    # scale it halves the edge passes of each half-iteration).
    # Bound: h(u)·outdeg ≤ 1e12·|E| ≪ 10^38.
    outdeg = dedges.groupBy("s").agg(
        F.count(F.lit(1)).cast(dec).alias("od")
    ).localCheckpoint()
    indeg = dedges.groupBy("d").agg(
        F.count(F.lit(1)).cast(dec).alias("idg")
    ).localCheckpoint()
    hub = vertices.withColumn(
        "score", F.lit(scale // n).cast(dec)
    ).localCheckpoint()
    auth = None
    scale_lit = F.lit(scale).cast(dec)
    for it in range(iterations):
        araw = (
            dedges.join(hub, dedges.s == hub.vertex)
            .groupBy("d")
            .agg(F.sum("score").alias("raw"))
        )
        ta = (
            hub.join(outdeg, hub.vertex == outdeg.s)
            .agg(
                F.sum(
                    (F.col("score") * F.col("od")).cast(dec)
                ).alias("t")
            )
        )
        auth = (
            vertices.join(
                araw, F.col("vertex") == F.col("d"), "left"
            )
            .crossJoin(F.broadcast(ta))
            .select(
                "vertex",
                F.when(
                    F.col("t").isNull() | (F.col("t") == 0),
                    F.lit(0).cast(dec),
                )
                .otherwise(
                    _dec_floordiv(
                        scale_lit
                        * F.coalesce(
                            F.col("raw"), F.lit(0).cast(dec)
                        ),
                        F.col("t"),
                    )
                )
                .alias("score"),
            )
        )
        hraw = (
            dedges.join(auth, dedges.d == auth.vertex)
            .groupBy("s")
            .agg(F.sum("score").alias("raw"))
        )
        th = (
            auth.join(indeg, auth.vertex == indeg.d)
            .agg(
                F.sum(
                    (F.col("score") * F.col("idg")).cast(dec)
                ).alias("t")
            )
        )
        hub = (
            vertices.join(
                hraw, F.col("vertex") == F.col("s"), "left"
            )
            .crossJoin(F.broadcast(th))
            .select(
                "vertex",
                F.when(
                    F.col("t").isNull() | (F.col("t") == 0),
                    F.lit(0).cast(dec),
                )
                .otherwise(
                    _dec_floordiv(
                        scale_lit
                        * F.coalesce(
                            F.col("raw"), F.lit(0).cast(dec)
                        ),
                        F.col("t"),
                    )
                )
                .alias("score"),
            )
        )
        # Mid-loop, checkpointing HUB alone truncates the whole
        # lineage (auth feeds hub within the iteration); auth is
        # materialized only at the end, where the final select
        # needs both frames. Each skipped checkpoint is one saved
        # job on the per-round scheduling floor.
        if it == iterations - 1:
            auth = auth.localCheckpoint()
            hub = hub.localCheckpoint()
        elif (it + 1) % checkpoint_every == 0:
            hub = hub.localCheckpoint()
    return (
        auth.select(
            "vertex", F.col("score").alias("a_score")
        )
        .join(
            hub.select(
                "vertex", F.col("score").alias("h_score")
            ),
            "vertex",
        )
        .select(
            "vertex",
            F.col("a_score").cast("bigint").alias(
                "authority_scaled"
            ),
            F.col("h_score").cast("bigint").alias("hub_scaled"),
            (
                F.col("a_score").cast("double")
                / F.lit(float(scale))
            ).alias("authority"),
            (
                F.col("h_score").cast("double")
                / F.lit(float(scale))
            ).alias("hub"),
        )
    )


def triangle_counts(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-vertex triangle counts + local clustering coefficient
    over an undirected (src < dst, deduplicated) edge list — the
    neighborhood-density node feature of the GNN graph-table
    contract (reference carga_comunas_gnn, inferred; see
    spatial_adjacency_graph).

    Algorithm (degree-oriented wedge join — the standard
    communication-optimal formulation): orient every undirected
    edge from its lower-(degree, id) endpoint to the higher one.
    Each triangle then has exactly ONE vertex with two outgoing
    oriented edges (its minimum-rank vertex), so enumerating
    wedges at oriented sources and closing them against the
    oriented edge list discovers every triangle exactly once, and
    total wedge work is bounded by O(m^1.5) regardless of degree
    skew — a plain (join on shared neighbor) wedge join is
    O(sum deg^2), which a single celebrity vertex turns quadratic.

    Shuffle shape: degree aggregate, two degree-attach joins, one
    wedge self-join on the oriented source, one closing equi-join
    on the (t1, t2) pair, one per-vertex count — all key-hash
    equi-joins, no cross join, no window. Output: (vertex, degree,
    triangles, clustering_coeff) for every vertex in the edge
    list; coefficient = 2T / (d(d-1)) as an exact integer ratio in
    IEEE double (identical across engines), 0.0 for d < 2.
    """
    # Materialize the edge list and the degree table: ``e`` feeds
    # the degree aggregate plus both degree-attach joins, and the
    # caller's edge pipeline is typically a non-trivial spatial /
    # candidate join (the registered query builds a grid-bucketed
    # radius self-join) — without truncation the FINAL plan embeds
    # that pipeline once per reference (measured at sf0.1: 188
    # parquet-scan leaves, a 1,058-node plan, and ~1.8s of pure
    # driver planning between jobs; rule 12). Both frames are 2-3
    # integer columns per row.
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=False)
    deg = node_degrees(e, "u", "v").localCheckpoint(eager=False)
    du = deg.select(
        F.col("vertex").alias("u"), F.col("degree").alias("du")
    )
    dv = deg.select(
        F.col("vertex").alias("v"), F.col("degree").alias("dv")
    )
    ranked = e.join(du, "u").join(dv, "v")
    # rank(x) = (degree, id): a strict total order (ids unique).
    fwd = F.struct(F.col("du"), F.col("u")) < F.struct(
        F.col("dv"), F.col("v")
    )
    # ``oriented`` feeds three branches (both wedge sides + the
    # closing edge list); checkpoint so the two degree-attach joins
    # above run once, not three times (same rule-12 call as ``e``).
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    ).localCheckpoint(eager=False)
    # Wedges at each oriented source: unordered {t1, t2} pairs,
    # emitted with rank(t1) < rank(t2) so the closing edge (t1 ->
    # t2) is exactly how `oriented` stores it.
    o1 = oriented.select(
        "s", F.col("t").alias("t1"), F.col("dt").alias("dt1")
    )
    o2 = oriented.select(
        "s", F.col("t").alias("t2"), F.col("dt").alias("dt2")
    )
    wedges = o1.join(o2, "s").filter(
        F.struct(F.col("dt1"), F.col("t1"))
        < F.struct(F.col("dt2"), F.col("t2"))
    )
    closing = oriented.select(
        F.col("s").alias("t1"), F.col("t").alias("t2")
    )
    tri = wedges.join(closing, ["t1", "t2"]).select("s", "t1", "t2")
    per_vertex = (
        tri.select(F.col("s").alias("vertex"))
        .unionByName(tri.select(F.col("t1").alias("vertex")))
        .unionByName(tri.select(F.col("t2").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    d = F.col("degree")
    t = F.col("triangles")
    return (
        deg.join(per_vertex, "vertex", "left")
        .select(
            "vertex",
            "degree",
            F.coalesce(t, F.lit(0)).cast("bigint").alias("triangles"),
        )
        .select(
            "vertex",
            "degree",
            "triangles",
            F.when(
                d >= 2,
                (t * 2).cast("double")
                / (d.cast("double") * (d - F.lit(1))),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def bfs_hop_distances(
    nodes: DataFrame,
    edges: DataFrame,
    source_cond,
    id_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 10,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Multi-source unweighted BFS: (vertex, hops) where hops is
    the hop count to the NEAREST vertex satisfying ``source_cond``
    (a boolean Column over ``nodes``), or -1 if unreached within
    ``max_iter`` rounds — the "distance to nearest facility /
    seed" primitive (hops-from-labeled-seed features, blast-radius
    queries, coverage audits).

    Integer-exact and engine-replayable like pagerank: each round
    is one equi-join (frontier → neighbors, dist+1) + one
    min-aggregate — both shuffle on vertex id, so AQE reuses the
    partitioning. Distances only ever decrease, so
    (count(non-null), Σdist) is a fixpoint probe (the
    connected_components convergence idea): early exit changes
    nothing vs running all ``max_iter`` rounds, which is what
    keeps the fixed-unroll DuckDB oracle bit-identical. Lineage is
    localCheckpoint-truncated every ``checkpoint_every`` rounds
    (pagerank's measured cadence).
    """
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    ).localCheckpoint()
    dist = nodes.select(
        F.col(id_col).alias("vertex"),
        F.when(source_cond, F.lit(0).cast("bigint")).alias("dist"),
    ).localCheckpoint()
    prev_probe = None
    for it in range(max_iter):
        msgs = sym.join(
            dist.filter(F.col("dist").isNotNull()),
            sym.s == F.col("vertex"),
        ).select(
            F.col("d").alias("vertex"),
            (F.col("dist") + F.lit(1)).alias("dist"),
        )
        dist = (
            dist.unionByName(msgs)
            .groupBy("vertex")
            .agg(F.min("dist").alias("dist"))
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            dist = dist.localCheckpoint()
            # probe only at checkpoint rounds: the frame is already
            # materialized, so the scalar aggregate is nearly free.
            # Hop counts are bounded by max_iter (≤ a few dozen), so
            # the BIGINT sum is provable: n · max_iter << 2^63.
            row = dist.agg(
                F.count("dist").alias("n"),
                F.sum("dist").alias("s"),
            ).collect()[0]
            probe = (row["n"], row["s"])
            if probe == prev_probe:
                break
            prev_probe = probe
    return dist.select(
        "vertex",
        F.coalesce(F.col("dist"), F.lit(-1).cast("bigint")).alias(
            "hops"
        ),
    )


def weighted_shortest_paths(
    nodes: DataFrame,
    edges: DataFrame,
    source_cond,
    id_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
    wt: str = "wt",
    max_iter: int = 10,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths (distributed
    Bellman-Ford): (vertex, dist) where dist is the minimum total
    integer edge weight to any vertex satisfying ``source_cond``,
    or -1 if unreached within ``max_iter`` relaxation rounds — the
    weighted sibling of bfs_hop_distances (travel-cost-to-nearest-
    facility, weighted blast radius).

    Weights MUST be exact integers (quantize irrational costs once
    per rule 1b — sqrt distances are IEEE-correctly-rounded, so
    round(dist·10^k) is engine-portable). Each round is one
    frontier equi-join + one min-aggregate on the vertex key (AQE
    reuses the partitioning); distances only decrease, so the
    (count, Σdist) pair is a fixpoint probe and early exit is
    bit-identical to the full unroll. The probe sum rides
    DECIMAL(38,0): unlike hop counts, Σ(path weights) has no
    provable 2^63 bound (rule 11).
    """
    sym = edges.select(
        F.col(src).alias("s"),
        F.col(dst).alias("d"),
        F.col(wt).cast("bigint").alias("w"),
    ).unionByName(
        edges.select(
            F.col(dst).alias("s"),
            F.col(src).alias("d"),
            F.col(wt).cast("bigint").alias("w"),
        )
    ).localCheckpoint()
    dist = nodes.select(
        F.col(id_col).alias("vertex"),
        F.when(source_cond, F.lit(0).cast("bigint")).alias(
            "dist"
        ),
    ).localCheckpoint()
    prev_probe = None
    for it in range(max_iter):
        msgs = sym.join(
            dist.filter(F.col("dist").isNotNull()),
            sym.s == F.col("vertex"),
        ).select(
            F.col("d").alias("vertex"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.unionByName(msgs)
            .groupBy("vertex")
            .agg(F.min("dist").alias("dist"))
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            dist = dist.localCheckpoint()
            row = dist.agg(
                F.count("dist").alias("n"),
                F.sum(
                    F.col("dist").cast("decimal(38,0)")
                ).alias("s"),
            ).collect()[0]
            probe = (row["n"], row["s"])
            if probe == prev_probe:
                break
            prev_probe = probe
    return dist.select(
        "vertex",
        F.coalesce(F.col("dist"), F.lit(-1).cast("bigint")).alias(
            "dist"
        ),
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
    rounds: int = 4,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan
    et al. 2007, deterministic variant): every vertex starts as its
    own label; each round it adopts the most frequent label among
    its neighbors, ties broken by SMALLEST label, keeping its
    current label when isolated. Runs a FIXED number of rounds —
    synchronous LPA can 2-cycle on bipartite structure, so unlike
    components/BFS there is no monotone fixpoint probe; the fixed
    unroll is also what makes the DuckDB oracle bit-identical.

    Finds dense communities inside connected graphs (components
    answers only reachability). Per round: one frontier equi-join +
    one (vertex, label) count + one argmax AGGREGATE —
    min(struct(-cnt, label)) gives the deterministic argmax with no
    window (rule 19: partial aggregation; never min_by, whose
    tie-break is arbitrary). All shuffles key on vertex id, so AQE
    reuses the partitioning; lineage localCheckpoints every
    ``checkpoint_every`` rounds like pagerank.
    """
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    ).localCheckpoint()
    labels = nodes.select(
        F.col(id_col).alias("vertex"),
        F.col(id_col).cast("bigint").alias("label"),
    ).localCheckpoint()
    for it in range(rounds):
        votes = (
            sym.join(
                labels, sym.s == F.col("vertex")
            )
            .groupBy(F.col("d").alias("v"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = (
            votes.groupBy("v")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg"),
                        F.col("label").alias("label"),
                    )
                ).alias("b")
            )
            .select("v", F.col("b.label").alias("new_label"))
        )
        labels = labels.join(
            best, labels.vertex == best.v, "left"
        ).select(
            "vertex",
            F.coalesce(F.col("new_label"), F.col("label")).alias(
                "label"
            ),
        )
        if (it + 1) % checkpoint_every == 0 or it == rounds - 1:
            labels = labels.localCheckpoint()
    return labels


def kcore_membership(
    edges: DataFrame,
    k: int,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Vertices of the k-core: the maximal subgraph where every
    vertex has degree >= k INSIDE the subgraph (Seidman 1983) —
    the standard "dense backbone" filter (spam-ring cores,
    collaboration cores, robust near-dup clusters that survive
    removing weak members).

    Iterative peeling: drop vertices with current degree < k,
    recompute degrees on the induced subgraph, repeat to fixpoint.
    Each round is one semi-join (edges -> surviving endpoints,
    both sides) + one degree count — all keyed on vertex id. The
    survivor count is MONOTONE DECREASING, so it doubles as the
    fixpoint probe and early exit is bit-identical to a full
    unroll (unlike LPA there is no oscillation: peeling is
    confluent). Returns (vertex, degree) for k-core members with
    their within-core degree.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    ).localCheckpoint()
    live = sym
    prev_n = None
    for it in range(max_iter):
        deg = live.groupBy(F.col("s").alias("vertex")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        keep = deg.filter(F.col("degree") >= k).select("vertex")
        live = (
            live.join(
                keep.withColumnRenamed("vertex", "s"), "s",
                "left_semi",
            )
            .join(
                keep.withColumnRenamed("vertex", "d"), "d",
                "left_semi",
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            live = live.localCheckpoint()
            n = live.count()
            if n == prev_n:
                break
            prev_n = n
    return live.groupBy(F.col("s").alias("vertex")).agg(
        F.count(F.lit(1)).alias("degree")
    ).filter(F.col("degree") >= k)
