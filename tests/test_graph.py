"""Connected-components operator tests: known topologies plus a
union-find cross-check on a pseudo-random graph (the operator is
oracle-less — this is its correctness pin)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.graph import (
    canonical_per_component,
    connected_components,
)


def _components_of(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df)
    return {r["vertex"]: r["component"] for r in out.collect()}


class TestConnectedComponents:
    def test_known_topologies(self, spark):
        # chain 1-2-3-4, triangle 10-11-12, pair 20-21
        edges = [
            (1, 2),
            (2, 3),
            (3, 4),
            (10, 11),
            (11, 12),
            (12, 10),
            (20, 21),
        ]
        got = _components_of(spark, edges)
        assert got == {
            1: 1, 2: 1, 3: 1, 4: 1,
            10: 10, 11: 10, 12: 10,
            20: 20, 21: 20,
        }

    def test_long_chain_converges(self, spark):
        n = 16  # diameter 15 < max_iter
        got = _components_of(spark, [(i, i + 1) for i in range(n)])
        assert set(got.values()) == {0}

    def test_matches_union_find_on_pseudorandom_graph(self, spark):
        # Seeded edge set via md5 — no RNG state, reproducible.
        n, edges = 60, []
        for i in range(120):
            h = hashlib.md5(f"edge|{i}".encode()).digest()
            a = int.from_bytes(h[:4], "big") % n
            b = int.from_bytes(h[4:8], "big") % n
            if a != b:
                edges.append((a, b))

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # Canonicalize union-find roots to min member id.
        members: dict[int, list[int]] = {}
        touched = {v for e in edges for v in e}
        for v in touched:
            members.setdefault(find(v), []).append(v)
        want = {
            v: min(group)
            for group in members.values()
            for v in group
        }
        assert _components_of(spark, edges) == want

    def test_canonical_per_component(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "src long, dst long"
        )
        comps = connected_components(df)
        keep = {
            r["component"]: (r["keep_id"], r["n_members"])
            for r in canonical_per_component(comps).collect()
        }
        assert keep == {1: (1, 3), 7: (7, 2)}


class TestStarComponents:
    """Large-star/small-star vs the min-label oracle."""

    def _star(self, spark, edges, max_iter=30):
        from afg_data_pipeline_spark.operators.graph import (
            connected_components_star,
        )

        df = spark.createDataFrame(edges, "src long, dst long")
        out = connected_components_star(df, max_iter=max_iter)
        return {r["vertex"]: r["component"] for r in out.collect()}

    def test_agrees_with_min_label_on_pseudorandom_graph(self, spark):
        n, edges = 60, []
        for i in range(120):
            h = hashlib.md5(f"edge|{i}".encode()).digest()
            a = int.from_bytes(h[:4], "big") % n
            b = int.from_bytes(h[4:8], "big") % n
            if a != b:
                edges.append((a, b))
        assert self._star(spark, edges) == _components_of(spark, edges)

    def test_agrees_on_known_topologies(self, spark):
        edges = [
            (1, 2), (2, 3), (3, 4),
            (10, 11), (11, 12), (12, 10),
            (20, 21),
        ]
        assert self._star(spark, edges) == _components_of(spark, edges)

    def test_long_chain_needs_logarithmic_rounds(self, spark):
        # Diameter 255: min-label would need ~255 rounds; the star
        # alternation must resolve it within 10 — the adversarial-
        # diameter case this variant exists for.
        n = 256
        got = self._star(
            spark, [(i, i + 1) for i in range(n - 1)], max_iter=10
        )
        assert set(got.values()) == {0}
        assert len(got) == n


class TestRadiusEdges:
    def _brute(self, pts, radius):
        out = set()
        for i, (ida, xa, ya) in enumerate(pts):
            for idb, xb, yb in pts[i + 1 :]:
                d = ((xa - xb) ** 2 + (ya - yb) ** 2) ** 0.5
                if d <= radius:
                    a, b = sorted((ida, idb))
                    out.add((a, b))
        return out

    def test_matches_bruteforce_pseudorandom(self, spark):
        import hashlib

        pts = []
        for i in range(120):
            h = hashlib.md5(f"pt{i}".encode()).digest()
            pts.append(
                (i, h[0] / 255 * 100.0, h[1] / 255 * 100.0)
            )
        df = spark.createDataFrame(pts, "id long, x double, y double")
        from afg_data_pipeline_spark.operators.graph import (
            node_degrees,
            radius_edges_grid2d,
        )

        for radius in (5.0, 12.5, 40.0):
            got = {
                (r.id_a, r.id_b)
                for r in radius_edges_grid2d(
                    df, "id", "x", "y", radius
                ).collect()
            }
            assert got == self._brute(pts, radius), radius

        # degrees agree with the edge list
        edges = radius_edges_grid2d(df, "id", "x", "y", 12.5)
        deg = {
            r.vertex: r.degree for r in node_degrees(edges).collect()
        }
        brute = self._brute(pts, 12.5)
        from collections import Counter

        expect = Counter()
        for a, b in brute:
            expect[a] += 1
            expect[b] += 1
        assert deg == dict(expect)

    def test_boundary_pairs_cross_cells(self, spark):
        # two points straddling a cell boundary at distance exactly r
        df = spark.createDataFrame(
            [(1, 0.9, 0.0), (2, 1.1, 0.0), (3, 50.0, 50.0)],
            "id long, x double, y double",
        )
        from afg_data_pipeline_spark.operators.graph import (
            radius_edges_grid2d,
        )

        got = radius_edges_grid2d(df, "id", "x", "y", 1.0).collect()
        assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}
        assert abs(got[0].dist - 0.2) < 1e-12

    def test_no_cross_join_in_plan(self, spark):
        df = spark.createDataFrame(
            [(i, float(i), float(i)) for i in range(10)],
            "id long, x double, y double",
        )
        from afg_data_pipeline_spark.operators.graph import (
            radius_edges_grid2d,
        )

        plan = (
            radius_edges_grid2d(df, "id", "x", "y", 2.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPagerank:
    def _local_pagerank(self, n_nodes, edges, iters=10, scale=10**12):
        """Pure-python integer replica of operators/graph.pagerank."""
        from collections import defaultdict

        nodes = list(range(1, n_nodes + 1))
        n = len(nodes)
        dedges = edges + [(b, a) for a, b in edges]
        outdeg = defaultdict(int)
        for s, _ in dedges:
            outdeg[s] += 1
        rank = {v: scale // n for v in nodes}
        teleport = (15 * scale) // (100 * n)
        for _ in range(iters):
            dm = sum(
                (85 * rank[v]) // 100
                for v in nodes
                if outdeg[v] == 0
            )
            contrib = defaultdict(int)
            for s, d in dedges:
                contrib[d] += (85 * rank[s]) // (100 * outdeg[s])
            rank = {
                v: teleport + dm // n + contrib[v] for v in nodes
            }
        return rank

    def test_matches_integer_reference(self, spark):
        from afg_data_pipeline_spark.operators.graph import pagerank

        # path 1-2-3, 4 isolated (dangling)
        edges = [(1, 2), (2, 3)]
        nodes_df = spark.createDataFrame(
            [(i,) for i in range(1, 5)], "id long"
        )
        edges_df = spark.createDataFrame(
            edges, "src long, dst long"
        )
        got = {
            r.vertex: r.rank_scaled
            for r in pagerank(
                nodes_df, edges_df, iterations=10
            ).collect()
        }
        want = self._local_pagerank(4, edges)
        assert got == want
        # center of the path outranks the ends; dangling lowest
        assert got[2] > got[1] == got[3] > got[4]

    def test_mass_approximately_conserved(self, spark):
        from afg_data_pipeline_spark.operators.graph import pagerank

        edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
        nodes_df = spark.createDataFrame(
            [(i,) for i in range(1, 5)], "id long"
        )
        edges_df = spark.createDataFrame(
            edges, "src long, dst long"
        )
        out = pagerank(nodes_df, edges_df, iterations=5).collect()
        total = sum(r.rank_scaled for r in out)
        # floor-divisions only ever drop mass; bounded by a few
        # units per node per iteration
        assert 0.999 * 10**12 < total <= 10**12

    def test_empty_nodes_raise(self, spark):
        from afg_data_pipeline_spark.operators.graph import pagerank

        empty = spark.createDataFrame([], "id long")
        edges = spark.createDataFrame([], "src long, dst long")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            pagerank(empty, edges)


class TestAnsiProofConvergenceProbes:
    """Round-3 regression: the driver supplies its own Spark 4
    session where spark.sql.ansi.enabled defaults to TRUE, and a
    bare BIGINT sum of hash-valued/unbounded columns is a hard
    ARITHMETIC_OVERFLOW there (near_dup_components_star was the
    only red row in 129 queries). Both components variants must
    converge under ANSI-on with 64-bit hash-derived vertex ids —
    the exact overflow shape."""

    def _hash_edges(self, n=40):
        import hashlib

        edges = []
        for i in range(n):
            ha = hashlib.md5(f"va{i}".encode()).digest()
            hb = hashlib.md5(f"vb{i}".encode()).digest()
            # signed 64-bit ids spanning the full long range
            a = int.from_bytes(ha[:8], "big", signed=True)
            b = int.from_bytes(hb[:8], "big", signed=True)
            if a != b:
                edges.append((a, b))
        return edges

    def test_both_variants_under_ansi_on(self, spark):
        from afg_data_pipeline_spark.operators.graph import (
            connected_components,
            connected_components_star,
        )

        edges = self._hash_edges()
        df = spark.createDataFrame(edges, "src long, dst long")
        old = spark.conf.get("spark.sql.ansi.enabled")
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            a = {
                (r.vertex, r.component)
                for r in connected_components(df).collect()
            }
            b = {
                (r.vertex, r.component)
                for r in connected_components_star(df).collect()
            }
        finally:
            spark.conf.set("spark.sql.ansi.enabled", old)
        assert a == b
        assert len(a) == len({v for e in edges for v in e})

    def test_star_probe_frequency_is_bit_identical(self, spark):
        """The every-N-rounds checksum probe (a full job per probe)
        must not change the output: the potential function strictly
        decreases, so the edge set never revisits a state, and
        iterating at the fixpoint is the identity."""
        import hashlib

        from afg_data_pipeline_spark.operators.graph import (
            connected_components_star,
        )

        edges = []
        for i in range(120):
            h = hashlib.md5(f"pe|{i}".encode()).digest()
            a = int.from_bytes(h[:4], "big") % 60
            b = int.from_bytes(h[4:8], "big") % 60
            if a != b:
                edges.append((a, b))
        df = spark.createDataFrame(edges, "src long, dst long")
        outs = [
            sorted(
                (r.vertex, r.component)
                for r in connected_components_star(
                    df, probe_every=k
                ).collect()
            )
            for k in (1, 3)
        ]
        assert outs[0] == outs[1]


class TestPagerankSymmetrize:
    def test_directed_differs_from_undirected(self, spark):
        from afg_data_pipeline_spark.operators.graph import pagerank

        nodes = spark.createDataFrame(
            [(1,), (2,), (3,)], "id long"
        )
        # star INTO node 3: directed ranks concentrate on 3;
        # undirected symmetrization spreads mass back out.
        edges = spark.createDataFrame(
            [(1, 3), (2, 3)], "src long, dst long"
        )
        und = {
            r.vertex: r.rank_scaled
            for r in pagerank(nodes, edges, iterations=5).collect()
        }
        dire = {
            r.vertex: r.rank_scaled
            for r in pagerank(
                nodes, edges, iterations=5, symmetrize=False
            ).collect()
        }
        assert dire[3] > und[3]
        assert dire[1] == dire[2]
        # directed: 1 and 2 only get teleport+dangling mass
        assert dire[3] > dire[1]


class TestTriangleCounts:
    """Degree-oriented wedge-join triangle counting: known
    topologies plus an itertools brute-force cross-check on a
    seeded pseudorandom graph (the registered query additionally
    pins it against the DuckDB three-way-join oracle)."""

    def _run(self, spark, edges):
        from afg_data_pipeline_spark.operators.graph import (
            triangle_counts,
        )

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {
            r["vertex"]: (
                r["degree"],
                r["triangles"],
                r["clustering_coeff"],
            )
            for r in triangle_counts(df).collect()
        }

    def test_known_topologies(self, spark):
        # triangle 1-2-3, K4 on 10-13, chain 20-21-22 (no tri)
        edges = [
            (1, 2), (2, 3), (1, 3),
            (10, 11), (10, 12), (10, 13),
            (11, 12), (11, 13), (12, 13),
            (20, 21), (21, 22),
        ]
        got = self._run(spark, edges)
        assert got[1] == (2, 1, 1.0)
        assert got[2] == (2, 1, 1.0)
        assert got[3] == (2, 1, 1.0)
        # K4: every vertex has degree 3 and is in C(3,2)=3 tris.
        for v in (10, 11, 12, 13):
            assert got[v] == (3, 3, 1.0)
        assert got[20] == (1, 0, 0.0)
        assert got[21] == (2, 0, 0.0)
        assert got[22] == (1, 0, 0.0)

    def test_matches_bruteforce_pseudorandom(self, spark):
        import itertools

        n, eset = 40, set()
        for i in range(200):
            h = hashlib.md5(f"tri-edge|{i}".encode()).digest()
            a = int.from_bytes(h[:4], "big") % n
            b = int.from_bytes(h[4:8], "big") % n
            if a != b:
                eset.add((min(a, b), max(a, b)))
        edges = sorted(eset)
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want_tri = {v: 0 for v in adj}
        for a, b, c in itertools.combinations(sorted(adj), 3):
            if (
                b in adj[a] and c in adj[a] and c in adj[b]
            ):
                for v in (a, b, c):
                    want_tri[v] += 1
        got = self._run(spark, edges)
        assert set(got) == set(adj)
        for v in adj:
            d = len(adj[v])
            assert got[v][0] == d
            assert got[v][1] == want_tri[v]
            want_c = (
                2.0 * want_tri[v] / (d * (d - 1)) if d >= 2 else 0.0
            )
            assert got[v][2] == want_c

    def test_no_cartesian_in_plan(self, spark):
        from afg_data_pipeline_spark.operators.graph import (
            triangle_counts,
        )

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "id_a long, id_b long"
        )
        plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestBfsHopDistances:
    """Multi-source BFS: python BFS cross-check on a pseudorandom
    graph, a hand-checkable topology, and the fixpoint-probe
    early-exit identity (early exit must change nothing vs running
    all rounds — that is what keeps the unrolled oracle exact)."""

    def _run(self, spark, n, edges, sources, max_iter=10):
        from pyspark.sql import functions as F

        from afg_data_pipeline_spark.operators.graph import (
            bfs_hop_distances,
        )

        nodes = spark.createDataFrame(
            [(v,) for v in range(n)], "id long"
        )
        e = spark.createDataFrame(edges, "id_a long, id_b long")
        return {
            r["vertex"]: r["hops"]
            for r in bfs_hop_distances(
                nodes,
                e,
                F.col("id").isin(list(sources)),
                max_iter=max_iter,
            ).collect()
        }

    def test_chain_and_island(self, spark):
        # chain 0-1-2-3-4 with source 0; island 5-6 unreached
        got = self._run(
            spark, 7, [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)], {0}
        )
        assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: -1, 6: -1}

    def test_matches_python_bfs_multisource(self, spark):
        from collections import deque

        n, eset = 50, set()
        for i in range(140):
            h = hashlib.md5(f"bfs-edge|{i}".encode()).digest()
            a = int.from_bytes(h[:4], "big") % n
            b = int.from_bytes(h[4:8], "big") % n
            if a != b:
                eset.add((min(a, b), max(a, b)))
        edges = sorted(eset)
        sources = {0, 17, 33}
        adj: dict[int, list[int]] = {v: [] for v in range(n)}
        for a, b in edges:
            adj[a].append(b)
            adj[b].append(a)
        want = {v: -1 for v in range(n)}
        dq = deque()
        for s in sources:
            want[s] = 0
            dq.append(s)
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if want[v] == -1:
                    want[v] = want[u] + 1
                    dq.append(v)
        got = self._run(spark, n, edges, sources, max_iter=20)
        assert got == want

    def test_early_exit_equals_full_run(self, spark):
        edges = [(0, 1), (1, 2), (2, 3)]
        a = self._run(spark, 4, edges, {0}, max_iter=3)
        b = self._run(spark, 4, edges, {0}, max_iter=10)
        assert a == b == {0: 0, 1: 1, 2: 2, 3: 3}


class TestWeightedShortestPaths:
    def _run(self, spark, edges, seeds, n, max_iter=10):
        from afg_data_pipeline_spark.operators.graph import (
            weighted_shortest_paths,
        )

        nodes = spark.createDataFrame(
            [(i,) for i in range(n)], ["id"]
        )
        e = spark.createDataFrame(
            edges, ["id_a", "id_b", "wt"]
        )
        out = weighted_shortest_paths(
            nodes,
            e,
            F.col("id").isin(seeds),
            id_col="id",
            max_iter=max_iter,
        )
        return {r.vertex: r.dist for r in out.collect()}

    def test_chain_takes_cheaper_detour(self, spark):
        # 0-1 weight 10; 0-2 weight 1, 2-1 weight 2: dist(1)=3
        got = self._run(
            spark, [(0, 1, 10), (0, 2, 1), (2, 1, 2)], [0], 4
        )
        assert got[0] == 0
        assert got[2] == 1
        assert got[1] == 3
        assert got[3] == -1  # island

    def test_matches_python_dijkstra_multisource(self, spark):
        import heapq
        import random

        rng = random.Random(3)
        n = 40
        edges = []
        seen = set()
        for _ in range(120):
            a, b = rng.randrange(n), rng.randrange(n)
            if a == b or (min(a, b), max(a, b)) in seen:
                continue
            seen.add((min(a, b), max(a, b)))
            edges.append(
                (min(a, b), max(a, b), rng.randrange(1, 20))
            )
        seeds = [0, 7, 13]
        adj = {}
        for a, b, w in edges:
            adj.setdefault(a, []).append((b, w))
            adj.setdefault(b, []).append((a, w))
        dist = {s: 0 for s in seeds}
        pq = [(0, s) for s in seeds]
        heapq.heapify(pq)
        while pq:
            d, v = heapq.heappop(pq)
            if d > dist.get(v, 1 << 60):
                continue
            for u, w in adj.get(v, []):
                if d + w < dist.get(u, 1 << 60):
                    dist[u] = d + w
                    heapq.heappush(pq, (d + w, u))
        got = self._run(spark, edges, seeds, n, max_iter=50)
        exp = {
            v: dist.get(v, -1) for v in range(n)
        }
        assert got == exp

    def test_early_exit_equals_full_unroll(self, spark):
        edges = [(i, i + 1, 5) for i in range(5)]
        a = self._run(spark, edges, [0], 6, max_iter=5)
        b = self._run(spark, edges, [0], 6, max_iter=30)
        assert a == b


class TestLabelPropagation:
    def _run(self, spark, edges, n, rounds=4):
        from afg_data_pipeline_spark.operators.graph import (
            label_propagation,
        )

        nodes = spark.createDataFrame(
            [(i,) for i in range(n)], ["id"]
        )
        e = spark.createDataFrame(edges, ["id_a", "id_b"])
        out = label_propagation(
            nodes, e, id_col="id", rounds=rounds
        )
        return {r.vertex: r.label for r in out.collect()}

    def test_two_disjoint_cliques(self, spark):
        # disjoint 4-cliques: by round 3 each clique is uniformly
        # at its smallest member's label (synchronous LPA with a
        # bridge can 2-cycle, so the structural test stays
        # bridge-free; the replica test covers general graphs)
        clique = lambda vs: [
            (a, b) for a in vs for b in vs if a < b
        ]
        edges = clique([0, 1, 2, 3]) + clique([4, 5, 6, 7])
        got = self._run(spark, edges, 8)
        assert got[0] == got[1] == got[2] == got[3] == 0
        assert got[4] == got[5] == got[6] == got[7] == 4

    def test_isolated_vertex_keeps_own_label(self, spark):
        got = self._run(spark, [(0, 1)], 3)
        assert got[2] == 2

    def test_matches_python_replica(self, spark):
        import random

        rng = random.Random(5)
        n = 30
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n))
                    for _ in range(60)
                )
                if a != b
            }
        )
        adj = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        labels = {v: v for v in range(n)}
        for _ in range(4):
            new = {}
            for v in range(n):
                if v not in adj:
                    new[v] = labels[v]
                    continue
                cnt = {}
                for u in adj[v]:
                    cnt[labels[u]] = cnt.get(labels[u], 0) + 1
                new[v] = min(
                    cnt, key=lambda l: (-cnt[l], l)
                )
            labels = new
        got = self._run(spark, edges, n)
        assert got == labels


class TestKCore:
    def _run(self, spark, edges, k, max_iter=20):
        from afg_data_pipeline_spark.operators.graph import (
            kcore_membership,
        )

        e = spark.createDataFrame(edges, ["id_a", "id_b"])
        out = kcore_membership(e, k=k, max_iter=max_iter)
        return {r.vertex: r.degree for r in out.collect()}

    def test_clique_plus_tail_peels_tail(self, spark):
        # 4-clique with a pendant chain: 3-core = the clique only
        clique = [
            (a, b) for a in range(4) for b in range(4) if a < b
        ]
        tail = [(3, 4), (4, 5)]
        got = self._run(spark, clique + tail, 3)
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_cascading_peel(self, spark):
        # chain: every vertex eventually peels at k=2
        chain = [(i, i + 1) for i in range(6)]
        assert self._run(spark, chain, 2) == {}
        # cycle: the whole ring IS the 2-core
        ring = chain + [(6, 0)]
        got = self._run(spark, ring, 2)
        assert got == {i: 2 for i in range(7)}

    def test_matches_python_replica(self, spark):
        import random

        rng = random.Random(9)
        n = 25
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n))
                    for _ in range(70)
                )
                if a != b
            }
        )
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        k = 3
        changed = True
        while changed:
            changed = False
            for v in list(adj):
                if len(adj[v]) < k:
                    for u in adj[v]:
                        adj[u].discard(v)
                    del adj[v]
                    changed = True
        exp = {v: len(us) for v, us in adj.items()}
        assert self._run(spark, edges, k) == exp
