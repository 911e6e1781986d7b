"""HITS operator tests: a pure-python integer replica on known
directed graphs (the bit-exactness pin for the DuckDB oracle), the
_dec_floordiv characterization over random 24-digit values, and the
empty-input contracts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.graph import (
    _dec_floordiv,
    hits,
)

SCALE = 10**12


def _local_hits(n_nodes, edges, iters=5, scale=SCALE):
    """Pure-python integer replica of operators/graph.hits
    (L1-normalized, floor division)."""
    hub = {v: scale // n_nodes for v in range(n_nodes)}
    auth = {v: 0 for v in range(n_nodes)}
    for _ in range(iters):
        araw = {v: 0 for v in range(n_nodes)}
        for s, d in edges:
            araw[d] += hub[s]
        ta = sum(araw.values())
        auth = {v: (scale * araw[v]) // ta for v in range(n_nodes)}
        hraw = {v: 0 for v in range(n_nodes)}
        for s, d in edges:
            hraw[s] += auth[d]
        th = sum(hraw.values())
        hub = {v: (scale * hraw[v]) // th for v in range(n_nodes)}
    return auth, hub


def _run_hits(spark, n_nodes, edges, iters=5):
    nodes = spark.createDataFrame(
        [(i,) for i in range(n_nodes)], "id long"
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    rows = hits(nodes, edf, iterations=iters).collect()
    return (
        {r["vertex"]: r["authority_scaled"] for r in rows},
        {r["vertex"]: r["hub_scaled"] for r in rows},
    )


class TestHits:
    def test_star_graph(self, spark):
        # 0 points at 1..3: node 0 is the only hub, 1..3 equal
        # authorities.
        edges = [(0, 1), (0, 2), (0, 3)]
        auth, hub = _run_hits(spark, 4, edges)
        want_auth, want_hub = _local_hits(4, edges)
        assert auth == want_auth
        assert hub == want_hub
        assert auth[0] == 0 and hub[0] > 0
        assert auth[1] == auth[2] == auth[3]

    def test_pseudorandom_graph_matches_replica(self, spark):
        rnd = random.Random(42)
        n = 30
        edges = sorted(
            {
                (rnd.randrange(n), rnd.randrange(n))
                for _ in range(120)
            }
        )
        edges = [(s, d) for s, d in edges if s != d]
        auth, hub = _run_hits(spark, n, edges)
        want_auth, want_hub = _local_hits(n, edges)
        assert auth == want_auth
        assert hub == want_hub

    def test_empty_edges_all_zero(self, spark):
        # the sf0.001 supplier graph regime: nodes, no edges —
        # scores are all zero on both engines (oracle COALESCEs
        # the NULLIF'd division), never a DIVIDE_BY_ZERO
        nodes = spark.createDataFrame(
            [(1,), (2,)], "id long"
        )
        edges = spark.createDataFrame([], "src long, dst long")
        rows = hits(nodes, edges).collect()
        assert len(rows) == 2
        assert all(
            r["authority_scaled"] == 0 and r["hub_scaled"] == 0
            for r in rows
        )

    def test_empty_nodes_raise(self, spark):
        nodes = spark.createDataFrame([], "id long")
        edges = spark.createDataFrame(
            [(1, 2)], "src long, dst long"
        )
        with pytest.raises(ValueError, match="empty node"):
            hits(nodes, edges)


class TestDecFloordiv:
    def test_matches_python_floordiv(self, spark):
        rnd = random.Random(7)
        rows = []
        for _ in range(500):
            num = rnd.randrange(10**24)
            den = rnd.randrange(1, 10**18)
            rows.append((str(num), str(den), str(num // den)))
        df = spark.createDataFrame(
            rows, "num string, den string, want string"
        )
        bad = df.select(
            _dec_floordiv(
                F.col("num").cast("decimal(38,0)"),
                F.col("den").cast("decimal(38,0)"),
            )
            .cast("string")
            .alias("got"),
            "want",
        ).filter("got <> want")
        assert bad.count() == 0
