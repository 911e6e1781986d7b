"""SQ8 scalar quantization (operators/sq.py)."""

import random

from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.sq import (
    CODE_MAX,
    QUANT,
    sq8_codes,
    sq8_topk,
    sq8_train_bounds,
)


def _mk_corpus(n, d, seed=7):
    rng = random.Random(seed)
    return [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(d)])
        for i in range(n)
    ]


def _py_codes(vecs, d):
    q = [
        [round(v * QUANT) for v in vec] for _, vec in vecs
    ]
    mins = [min(r[i] for r in q) for i in range(d)]
    spans = [
        max(max(r[i] for r in q) - mins[i], 1) for i in range(d)
    ]
    return {
        vid: [
            min(
                max(((r[i] - mins[i]) * CODE_MAX) // spans[i], 0),
                CODE_MAX,
            )
            for i in range(d)
        ]
        for (vid, _), r in zip(vecs, q)
    }


class TestSQ8:
    def test_codes_match_python_replica(self, spark):
        d = 8
        data = _mk_corpus(20, d)
        df = spark.createDataFrame(data, ["vec_id", "embedding"])
        bounds = sq8_train_bounds(df, dim=d)
        got = {
            r.id: list(r.codes)
            for r in sq8_codes(df, bounds, out_id="id").collect()
        }
        assert got == _py_codes(data, d)

    def test_topk_matches_replica_distances(self, spark):
        d = 8
        data = _mk_corpus(30, d)
        df = spark.createDataFrame(data, ["vec_id", "embedding"])
        out = sq8_topk(
            None,
            df,
            k=3,
            dim=d,
            query_filter=F.col("neighbor_id") < 4,
        ).collect()
        codes = _py_codes(data, d)
        for qid in range(4):
            dists = sorted(
                (
                    sum(
                        (a - b) ** 2
                        for a, b in zip(codes[qid], codes[nid])
                    ),
                    nid,
                )
                for nid in codes
                if nid != qid
            )[:3]
            got = sorted(
                (r.sqdist, r.neighbor_id)
                for r in out
                if r.query_id == qid
            )
            assert got == dists, qid

    def test_external_query_clamps(self, spark):
        d = 4
        corpus = spark.createDataFrame(
            _mk_corpus(10, d), ["vec_id", "embedding"]
        )
        queries = spark.createDataFrame(
            [(100, [9.0] * d), (101, [-9.0] * d)],
            ["vec_id", "embedding"],
        )
        bounds = sq8_train_bounds(corpus, dim=d)
        qc = {
            r.id: list(r.codes)
            for r in sq8_codes(
                queries, bounds, out_id="id"
            ).collect()
        }
        assert qc[100] == [CODE_MAX] * d
        assert qc[101] == [0] * d

    def test_constant_dim_code_zero(self, spark):
        df = spark.createDataFrame(
            [(0, [0.5, 1.0]), (1, [0.5, 2.0])],
            ["vec_id", "embedding"],
        )
        bounds = sq8_train_bounds(df, dim=2)
        codes = {
            r.id: list(r.codes)
            for r in sq8_codes(df, bounds, out_id="id").collect()
        }
        assert codes[0][0] == 0 and codes[1][0] == 0
        assert codes[0][1] == 0 and codes[1][1] == CODE_MAX

    def test_recall_vs_exact_grid_l2(self, spark):
        # SQ8 keeps per-dim structure: recall@5 against exact
        # 1e-6-grid L2 should be high on a random corpus
        d = 16
        data = _mk_corpus(200, d, seed=11)
        df = spark.createDataFrame(data, ["vec_id", "embedding"])
        out = sq8_topk(
            None,
            df,
            k=5,
            dim=d,
            query_filter=F.col("neighbor_id") < 8,
        ).collect()
        grid = {
            vid: [round(v * QUANT) for v in vec]
            for vid, vec in data
        }
        hits = total = 0
        for qid in range(8):
            exact = {
                nid
                for _, nid in sorted(
                    (
                        sum(
                            (a - b) ** 2
                            for a, b in zip(grid[qid], grid[nid])
                        ),
                        nid,
                    )
                    for nid in grid
                    if nid != qid
                )[:5]
            }
            got = {
                r.neighbor_id for r in out if r.query_id == qid
            }
            hits += len(exact & got)
            total += 5
        assert hits / total >= 0.7, hits / total
