"""Incremental aggregate maintenance: recompute-equality on
pseudorandom CDC batches (the abelian-group property the operator
rests on), delete-to-zero key retirement, new-key inserts, update
as D+I, and the loud unknown-op contract. The registered query
additionally proves incremental == full recompute hash-exact
against the DuckDB oracle."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.cdc import (
    incremental_agg_apply,
)


def _apply(spark, base_rows, delta_rows):
    base = spark.createDataFrame(
        base_rows, "k string, total long, n_rows long"
    )
    delta = spark.createDataFrame(
        delta_rows, "k string, v long, op string"
    )
    out = incremental_agg_apply(
        base, delta, keys=["k"], sum_cols={"total": "v"}
    )
    return {
        r["k"]: (r["total"], r["n_rows"]) for r in out.collect()
    }


class TestIncrementalAgg:
    def test_matches_recompute_on_pseudorandom_batches(self, spark):
        # seeded event stream: 300 inserts over 20 keys, then a
        # delta batch that deletes a third and inserts more
        events = []
        for i in range(300):
            h = hashlib.md5(f"ev|{i}".encode()).digest()
            events.append(
                (f"k{h[0] % 20}", (h[1] % 100) - 50)
            )
        base_events = events[:200]
        state: dict[str, list[int]] = defaultdict(list)
        for k, v in base_events:
            state[k].append(v)
        base_rows = [
            (k, sum(vs), len(vs)) for k, vs in state.items()
        ]
        delta_rows = [
            (k, v, "I") for k, v in events[200:]
        ] + [
            (k, v, "D") for k, v in base_events[::3]
        ]
        # python recompute of the final state
        for k, v in events[200:]:
            state[k].append(v)
        for k, v in base_events[::3]:
            state[k].remove(v)
        want = {
            k: (sum(vs), len(vs))
            for k, vs in state.items()
            if vs
        }
        assert _apply(spark, base_rows, delta_rows) == want

    def test_delete_to_zero_retires_key(self, spark):
        got = _apply(
            spark,
            [("a", 10, 2), ("b", 7, 1)],
            [("a", 4, "D"), ("a", 6, "D")],
        )
        assert got == {"b": (7, 1)}

    def test_new_key_insert_and_update_as_d_plus_i(self, spark):
        got = _apply(
            spark,
            [("a", 10, 2)],
            [("c", 5, "I"), ("a", 4, "D"), ("a", 9, "I")],
        )
        assert got == {"a": (15, 2), "c": (5, 1)}

    def test_unknown_op_raises(self, spark):
        base = spark.createDataFrame(
            [("a", 1, 1)], "k string, total long, n_rows long"
        )
        delta = spark.createDataFrame(
            [("a", 1, "UPSERT")], "k string, v long, op string"
        )
        out = incremental_agg_apply(
            base, delta, keys=["k"], sum_cols={"total": "v"}
        )
        with pytest.raises(Exception, match="unknown CDC op"):
            out.collect()

    def test_join_delta_decomposition_equals_full_minus_base(
        self, spark
    ):
        # A = A0 ∪ dA on key%3, B = B0 ∪ dB on val%2; the operator
        # must produce exactly (A⋈B) \ (A0⋈B0) as a multiset.
        from afg_data_pipeline_spark.operators.cdc import (
            join_insert_deltas,
        )

        left = spark.createDataFrame(
            [(i % 7, f"l{i}") for i in range(40)], "k long, lv string"
        )
        right = spark.createDataFrame(
            [(i % 7, i) for i in range(30)], "rk long, rv long"
        )
        a0 = left.filter(F.col("k") % 3 != 0)
        da = left.filter(F.col("k") % 3 == 0)
        b0 = right.filter(F.col("rv") % 2 != 0)
        db = right.filter(F.col("rv") % 2 == 0)
        got = sorted(
            (r["lv"], r["rv"])
            for r in join_insert_deltas(
                a0, da, b0, db, on=[("k", "rk")]
            ).collect()
        )
        full = sorted(
            (r["lv"], r["rv"])
            for r in left.join(
                right, left["k"] == right["rk"]
            ).collect()
        )
        base = sorted(
            (r["lv"], r["rv"])
            for r in a0.join(b0, a0["k"] == b0["rk"]).collect()
        )
        want = list(full)
        for row in base:
            want.remove(row)
        assert got == sorted(want)
        with pytest.raises(ValueError, match="join key pairs"):
            join_insert_deltas(a0, da, b0, db, on=[])
        with pytest.raises(ValueError, match="disjoint"):
            join_insert_deltas(a0, da, a0, da, on=[("k", "k")])

    def test_join_delta_terms_broadcast_the_delta_side(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY
        from tests.conftest import SF_DIR
        from tests.test_plan_shapes import plan_of

        df = REGISTRY["incremental_join_maintenance"].fn(
            spark, SF_DIR
        )
        plan = plan_of(df)
        # all three delta terms are broadcast-hash joins; no
        # nested-loop fallback anywhere in the maintenance path
        assert plan.count("BroadcastHashJoin") >= 3
        assert "BroadcastNestedLoopJoin" not in plan

    def test_config_validation(self, spark):
        base = spark.createDataFrame(
            [("a", 1, 1)], "k string, total long, n_rows long"
        )
        delta = spark.createDataFrame(
            [("a", 1, "I")], "k string, v long, op string"
        )
        with pytest.raises(ValueError, match="at least one"):
            incremental_agg_apply(base, delta, ["k"], {})
        with pytest.raises(ValueError, match="collides"):
            incremental_agg_apply(
                base, delta, ["k"], {"n_rows": "v"}
            )
