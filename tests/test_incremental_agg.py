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
