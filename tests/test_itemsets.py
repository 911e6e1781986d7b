"""Market-basket frequent pairs: planted co-occurrences, a-priori
pruning soundness, duplicate-line dedup, lift arithmetic, and the
broadcast plan shape. The registered query additionally proves the
whole pipeline hash-exact against the DuckDB oracle."""

from __future__ import annotations

import pytest

from afg_data_pipeline_spark.operators.itemsets import (
    frequent_item_pairs,
)


def _mine(spark, rows, min_support):
    df = spark.createDataFrame(rows, "b long, i string")
    out = frequent_item_pairs(
        df, basket_col="b", item_col="i", min_support=min_support
    )
    return {
        (r.part_a, r.part_b): (
            r.pair_support,
            r.support_a,
            r.support_b,
            r.lift,
        )
        for r in out.collect()
    }


class TestFrequentItemPairs:
    def test_planted_pairs_and_lift(self, spark):
        # {x,y} together in baskets 1,2,3; z rides along twice but
        # only with x; 4 baskets total.
        rows = [
            (1, "x"), (1, "y"), (1, "z"),
            (2, "x"), (2, "y"),
            (3, "x"), (3, "y"), (3, "z"),
            (4, "z"),
        ]
        got = _mine(spark, rows, min_support=2)
        # supports: x=3, y=3, z=3; pairs: xy=3, xz=2, yz=2
        assert got[("x", "y")] == (3, 3, 3, 3 * 4 / 9)
        assert got[("x", "z")] == (2, 3, 3, 2 * 4 / 9)
        assert got[("y", "z")] == (2, 3, 3, 2 * 4 / 9)
        assert len(got) == 3

    def test_apriori_prunes_rare_items(self, spark):
        # 'rare' appears once — cannot reach pair support 2 even
        # though it co-occurs with x; the pair must not appear.
        rows = [
            (1, "x"), (1, "rare"),
            (2, "x"), (2, "y"),
            (3, "x"), (3, "y"),
        ]
        got = _mine(spark, rows, min_support=2)
        assert set(got) == {("x", "y")}

    def test_duplicate_basket_lines_dedup(self, spark):
        # the same item twice in one basket counts once
        rows = [
            (1, "x"), (1, "x"), (1, "y"),
            (2, "x"), (2, "y"), (2, "y"),
        ]
        got = _mine(spark, rows, min_support=2)
        assert got[("x", "y")][0] == 2
        assert got[("x", "y")][1:3] == (2, 2)

    def test_min_support_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "b long, i string")
        with pytest.raises(ValueError, match="min_support"):
            frequent_item_pairs(
                df, basket_col="b", item_col="i", min_support=0
            )

    def test_frequent_set_broadcast_in_plan(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY
        from tests.conftest import SF_DIR
        from tests.test_plan_shapes import plan_of

        df = REGISTRY["frequent_item_pairs"].fn(spark, SF_DIR)
        plan = plan_of(df)
        # a-priori prune + two support joins + n_baskets are all
        # broadcasts; the only non-broadcast shuffle join is the
        # basket-keyed pair self-join
        assert plan.count("BroadcastHashJoin") >= 3
