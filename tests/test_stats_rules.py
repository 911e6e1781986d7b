"""Chi-square independence + association rules (plans)."""

from pyspark.sql import functions as F


class TestChiSquare:
    def _chi2(self, spark, rows):
        cells = (
            spark.createDataFrame(rows, ["a", "b"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("observed"))
        )
        rt = cells.groupBy("a").agg(
            F.sum("observed").alias("rtot")
        )
        ct = cells.groupBy("b").agg(
            F.sum("observed").alias("ctot")
        )
        tot = cells.agg(F.sum("observed").alias("n"))
        e = (
            F.col("rtot").cast("double")
            * F.col("ctot").cast("double")
            / F.col("n").cast("double")
        )
        cq = F.round(
            (F.col("observed").cast("double") - e) ** 2
            / e
            * 1e6
        ).cast("bigint")
        grid = (
            rt.crossJoin(F.broadcast(ct))
            .join(F.broadcast(cells), ["a", "b"], "left")
            .withColumn(
                "observed",
                F.coalesce(F.col("observed"), F.lit(0)),
            )
        )
        out = (
            grid.crossJoin(F.broadcast(tot))
            .agg(
                (F.sum(cq).cast("double") / 1e6).alias("chi2")
            )
            .collect()[0]
        )
        return out.chi2

    def test_perfectly_independent_is_zero(self, spark):
        # every (a, b) combination equally frequent
        rows = [
            (a, b) for a in "xy" for b in "uv" for _ in range(5)
        ]
        assert self._chi2(spark, rows) == 0.0

    def test_perfectly_dependent_equals_n(self, spark):
        # 2x2 diagonal: chi2 == n
        rows = [("x", "u")] * 10 + [("y", "v")] * 10
        assert self._chi2(spark, rows) == 20.0


class TestAssociationRules:
    def test_directions_differ_by_support(self, spark):
        from afg_data_pipeline_spark.operators.itemsets import (
            frequent_item_pairs,
        )

        # item 1 in 4 baskets, item 2 in 2; pair {1,2} in 2
        rows = [
            (1, 1), (1, 2),
            (2, 1), (2, 2),
            (3, 1),
            (4, 1),
        ]
        baskets = spark.createDataFrame(
            rows, ["basket", "item"]
        )
        pairs = frequent_item_pairs(
            baskets, "basket", "item", min_support=2
        ).collect()
        assert len(pairs) == 1
        p = pairs[0]
        # confidence(1 -> 2) = 2/4; confidence(2 -> 1) = 2/2
        assert p.pair_support == 2
        assert {p.support_a, p.support_b} == {4, 2}
        # lift = 2 * 4 / (4 * 2) = 1.0
        assert p.lift == 1.0
