"""Sequential-pattern 2-sequences + top event paths
(plans/product_analytics.py)."""

import datetime as dt

from pyspark.sql import functions as F


def _ev(spark, rows):
    # (event_id, user_id, event_type, ts_second)
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(seconds=s), uid, et)
            for eid, uid, et, s in rows
        ],
        ["event_id", "ts", "user_id", "event_type"],
    )


class TestSequencePatterns:
    def _pat(self, spark, rows):
        ev = _ev(spark, rows)
        spans = ev.groupBy("user_id", "event_type").agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        a, b = spans.alias("a"), spans.alias("b")
        out = (
            a.join(
                b,
                (F.col("a.user_id") == F.col("b.user_id"))
                & (
                    F.col("a.event_type")
                    != F.col("b.event_type")
                )
                & (F.col("a.first_ts") < F.col("b.last_ts")),
            )
            .groupBy(
                F.col("a.event_type").alias("antecedent"),
                F.col("b.event_type").alias("consequent"),
            )
            .agg(F.count(F.lit(1)).alias("n_users"))
        )
        return {
            (r.antecedent, r.consequent): r.n_users
            for r in out.collect()
        }

    def test_non_adjacent_counts(self, spark):
        # user 1: a, x, b  -> (a,b) holds even though not adjacent
        rows = [
            (1, 1, "a", 0),
            (2, 1, "x", 10),
            (3, 1, "b", 20),
        ]
        got = self._pat(spark, rows)
        assert got[("a", "b")] == 1
        assert got[("a", "x")] == 1
        assert ("b", "a") not in got

    def test_exists_semantics_not_all(self, spark):
        # user 1: b, a, b -> both (a,b) and (b,a) hold
        rows = [
            (1, 1, "b", 0),
            (2, 1, "a", 10),
            (3, 1, "b", 20),
        ]
        got = self._pat(spark, rows)
        assert got[("a", "b")] == 1
        assert got[("b", "a")] == 1

    def test_simultaneous_not_before(self, spark):
        # strict <: equal timestamps don't count
        rows = [(1, 1, "a", 5), (2, 1, "b", 5)]
        assert self._pat(spark, rows) == {}


class TestTopEventPaths:
    def test_first_five_ordered_with_tiebreak(self, spark):
        from pyspark.sql import Window

        # user 1 has 6 events; two share a timestamp (ids order)
        rows = [
            (10, 1, "a", 0),
            (11, 1, "b", 1),
            (13, 1, "d", 2),  # same ts as id 12 -> id orders
            (12, 1, "c", 2),
            (14, 1, "e", 3),
            (15, 1, "f", 4),  # 6th: dropped
            (20, 2, "a", 0),
        ]
        ev = _ev(spark, rows)
        w = Window.partitionBy("user_id").orderBy(
            "ts", "event_id"
        )
        first5 = ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 5)
        paths = first5.groupBy("user_id").agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("rn", "event_type")
                        )
                    ),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path")
        )
        got = {
            r.user_id: r.path for r in paths.collect()
        }
        assert got[1] == "a>b>c>d>e"
        assert got[2] == "a"
