"""Markov transition matrix (plans/product_analytics.py)."""

from pyspark.sql import functions as F


def _run(spark, rows):
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type"]
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = t.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return {
        (r.from_type, r.to_type): (r.n, r.tot)
        for r in t.join(F.broadcast(tot), "from_type").collect()
    }


class TestTransitionMatrix:
    def test_planted_chain(self, spark):
        # user 1: a->b->a->c ; user 2: b->a
        rows = [
            (1, 1, "a"),
            (1, 2, "b"),
            (1, 3, "a"),
            (1, 4, "c"),
            (2, 1, "b"),
            (2, 2, "a"),
        ]
        got = _run(spark, rows)
        assert got[("a", "b")] == (1, 2)
        assert got[("a", "c")] == (1, 2)
        assert got[("b", "a")] == (2, 2)
        assert ("c", "a") not in got  # last events emit nothing

    def test_single_event_user_contributes_nothing(self, spark):
        got = _run(spark, [(1, 1, "a"), (2, 1, "b")])
        assert got == {}

    def test_probabilities_sum_to_one_per_row(self, spark):
        rows = [
            (u, i, t)
            for u in range(5)
            for i, t in enumerate("abcab")
        ]
        got = _run(spark, rows)
        by_from = {}
        for (f, _), (n, tot) in got.items():
            by_from.setdefault(f, [0, tot])[0] += n
        for f, (s, tot) in by_from.items():
            assert s == tot, f
