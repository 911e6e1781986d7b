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


class TestMarkovSteadyState:
    def test_matches_python_replica_and_bounds(self, spark):
        import duckdb

        from afg_data_pipeline_spark.plans import REGISTRY

        rows = REGISTRY["markov_steady_state"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows
        got = {r.event_type: r.steady_prob for r in rows}
        # replica from the same parquet
        con = duckdb.connect()
        trans = con.execute("""
            WITH o AS (SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
                   FROM '/root/testdata/sf0.001/events.parquet')
            SELECT event_type, nxt, count(*) FROM o
            WHERE nxt IS NOT NULL GROUP BY 1, 2
        """).fetchall()
        types = sorted(
            {t for t, _, _ in trans} | {d for _, d, _ in trans}
            | set(got)
        )
        r_tot = {}
        for s, _, c in trans:
            r_tot[s] = r_tot.get(s, 0) + c
        g = 1_000_000_000_000
        v = {t: g // len(types) for t in types}
        for _ in range(20):
            nv = {}
            for s, d, c in trans:
                if s in v:
                    nv[d] = nv.get(d, 0) + (v[s] * c) // r_tot[s]
            v = nv
        want = {t: v.get(t, 0) / g for t in got}
        assert got == want
        # mass bounded by 1 (floors only shed mass)
        assert 0.0 < sum(got.values()) <= 1.0
        for r in rows:
            assert abs(
                r.prob_gap
                - (r.steady_prob - r.empirical_prob)
            ) == 0.0
