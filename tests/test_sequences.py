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


class TestSurvivalCurveKm:
    def test_km_matches_lifelines_free_replica(self, spark):
        import datetime as dt
        import math

        from afg_data_pipeline_spark.plans import REGISTRY

        rows = REGISTRY["survival_curve_km"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows, "no KM steps"
        # replicate KM in plain python from the same parquet
        import duckdb

        con = duckdb.connect()
        durs = con.execute("""
            WITH s AS (SELECT user_id, min(ts) s_ts
                       FROM '/root/testdata/sf0.001/events.parquet'
                       WHERE event_type='signup' GROUP BY 1),
            p AS (SELECT e.user_id, min(e.ts) p_ts
                  FROM '/root/testdata/sf0.001/events.parquet' e
                  JOIN s USING (user_id)
                  WHERE e.event_type='purchase' AND e.ts >= s.s_ts
                  GROUP BY 1),
            o AS (SELECT max(ts) end_ts
                  FROM '/root/testdata/sf0.001/events.parquet')
            SELECT date_diff('day', CAST(s.s_ts AS DATE),
                   CAST(COALESCE(p.p_ts, o.end_ts) AS DATE)) t,
                   CASE WHEN p.p_ts IS NULL THEN 0 ELSE 1 END ev
            FROM s LEFT JOIN p USING (user_id), o
        """).fetchall()
        from collections import Counter

        d = Counter()
        c = Counter()
        for t, ev in durs:
            (d if ev else c)[t] += 1
        days = sorted(set(d) | set(c))
        n = len(durs)
        want = {}
        cum_q = 0
        hit_zero = False
        for t in days:
            if d[t] >= n:
                hit_zero = True
            if d[t] > 0:
                if not hit_zero:
                    cum_q += int(round(
                        math.log(1.0 - d[t] / n) * 1e9
                    ))
                s_val = (
                    0.0
                    if hit_zero
                    else round(math.exp(cum_q / 1e9) * 1e9)
                    / 1e9
                )
                want[t] = (n, d[t], c[t], s_val)
            n -= d[t] + c[t]
        got = {
            r.duration_days: (
                r.n_at_risk,
                r.n_events,
                r.n_censored,
                r.survival,
            )
            for r in rows
        }
        assert got == want

    def test_survival_monotone_nonincreasing(self, spark):
        from afg_data_pipeline_spark.plans import REGISTRY

        rows = sorted(
            REGISTRY["survival_curve_km"].fn(
                spark, "/root/testdata/sf0.001"
            ).collect(),
            key=lambda r: r.duration_days,
        )
        vals = [r.survival for r in rows]
        assert all(a >= b for a, b in zip(vals, vals[1:]))
        assert all(0.0 <= v <= 1.0 for v in vals)


class TestEntityResolution:
    def test_transitive_chain_collapses(self, spark):
        from afg_data_pipeline_spark.operators.graph import (
            connected_components,
        )
        from afg_data_pipeline_spark.operators.joins import (
            fuzzy_join_blocked,
        )

        # chain: abcd ~ abce ~ abcf (pairwise dist 1); zzzz isolated
        rows = [
            (1, "abcd"), (2, "abce"), (3, "abcf"), (4, "zzzz"),
            (5, "abcd"),  # exact duplicate of 1 joins via the name
        ]
        p = spark.createDataFrame(rows, ["pk", "name"])
        m = fuzzy_join_blocked(p, p, "name", "name")
        comps = connected_components(
            m, src="name_a", dst="name_b"
        )
        from pyspark.sql import functions as F

        ent = p.join(
            comps, p.name == comps.vertex, "left"
        ).select(
            "pk",
            F.coalesce("component", "name").alias("entity"),
        )
        got = {r.pk: r.entity for r in ent.collect()}
        assert got[1] == got[2] == got[3] == got[5] == "abcd"
        assert got[4] == "zzzz"


class TestSequencePattern3:
    def _pat3(self, spark, rows):
        from pyspark.sql import functions as F

        ev = _ev(spark, rows)
        spans = ev.groupBy("user_id", "event_type").agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        b = ev.select("user_id", "event_type", "ts").alias("b")
        a, c = spans.alias("a"), spans.alias("c")
        triples = (
            b.join(
                a,
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("a.event_type") != F.col("b.event_type"))
                & (F.col("a.first_ts") < F.col("b.ts")),
            )
            .join(
                c,
                (F.col("c.user_id") == F.col("b.user_id"))
                & (F.col("c.event_type") != F.col("b.event_type"))
                & (F.col("c.event_type") != F.col("a.event_type"))
                & (F.col("b.ts") < F.col("c.last_ts")),
            )
            .select(
                F.col("b.user_id").alias("u"),
                F.col("a.event_type").alias("t1"),
                F.col("b.event_type").alias("t2"),
                F.col("c.event_type").alias("t3"),
            )
            .distinct()
        )
        return {
            (r.t1, r.t2, r.t3)
            for r in triples.collect()
        }

    def test_ordered_triple_found_unordered_not(self, spark):
        rows = [
            (1, 1, "a", 0),
            (2, 1, "b", 10),
            (3, 1, "c", 20),
        ]
        got = self._pat3(spark, rows)
        assert ("a", "b", "c") in got
        assert ("c", "b", "a") not in got
        assert ("b", "a", "c") not in got

    def test_non_adjacent_middle(self, spark):
        # a .. x .. b .. y .. c: (a,b,c) holds through gaps
        rows = [
            (1, 1, "a", 0),
            (2, 1, "x", 5),
            (3, 1, "b", 10),
            (4, 1, "y", 15),
            (5, 1, "c", 20),
        ]
        assert ("a", "b", "c") in self._pat3(spark, rows)

    def test_middle_event_must_be_strictly_inside(self, spark):
        # b only BEFORE a and AFTER c -> no a<b<c
        rows = [
            (1, 1, "b", 0),
            (2, 1, "a", 10),
            (3, 1, "c", 20),
            (4, 1, "b", 30),
        ]
        got = self._pat3(spark, rows)
        assert ("a", "b", "c") not in got
        # but c<b ordering means (a, c, b)? a(10)<c(20)<b(30): yes
        assert ("a", "c", "b") in got
