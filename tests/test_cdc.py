"""CDC merge operator: latest-wins upsert + tombstone semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from afg_data_pipeline_spark.operators.cdc import merge_latest


def _frames(spark):
    base = spark.createDataFrame(
        [
            (1, 10, "a", "u"),
            (2, 11, "b", "u"),
            (3, 12, "c", "u"),
        ],
        "key long, ver long, val string, op string",
    )
    updates = spark.createDataFrame(
        [
            (1, 20, "a2", "u"),   # overwrite key 1
            (2, 9, "stale", "u"),  # older than base -> ignored
            (3, 21, "gone", "d"),  # tombstone key 3
            (4, 22, "new", "u"),   # brand-new key
        ],
        "key long, ver long, val string, op string",
    )
    return base, updates


class TestMergeLatest:
    def test_latest_wins_and_inserts(self, spark):
        base, updates = _frames(spark)
        got = {
            r["key"]: (r["ver"], r["val"])
            for r in merge_latest(
                base, updates, ["key"], "ver", "ver"
            ).collect()
        }
        assert got == {
            1: (20, "a2"),
            2: (11, "b"),
            3: (21, "gone"),
            4: (22, "new"),
        }

    def test_tombstones_delete_keys(self, spark):
        base, updates = _frames(spark)
        got = {
            r["key"]: r["val"]
            for r in merge_latest(
                base,
                updates,
                ["key"],
                "ver",
                "ver",
                delete_predicate=F.col("op") == "d",
            ).collect()
        }
        assert got == {1: "a2", 2: "b", 4: "new"}

    def test_stale_tombstone_does_not_delete(self, spark):
        base, _ = _frames(spark)
        stale_delete = spark.createDataFrame(
            [(2, 5, "old-del", "d")],
            "key long, ver long, val string, op string",
        )
        got = {
            r["key"]: r["val"]
            for r in merge_latest(
                base,
                stale_delete,
                ["key"],
                "ver",
                "ver",
                delete_predicate=F.col("op") == "d",
            ).collect()
        }
        # The live version is newer than the tombstone -> key stays.
        assert got[2] == "b"


class TestDataQualityChecks:
    def test_planted_violations_detected(self, spark):
        from afg_data_pipeline_spark.operators.quality import (
            accepted_values_check,
            foreign_key_check,
            not_null_check,
            run_checks,
            unique_key_check,
        )

        child = spark.createDataFrame(
            [
                (1, 10, "ok"),
                (1, 11, "ok"),      # duplicate id
                (None, 12, "ok"),   # null id
                (4, 99, "BAD"),     # bad status + orphan fk
            ],
            "id long, fk long, status string",
        )
        parent = spark.createDataFrame(
            [(10,), (11,), (12,)], "pk long"
        )
        report = {
            r["check_name"]: r["violations"]
            for r in run_checks(
                [
                    unique_key_check(child, ["id"], "uniq"),
                    not_null_check(child, "id", "notnull"),
                    accepted_values_check(
                        child, "status", ["ok"], "accepted"
                    ),
                    foreign_key_check(
                        child, parent, "fk", "pk", "fk_orphans"
                    ),
                ]
            ).collect()
        }
        # count_distinct ignores nulls: 4 rows, 2 distinct non-null
        # ids -> 2 "extra" rows (the dup and the null).
        assert report == {
            "uniq": 2,
            "notnull": 1,
            "accepted": 1,
            "fk_orphans": 1,
        }

    def test_clean_data_reports_zero(self, spark):
        from afg_data_pipeline_spark.operators.quality import (
            not_null_check,
            run_checks,
            unique_key_check,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        )
        report = run_checks(
            [
                unique_key_check(df, ["id"], "u"),
                not_null_check(df, "v", "n"),
            ]
        )
        assert all(r["violations"] == 0 for r in report.collect())
