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


class TestSnapshotDiff:
    def _diff(self, spark, old_rows, new_rows):
        from afg_data_pipeline_spark.operators.cdc import (
            snapshot_diff,
        )

        old = spark.createDataFrame(
            old_rows, "k long, v long, s string"
        )
        new = spark.createDataFrame(
            new_rows, "k long, v long, s string"
        )
        return {
            r.k: (r.op, r.old_v, r.new_v, r.old_s, r.new_s)
            for r in snapshot_diff(
                old, new, keys=["k"], compare_cols=["v", "s"]
            ).collect()
        }

    def test_insert_update_delete_classified(self, spark):
        got = self._diff(
            spark,
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
            [(1, 10, "a"), (2, 25, "b"), (4, 40, "d")],
        )
        # 1 unchanged -> absent; 2 value change -> U; 3 only in
        # old -> D; 4 only in new -> I
        assert got == {
            2: ("U", 20, 25, "b", "b"),
            3: ("D", 30, None, "c", None),
            4: ("I", None, 40, None, "d"),
        }

    def test_null_transitions_are_updates(self, spark):
        got = self._diff(
            spark,
            [(1, None, "a"), (2, 5, "b")],
            [(1, 7, "a"), (2, 5, None)],
        )
        assert got == {
            1: ("U", None, 7, "a", "a"),
            2: ("U", 5, 5, "b", None),
        }

    def test_reconstruction_round_trip(self, spark):
        # old + changelog == new: delete D/U keys from old, add
        # I/U new-images
        import hashlib

        old_rows = []
        new_rows = []
        for i in range(200):
            h = hashlib.md5(f"s|{i}".encode()).digest()
            row = (i, h[0] % 50, f"s{h[1] % 5}")
            if h[2] % 4 != 0:
                old_rows.append(row)
            if h[3] % 5 != 0:
                new_rows.append(
                    (i, row[1] + (h[4] % 3), row[2])
                )
        diff = self._diff(spark, old_rows, new_rows)
        state = {k: (v, s) for k, v, s in old_rows}
        for k, (op, _ov, nv, _os, ns) in diff.items():
            if op == "D":
                del state[k]
            else:
                state[k] = (nv, ns)
        assert state == {k: (v, s) for k, v, s in new_rows}

    def test_validation(self, spark):
        import pytest

        from afg_data_pipeline_spark.operators.cdc import (
            snapshot_diff,
        )

        df = spark.createDataFrame([(1, 2)], "k long, v long")
        with pytest.raises(ValueError, match="non-empty"):
            snapshot_diff(df, df, keys=[], compare_cols=["v"])
        with pytest.raises(ValueError, match="overlap"):
            snapshot_diff(df, df, keys=["k"], compare_cols=["k"])


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
