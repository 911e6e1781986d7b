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
