"""Scheme-aware store probe (fs.store_exists): must agree with the
filesystem the path's scheme names — in particular a ``file://`` URI
that os.path.exists can NEVER see (the silent-wrong-at-scale class
that hit streaming/drift.py in r7 and streaming/dsir.py +
streaming/incremental_dedup.py in r8: every batch scored against an
empty prior, no error)."""

from __future__ import annotations

import os


class TestStoreExists:
    def test_plain_local_path(self, spark, tmp_path):
        from afg_data_pipeline_spark.fs import store_exists

        d = tmp_path / "store"
        assert not store_exists(spark, str(d))
        d.mkdir()
        assert store_exists(spark, str(d))

    def test_delete_path_recursive_and_scheme_aware(
        self, spark, tmp_path
    ):
        from afg_data_pipeline_spark.fs import (
            delete_path,
            store_exists,
        )

        d = tmp_path / "store" / "batch_id=3"
        d.mkdir(parents=True)
        (d / "part-0.parquet").write_bytes(b"x")
        uri = "file://" + str(d)
        assert delete_path(spark, uri) is True
        assert not d.exists()
        assert not store_exists(spark, uri)
        # deleting a missing path reports False, never raises
        assert delete_path(spark, uri) is False

    def test_file_uri_where_os_path_exists_is_blind(
        self, spark, tmp_path
    ):
        from afg_data_pipeline_spark.fs import store_exists

        d = tmp_path / "store"
        d.mkdir()
        uri = "file://" + str(d)
        # the bug class: the driver-local probe says absent...
        assert not os.path.exists(uri)
        # ...while the scheme-aware probe (and spark.read) see it.
        assert store_exists(spark, uri)
        assert not store_exists(spark, "file://" + str(tmp_path / "no"))
