"""S8/S9 JDBC sink: env-config unit tests + a live round-trip.

The live test uses DuckDB's JDBC driver (org.duckdb:duckdb_jdbc, a
public Maven artifact) if a copy can be found on this machine —
located via the AFG_JDBC_JAR env var or a glob over the local
artifact caches — and skips otherwise, so the suite stays green in
environments without the jar. It runs in a subprocess because the
driver jar must be on the JVM's system classpath at launch for
java.sql.DriverManager auto-registration (the shared test session
has already started without it).

Reference: ingestion.py:20-43 (save_to_db), ingestion.py:48-57
(env-driven connection config).
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

from afg_data_pipeline_spark.sinks.jdbc import jdbc_url_from_env

REPO = Path(__file__).resolve().parent.parent


class TestJdbcUrlFromEnv:
    """S9: connection params from environment (ingestion.py:48-57)."""

    def test_defaults(self, monkeypatch):
        for k in ("AFG_DB_HOST", "AFG_DB_PORT", "AFG_DB_NAME"):
            monkeypatch.delenv(k, raising=False)
        assert jdbc_url_from_env() == "jdbc:postgresql://localhost:5432/postgres"

    def test_env_overrides(self, monkeypatch):
        monkeypatch.setenv("AFG_DB_HOST", "db.example.invalid")
        monkeypatch.setenv("AFG_DB_PORT", "5433")
        monkeypatch.setenv("AFG_DB_NAME", "afg")
        assert (
            jdbc_url_from_env()
            == "jdbc:postgresql://db.example.invalid:5433/afg"
        )

    def test_custom_prefix(self, monkeypatch):
        monkeypatch.setenv("OTHER_HOST", "h")
        monkeypatch.setenv("OTHER_PORT", "1")
        monkeypatch.setenv("OTHER_NAME", "n")
        assert jdbc_url_from_env("OTHER_") == "jdbc:postgresql://h:1/n"


def _find_duckdb_jdbc_jar() -> Path | None:
    explicit = os.environ.get("AFG_JDBC_JAR")
    if explicit and Path(explicit).is_file():
        return Path(explicit)
    for root in (
        Path.home() / ".cache",
        Path.home() / ".m2",
        Path.home() / ".ivy2",
    ):
        if not root.is_dir():
            continue
        hits = sorted(root.rglob("duckdb_jdbc-*.jar"))
        if hits:
            return hits[0]
    return None


_ROUNDTRIP_SCRIPT = r"""
import sys

jar, dbfile, repo = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)

import duckdb

# Pre-create the 'public' schema the sink targets (schema='public'
# mirrors pandas to_sql(schema='public'), ingestion.py:35); DuckDB
# only has 'main' by default. The tables are pre-created too:
# Spark's table-existence probe treats a failure as "absent" only
# when the dialect's isObjectNotFoundException recognizes the
# SQLState, which the generic dialect does not for DuckDB — with
# the table present, the overwrite+truncate path (probe -> TRUNCATE
# -> batched INSERT) runs, which is the path under test.
con = duckdb.connect(dbfile)
con.execute("CREATE SCHEMA IF NOT EXISTS public")
for t in ("people", "people_copy"):
    con.execute(
        f"CREATE TABLE IF NOT EXISTS public.{t} "
        "(id INTEGER, name VARCHAR, score DOUBLE)"
    )
con.close()

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("jdbc-roundtrip")
    .config("spark.driver.extraClassPath", jar)
    .config("spark.executor.extraClassPath", jar)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

from afg_data_pipeline_spark.sinks.jdbc import save_tables, write_table_jdbc

url = f"jdbc:duckdb:{dbfile}"
df = spark.createDataFrame(
    [(1, "ana", 1.5), (2, "bo", 2.5), (3, "cy", None)],
    "id INT, name STRING, score DOUBLE",
)
writer = lambda d, name: write_table_jdbc(d, name, url=url, batchsize=2)

ok = save_tables({"people": df, "people_copy": df}, writer=writer)
print("SAVE_OK" if ok else "SAVE_FAIL")

# Replace semantics: a second save must not append (if_exists=
# 'replace' in the reference; overwrite+truncate here).
ok2 = save_tables({"people": df}, writer=writer)
print("RESAVE_OK" if ok2 else "RESAVE_FAIL")

back = (
    spark.read.format("jdbc")
    .option("url", url)
    .option("dbtable", "public.people")
    .load()
)
rows = sorted((r["id"], r["name"], r["score"]) for r in back.collect())
print("READBACK", rows)
spark.stop()

# Independent verification through the native duckdb client.
con = duckdb.connect(dbfile)
n1 = con.execute("SELECT count(*) FROM public.people").fetchone()[0]
n2 = con.execute("SELECT count(*) FROM public.people_copy").fetchone()[0]
con.close()
print("NATIVE", n1, n2)
"""


class TestJdbcLiveRoundtrip:
    """S8 against a real database: Spark -> DuckDB JDBC -> Spark."""

    def test_roundtrip_replace_and_readback(self, tmp_path):
        jar = _find_duckdb_jdbc_jar()
        if jar is None:
            pytest.skip("no duckdb_jdbc jar available on this machine")
        dbfile = tmp_path / "sink.duckdb"
        script = tmp_path / "roundtrip.py"
        script.write_text(_ROUNDTRIP_SCRIPT)
        proc = subprocess.run(
            [sys.executable, str(script), str(jar), str(dbfile), str(REPO)],
            capture_output=True,
            text=True,
            timeout=300,
        )
        out = proc.stdout
        assert proc.returncode == 0, f"stdout={out}\nstderr={proc.stderr[-3000:]}"
        assert "SAVE_OK" in out
        assert "RESAVE_OK" in out
        assert "READBACK [(1, 'ana', 1.5), (2, 'bo', 2.5), (3, 'cy', None)]" in out
        # 3 rows each; replace (not append) after the second save.
        assert "NATIVE 3 3" in out
