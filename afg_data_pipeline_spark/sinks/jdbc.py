"""JDBC sink with the reference's validation/error semantics (S8/S9).

Reference: ingestion.py:20-43 save_to_db — per-table chunked
to_sql(schema='public', if_exists='replace', chunksize=10000) with:
- non-dict input   -> logged error, abort      (ingestion.py:21-23)
- empty dict       -> logged error, abort      (ingestion.py:24-26)
- non-DataFrame    -> logged error, abort; validation happens
  INSIDE the write loop, so tables before the bad entry are
  already written when it aborts       (ingestion.py:29-32)
- per-table write failure -> logged, loop CONTINUES to the
  remaining tables (no ``return`` in the except, 37-38); nothing
  is ever rolled back.
Connection params come from env (S9, ingestion.py:48-57).

Spark mapping: df.write.jdbc with mode('overwrite') ≡
if_exists='replace', batchsize ≡ chunksize, and `truncate` so
overwrite reuses the table (replace semantics without re-deriving
DDL). The writer is injectable so the error-path semantics are
testable without a database.
"""

from __future__ import annotations

import logging
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)


def jdbc_url_from_env(prefix: str = "AFG_DB_") -> str:
    """S9: connection config from environment (.env in the
    reference, ingestion.py:48-57)."""
    host = os.environ.get(f"{prefix}HOST", "localhost")
    port = os.environ.get(f"{prefix}PORT", "5432")
    name = os.environ.get(f"{prefix}NAME", "postgres")
    return f"jdbc:postgresql://{host}:{port}/{name}"


def write_table_jdbc(
    df: DataFrame,
    table: str,
    url: str | None = None,
    schema: str = "public",
    batchsize: int = 10000,
    mode: str = "overwrite",
) -> None:
    """One table -> JDBC, replace-mode, chunked (ingestion.py:35)."""
    (
        df.write.format("jdbc")
        .option("url", url or jdbc_url_from_env())
        .option("dbtable", f"{schema}.{table}")
        .option("user", os.environ.get("AFG_DB_USER", ""))
        .option("password", os.environ.get("AFG_DB_PASSWORD", ""))
        .option("batchsize", str(batchsize))
        .option("truncate", "true")
        .mode(mode)
        .save()
    )


def save_tables(
    data: object,
    writer: Callable[[DataFrame, str], None] = None,
) -> bool:
    """The save_to_db contract (ingestion.py:20-43), faithfully.

    Returns True if every table was written; False on any abort.
    ``writer`` defaults to write_table_jdbc and is injectable for
    tests and for parquet-sink reuse.
    """
    writer = writer or (lambda df, name: write_table_jdbc(df, name))
    if not isinstance(data, dict):
        log.error("save_tables: input is not a dict of DataFrames")
        return False
    if not data:
        log.error("save_tables: empty table dict")
        return False
    ok = True
    for name, df in data.items():
        if not isinstance(df, DataFrame):
            # Validation is part of the write loop (ingestion.py:
            # 29-32): a bad value aborts here, leaving the tables
            # before it written — no upfront sweep, no rollback.
            log.error("save_tables: %r is not a DataFrame", name)
            return False
        try:
            writer(df, name)
            log.info("wrote table %s", name)
        except Exception:  # noqa: BLE001
            # Reference semantics: log and CONTINUE — the except
            # block has no return (ingestion.py:37-38), so later
            # tables still get their write attempt and earlier
            # writes stand.
            log.exception("write failed for table %s; continuing", name)
            ok = False
    return ok
