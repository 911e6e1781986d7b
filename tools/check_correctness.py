"""Local replica of the driver's oracle-compare harness.

Runs every registered query on Spark and its oracle on DuckDB over
the same sf dir, then compares row count, column names, and an
order-insensitive exact value comparison (sorted rows of stringified
cells). Stricter than the driver is likely to be — floats must match
bit-for-bit — so passing here means passing there.

The Spark session runs with ``spark.sql.ansi.enabled=true`` by
default — DRIVER PARITY: the driver supplies its own Spark 4
session (ANSI on by default), and round 3's only red row was an
ANSI-only overflow that the engine's ANSI-off session masked
locally. Set AFG_ANSI=0 to sweep under the engine default instead.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_cell(row[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from afg_data_pipeline_spark.plans import REGISTRY
    from afg_data_pipeline_spark.session import get_session

    spark = get_session("check-correctness")
    ansi = os.environ.get("AFG_ANSI", "1") != "0"
    spark.conf.set("spark.sql.ansi.enabled", str(ansi).lower())
    print(f"spark.sql.ansi.enabled={ansi} (driver default: true)")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            spark_rows = df.collect()
            spark_cols = df.columns
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(f"{name}: SPARK ERROR {e}")
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if q.oracle is None:
            n_rows_only += 1
            print(
                f"rows  {name}: {len(spark_rows)} rows "
                f"({time.time() - t0:.1f}s, no oracle)"
            )
            continue
        try:
            res = con.execute(q.oracle)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(f"{name}: DUCKDB ERROR {e}")
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(
                f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}"
            )
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(
                f"columns spark={sorted(spark_cols)} "
                f"duck={sorted(duck_cols)}"
            )
        if not problems:
            s = _normalize(spark_rows, spark_cols)
            d = _normalize(duck_rows, duck_cols)
            if s != d:
                diff_n = sum(1 for a, b in zip(s, d) if a != b)
                problems.append(f"values differ in ~{diff_n} rows")
                for a, b in zip(s, d):
                    if a != b:
                        problems.append(f"  spark={a}")
                        problems.append(f"  duck ={b}")
                        break
        if problems:
            n_fail += 1
            failures.append(f"{name}: " + "; ".join(problems[:3]))
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(
                f"ok    {name}: {len(spark_rows)} rows "
                f"({time.time() - t0:.1f}s)"
            )

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"(sf_dir={sf_dir})"
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
