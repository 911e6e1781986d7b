"""sf1 scale-validation sweep of the heavy pipelines.

The driver ships sf0.001/0.01/0.1 only; the scale claims of the
dedup/ANN pipelines bind where the per-query scheduling floor stops
dominating, so this tool derives a deterministic sf1 from sf0.1
(10× the documents/embeddings rows) and runs the heavy queries
Spark-vs-DuckDB, min-of-3 each, at that scale.

Derivation (seedless, reproducible): shard k ∈ 0..9 copies every
sf0.1 row with
  doc_id/vec_id -> id + k * ceil_pow10(max_id + 1)
  text          -> text || ' shardK'   (keeps docs distinct so the
                   dedup pipelines see realistic near-dup structure
                   instead of 10 exact copies of everything)
  embedding     -> component 0 += k * 1e-3 (distinct vectors, same
                   distribution shape)
Shard 0 is byte-identical to sf0.1. Only documents + embeddings are
scaled — the heavy pipelines read nothing else.

Usage: python tools/bench_sf1.py [outdir] [query ...]
Writes parquet under outdir (default /tmp/afg_sf1), prints one JSON
row per query and a total row (same format as bench_compare.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

HEAVY = [
    "minhash_near_dup",
    "embedding_near_dup_lsh",
    "near_dup_components",
    "near_dup_components_star",
    "ngram_jaccard_dups",
    "pack_token_stream",
]

N_SHARDS = 10


def build_sf1(spark, src_dir: str, out_dir: str) -> None:
    """Materialize the 10× documents/embeddings tables (idempotent:
    skips tables whose parquet already exists)."""
    import pyspark.sql.functions as F

    docs_path = os.path.join(out_dir, "documents.parquet")
    emb_path = os.path.join(out_dir, "embeddings.parquet")

    if not os.path.exists(docs_path):
        docs = spark.read.parquet(f"{src_dir}/documents.parquet")
        max_id = docs.agg(F.max("doc_id")).collect()[0][0]
        stride = 10 ** len(str(max_id))
        shards = spark.range(N_SHARDS).select(
            F.col("id").alias("__shard")
        )
        big = (
            docs.crossJoin(F.broadcast(shards))
            .withColumn(
                "doc_id",
                F.col("doc_id") + F.col("__shard") * F.lit(stride),
            )
            .withColumn(
                "text",
                F.when(
                    F.col("__shard") == 0, F.col("text")
                ).otherwise(
                    F.concat(
                        F.col("text"),
                        F.lit(" shard"),
                        F.col("__shard").cast("string"),
                    )
                ),
            )
            .drop("__shard")
        )
        big.repartition(32).write.mode("overwrite").parquet(docs_path)

    if not os.path.exists(emb_path):
        emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
        max_id = emb.agg(F.max("vec_id")).collect()[0][0]
        stride = 10 ** len(str(max_id))
        shards = spark.range(N_SHARDS).select(
            F.col("id").alias("__shard")
        )
        big = (
            emb.crossJoin(F.broadcast(shards))
            .withColumn(
                "vec_id",
                F.col("vec_id") + F.col("__shard") * F.lit(stride),
            )
            .withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (
                            F.element_at("embedding", 1)
                            + F.col("__shard").cast("float")
                            * F.lit(0.001)
                        ).cast("float")
                    ),
                    F.slice(
                        "embedding", 2, 10**6
                    ),
                ),
            )
            .drop("__shard")
        )
        big.repartition(32).write.mode("overwrite").parquet(emb_path)

    # The remaining star tables are read by read_star_table for some
    # plans' session setup; symlink them so the sf_dir is complete.
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{src_dir}/{t}.parquet", dst)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/afg_sf1"
    only = set(sys.argv[2:]) or set(HEAVY)
    src_dir = "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)

    from afg_data_pipeline_spark.plans import REGISTRY
    from afg_data_pipeline_spark.session import get_session

    spark = get_session("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark, src_dir, out_dir)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        path = f"{out_dir}/{t}.parquet"
        # Spark writes multi-part directories; DuckDB needs the glob.
        if os.path.isdir(path) and not os.path.islink(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{path}'"
        )

    rows = []
    for name in HEAVY:
        if name not in only or name not in REGISTRY:
            continue
        q = REGISTRY[name]
        spark_s = float("inf")
        for _ in range(3):
            t0 = time.time()
            q.fn(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark_s = min(spark_s, time.time() - t0)
        duck_s = float("inf")
        if q.oracle is not None:
            for _ in range(3):
                t0 = time.time()
                con.execute(q.oracle).fetchall()
                duck_s = min(duck_s, time.time() - t0)
        rows.append(
            {
                "query": name,
                "spark_s": round(spark_s, 3),
                "duck_s": round(duck_s, 3)
                if duck_s != float("inf")
                else None,
                "ratio": round(spark_s / duck_s, 2)
                if 0 < duck_s != float("inf")
                else None,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    tot_s = sum(r["spark_s"] for r in rows)
    tot_d = sum(r["duck_s"] or 0 for r in rows)
    print(
        json.dumps(
            {
                "sf": 1.0,
                "total_spark_s": round(tot_s, 2),
                "total_duck_s": round(tot_d, 2),
                "total_ratio": round(tot_s / tot_d, 2)
                if tot_d
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
