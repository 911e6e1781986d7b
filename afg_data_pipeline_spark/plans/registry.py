"""Registry of named declared queries with their DuckDB oracles.

Each entry pairs a PySpark plan builder ``(spark, sf_dir) ->
DataFrame`` with an equivalent ANSI-SQL string the driver runs in
DuckDB over the same parquet (views: region nation customer supplier
part orders lineitem events documents embeddings). Column names are
aliased identically on both sides — the driver's compare sorts
columns by name before hashing.

``oracle=None`` marks genuinely non-SQL-expressible operators
(pandas-UDF KNN imputation, MinHash banding); the driver records a
rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    survey_ops: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    ops: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a declared query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            survey_ops=ops,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco
