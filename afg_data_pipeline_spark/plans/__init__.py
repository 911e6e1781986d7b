"""Declared-query registry: every SURVEY.md §2 operator lands here.

Importing this package registers all query modules; the driver
contract (__spark_entry__.py) re-exports REGISTRY as queries() /
oracle_sql().
"""

from afg_data_pipeline_spark.plans.registry import REGISTRY, Query, register

# Import for side effect: each module registers its queries.
from afg_data_pipeline_spark.plans import (  # noqa: F401, E402
    relational,
    aggregates,
    windows,
    reference_semantics,
    llm_ops,
    streaming_batch,
    extended,
    classics,
    product_analytics,
    corpus_ops,
    clustering,
    mlops,
)

__all__ = ["REGISTRY", "Query", "register"]
