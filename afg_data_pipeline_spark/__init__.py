"""afg_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the full query/data-processing surface of the reference
project ``mespinoza8/AFG-Data-Pipeline`` (a pandas ETL pipeline; see
/root/repo/SURVEY.md for the operator inventory with file:line
citations) as an idiomatic Spark DataFrame/SQL library, extended with
scale-ready LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) and Structured Streaming windows.

Design rules (SURVEY.md §7):
- explicit StructType schemas everywhere (the reference infers);
- long-form tables internally, pivot only at the edge;
- declarative DataFrame plans -> Catalyst handles pushdown/pruning/
  join strategy; pandas UDFs only where built-ins can't express the
  semantics (KNN imputation, multimodal decode).
"""

from afg_data_pipeline_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
