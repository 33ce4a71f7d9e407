"""dbt_maxcompute_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of aliyun/dbt-maxcompute.

Layers (SURVEY.md §7):
  session      SparkSession factory (UTC, AQE, dynamic partition overwrite)
  sources      fixture registry, CSV seeds
  functions    the ~25-function scalar/aggregate library (SURVEY §2.6)
  plans        DML planner: merge / delete+insert / insert_overwrite /
               microbatch rewrites on Parquet (SURVEY §4.3)
  materializations  table / view / incremental / snapshot / MV / seed
  operators    scale extensions: dedup, similarity search, text
               analysis, multimodal plumbing
  streaming    Structured Streaming over the events table (extension)
"""

from dbt_maxcompute_spark.session import apply_session_defaults, get_spark

__all__ = ["get_spark", "apply_session_defaults"]
__version__ = "0.1.0"
