"""distribot_spark — a PySpark-native analytics + flow engine.

A ground-up re-expression of the capabilities of the reference system
(distribot: a Redis/RabbitMQ distributed flow engine, see SURVEY.md) as an
idiomatic Apache Spark engine:

- **Batch analytics surface** (``distribot_spark.queries``): the declared
  query inventory SURVEY.md §2B (Q01–Q40), all built on the DataFrame API so
  Catalyst/AQE do predicate pushdown, join selection, and codegen.
- **Streaming surface** (``distribot_spark.streaming``): S1–S10 on Structured
  Streaming (windows, watermarks, dedup, stream joins, stateful ops).
- **LLM-data-pipeline operators** (``distribot_spark.operators``): dedup
  (exact/MinHash/SimHash/Jaccard), similarity search, text analysis,
  multimodal binary columns — designed for 100 TB scale.
- **Flow engine** (``distribot_spark.flow``): the distribot-equivalent
  workflow orchestrator (flows/phases/handlers/transitions) re-built on
  Spark jobs + parquet state tables. Reference: /root/reference/lib/distribot.
"""

from distribot_spark.session import get_spark
from distribot_spark.catalog import load_table, register_views
from distribot_spark.sql import run_sql

__version__ = "0.1.0"

__all__ = ["get_spark", "load_table", "register_views", "run_sql", "__version__"]
