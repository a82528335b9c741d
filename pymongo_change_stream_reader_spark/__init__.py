"""PySpark-native analytics + CDC-relay engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference CDC relay ``evgenii-m6/pymongo-change-stream-reader`` (see
SURVEY.md): a Structured-Streaming change-event pipeline
(filter -> envelope -> dynamic-topic Kafka sink with checkpointed
at-least-once delivery) plus the full batch relational surface, a
MongoDB aggregation-pipeline translator, and large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Design rules (enforced throughout):
- DataFrame/SQL first; Catalyst owns optimization.
- No row-at-a-time Python UDFs on hot paths; Pandas UDFs only where
  built-ins genuinely cannot express the semantics.
- Every operator is written for a 1000-executor / 100 TB deployment
  even though tests run on ``local[*]``: broadcast small dims, avoid
  needless shuffles, keep filters/pruning pushed to the scan.
"""

from pymongo_change_stream_reader_spark.session import get_spark
from pymongo_change_stream_reader_spark.sources.tables import TABLES, load_table

__all__ = ["get_spark", "TABLES", "load_table"]

__version__ = "0.1.0"
