"""bigdatapipelne_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference repo jvjfranca/bigdatapipelne (a Kinesis/Glue/Flink/DynamoDB
card-transaction pipeline — see SURVEY.md), built Spark-first:

- batch medallion pipeline (raw JSON -> stage parquet -> spec mart) as
  declarative DataFrame transforms (reference: glue_scripts/stage.py,
  glue_scripts/spec.py),
- streaming windowed fraud detection as Structured Streaming
  (reference: flink_app/app.py:47-83),
- a keyed serving layer with TTL semantics (reference:
  lambda_app/consumer/function.py, lambda_app/api/function.py),
- plus large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB inputs.

Everything is the DataFrame/SQL API so Catalyst handles pushdown, pruning,
partial aggregation and join strategy selection; Python UDFs appear only in
the multimodal decode stubs (Arrow-batched).
"""

from bigdatapipelne_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
