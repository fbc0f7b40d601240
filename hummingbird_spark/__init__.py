"""hummingbird_spark — a PySpark-native rebuild of the capabilities of
simagix/hummingbird (reference: /root/reference, Go).

The reference is a MongoDB live-migration engine: partitioned bulk copy,
predicate filtering, PII masking, CDC capture/replay, validation compare,
plus a workload simulator. This package re-expresses every one of those
capabilities Spark-first (DataFrame / SQL / Structured Streaming) and adds
the analytics surface a large-scale training-data pipeline needs
(dedup, similarity search, text analysis, multimodal plumbing).

Layout:
  session     — tuned SparkSession factory
  config      — migration config model (migrator.go:51-102 analogue)
  filters     — Mongo-query-JSON -> Column translator (includes.go:15)
  functions/  — scalar surface: masks, redaction, casts, text metrics
  operators/  — copy, split, compare, dedup, similarity, joins, aggregates
  sources/    — catalog/namespace resolution, parquet IO
  streaming/  — CDC decode + merge-apply (oplog_utils.go:208-281 analogue)
"""

from hummingbird_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
