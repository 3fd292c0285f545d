"""kinesis_alerts_consumer_spark — a PySpark-native analytics engine.

A from-scratch engine exposing the query and data-processing
capabilities of the reference streaming ETL service
(Clever/kinesis-alerts-consumer, studied read-only at
/root/reference) re-expressed Spark-first, plus the general
relational surface and large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing)
required by the north star.

Layout
------
- ``session``    — SparkSession factory with pinned confs.
- ``sources``    — batch/stream table registry (parquet tables incl.
                   the TIMESTAMP(NANOS) events normalization).
- ``functions``  — scalar column-expression helpers (kayvee parse,
                   dim coercion, text analysis primitives).
- ``operators``  — routing, projection, aggregation, dedup,
                   similarity operators (DataFrame -> DataFrame).
- ``plans``      — declared query surface (oracle-checked SQL + the
                   beyond-reference DataFrame queries).
- ``streaming``  — Structured Streaming pipeline (parse -> enrich ->
                   route -> project -> window-agg -> sink) with
                   foreachBatch sinks, retry, and DLQ.
"""

__version__ = "0.1.0"
