"""Kinesis stream source configuration (reference S1/S2).

The reference consumes via the KCL MultiLangDaemon with a DynamoDB
lease/checkpoint table and TRIM_HORIZON/LATEST start positions
(consumer.properties.template:4-26, run_kcl.sh:21, main.go:85-86) and
bounds ingest with BatchCount=100 / BatchInterval=5s / READ_RATE_LIMIT
(main.go:54-59).

In Structured Streaming the same topology is pure configuration:

- shard -> task parallelism comes from the source connector;
- KCL checkpointing -> ``checkpointLocation`` (exactly-once source
  tracking replaces the DynamoDB lease table);
- TRIM_HORIZON/LATEST -> ``startingPosition``;
- batch bounds -> ``trigger(processingTime='5 seconds')`` plus the
  connector's fetch-rate options;
- the record pipeline itself (``pipeline.process_lines``) is
  source-agnostic: any DataFrame with a line column slots in.

This container ships no Kinesis connector jar, so :func:`read_kinesis`
raises unless one is on the classpath — the options dict is the
tested, documented contract; dev/test use the file/rate sources in
``streaming.pipeline``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Option names follow the spark-sql-kinesis connector family
# (format "aws-kinesis"); kafka equivalents noted for that path.
DEFAULT_KINESIS_OPTIONS: dict[str, str] = {
    "streamName": "logs",
    "region": "us-west-2",
    "startingPosition": "TRIM_HORIZON",  # reference KCL initial position
    # reference READ_RATE_LIMIT / BatchCount analogues:
    "maxFetchRecordsPerShard": "10000",  # KCL GetRecords bound
    "maxFetchTimePerShard": "5000",      # ms, reference BatchInterval
}


def kinesis_options(**overrides: str) -> dict[str, str]:
    return {**DEFAULT_KINESIS_OPTIONS, **overrides}


def read_kinesis(
    spark: SparkSession, fmt: str = "aws-kinesis", **overrides: str
) -> DataFrame:
    """``readStream`` against a Kinesis connector; raises a clear error
    when no connector is installed (this container has none)."""
    reader = spark.readStream.format(fmt)
    for k, v in kinesis_options(**overrides).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            f"no '{fmt}' streaming connector on the classpath; install the "
            "connector jar (spark.jars.packages) or use the file/kafka "
            "sources in streaming.pipeline for dev"
        ) from exc


# Kafka twin of the Kinesis contract: same topology knobs, different
# option names. startingOffsets=earliest is the TRIM_HORIZON analogue
# (consumer.properties.template:10); maxOffsetsPerTrigger bounds the
# micro-batch like READ_RATE_LIMIT / BatchCount (main.go:54-59).
DEFAULT_KAFKA_OPTIONS: dict[str, str] = {
    "kafka.bootstrap.servers": "localhost:9092",
    "subscribe": "logs",
    "startingOffsets": "earliest",
    "maxOffsetsPerTrigger": "10000",
}


def kafka_options(**overrides: str) -> dict[str, str]:
    return {**DEFAULT_KAFKA_OPTIONS, **overrides}


def read_kafka_lines(spark: SparkSession, **overrides: str) -> DataFrame:
    """``readStream.format("kafka")`` producing the SAME single
    string-``value`` column shape as ``streaming.pipeline.stream_lines``
    — the whole record pipeline (process_lines -> MetricsSink) slots in
    unchanged behind either source. Raises a clear error when the
    kafka-sql connector jar is not on the classpath (this container
    ships none; the integration test skips in that case)."""
    from pyspark.sql import functions as F

    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(**overrides).items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as exc:
        raise RuntimeError(
            "no 'kafka' streaming connector on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 via "
            "spark.jars.packages"
        ) from exc
    return raw.select(F.col("value").cast("string").alias("value"))
