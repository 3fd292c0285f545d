"""Batch source/sink format support beyond parquet: CSV, JSON-lines,
and raw text (the kayvee line format), plus the matching writers.

These are thin, schema-explicit wrappers over the Spark readers —
the value is the pinned options (header/timestamp handling) and the
round-trip guarantees the tests assert. At scale every reader here
splits by file and by block (CSV/JSON are splittable uncompressed;
use zstd parquet for the real pipeline — these exist for ingest
interchange, not as the storage format).

Reference tie-in: the engine's ingest format is raw syslog lines
(read_lines); CSV/JSON cover the interchange surface SURVEY.md §2C
declares for the engine beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV with explicit schema (inference reads the data twice and
    guesses types — never in production paths)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines with explicit schema; corrupt records are captured in
    ``_corrupt_record`` (PERMISSIVE) rather than failing the scan —
    the batch analogue of the pipeline's quarantine path."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw text lines (column ``value``) — the kayvee ingest format."""
    return spark.read.text(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC (columnar, predicate-pushdown capable like parquet) — for
    interchange with Hive/Trino-side producers. Spark's vectorized ORC
    reader applies the same filter pushdown and column pruning as
    parquet; at 100 TB prefer whichever format the upstream already
    writes rather than transcoding."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Parquet writer; ``partition_by`` lays out hive-style directories
    so downstream scans partition-prune (the 100 TB layout: partition
    on the dominant filter columns, e.g. date / env)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


_AVRO_GATE_MSG = (
    "the avro data source is an external Spark module; launch "
    "with --packages org.apache.spark:spark-avro_2.13:<spark "
    "version> (not bundled in this container)"
)


def _reraise_if_avro_missing(exc: Exception) -> None:
    """The avro data source is an EXTERNAL module since Spark 2.4
    (org.apache.spark:spark-avro artifact) and absent from this
    container — same environment-gate pattern as the Kinesis
    connector (sources/kinesis.py): attempt the REAL operation and
    chain the actionable error only when the failure IS the missing
    module (a bare Class.forName pre-probe false-positives here
    because the Spark 4 distribution ships some sql.avro classes for
    from_avro/to_avro without registering the file source; and a
    message-substring pre-probe misclassifies unrelated failures).
    Every other exception propagates untouched."""
    msg = str(exc).lower()
    if "data source" in msg and ("avro" in msg and "find" in msg):
        raise RuntimeError(_AVRO_GATE_MSG) from exc
    raise exc


def read_avro(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Avro (row-oriented, schema-evolution-friendly — the common
    Kafka/ingest interchange format). Gated on the external
    spark-avro module with an actionable error
    (:func:`_reraise_if_avro_missing`): the code path is real and the
    round-trip test runs wherever the jar exists, pins the gate error
    here."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.format("avro").load(path)
    except Exception as exc:  # noqa: BLE001 — classify-and-chain
        _reraise_if_avro_missing(exc)
        raise  # unreachable; keeps type-checkers honest


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as exc:  # noqa: BLE001 — classify-and-chain
        _reraise_if_avro_missing(exc)
        raise
