"""SparkSession factory with the engine's pinned configuration.

Two entry points:

- :func:`get_spark` — build a session for local dev/tests/bench.
- :func:`configure` — pin the *runtime-settable* confs onto an
  existing session (the verify driver hands us one we didn't build).

Pinned confs and why (see SURVEY.md §2B / §7):

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver-generated
  ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS); vanilla
  Spark aborts with PARQUET_TYPE_ILLEGAL. With this conf the column
  reads as LongType nanos, which :mod:`.sources.tables` converts with
  integer ``ts DIV 1000 -> timestamp_micros`` (integer DIV: double
  division of ~1.7e18 ns exceeds the 53-bit mantissa and yields ±1 µs
  errors).
- ``spark.sql.session.timeZone=UTC`` — DuckDB (the correctness oracle)
  treats parquet timestamps as naive; pinning UTC makes Spark's
  rendering byte-identical.
- AQE on (with skew-join handling) — at the 100 TB target, runtime
  re-planning (coalesce post-shuffle partitions, skew-split, dynamic
  broadcast) is the difference between a plan that survives skew and
  one that doesn't. Harmless at sf0.001.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that can be applied to a live session (spark.conf.set).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / applyInPandas path (similarity, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # fields.with_typed_fields merges engine columns over body fields
    # with map_concat; LAST_WIN makes the later (engine) entry win.
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
}

# Confs that must be set before the JVM/session exists.
BUILD_CONFS: dict[str, str] = {
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # local[N] has no dynamic executors; bound shuffle fan-out to cores.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Whole-stage codegen emits one class per plan fragment; a long
    # query suite overflows HotSpot's default 240 MB code cache, after
    # which the JIT compiler is periodically disabled/flushed and every
    # query degrades ~3-10x (observed: identical kv01 runs oscillating
    # 2.3 s <-> 12.4 s within one JVM). Size the cache for a
    # many-query session. -Xms + AlwaysPreTouch faults the whole heap
    # in at startup: on virtualized hosts, demand-faulting heap pages
    # mid-query showed up as multi-second 90%-system-time stalls
    # billed to whichever query triggered heap growth.
    "spark.driver.extraJavaOptions": os.environ.get(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS",
        "-XX:ReservedCodeCacheSize=1g -Xms"
        + os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        + " -XX:+AlwaysPreTouch",
    ),
}


def configure(spark: SparkSession) -> SparkSession:
    """Pin runtime confs onto an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static conf on this build — fall back to whatever the
            # session was built with rather than failing hard.
            pass
    return spark


def get_spark(
    app_name: str = "kinesis-alerts-consumer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session with pinned confs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for key, value in BUILD_CONFS.items():
        builder = builder.config(key, value)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return configure(builder.getOrCreate())
