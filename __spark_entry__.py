"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (3-way join + aggregation) at
sf0.001. ``queries()`` exposes every implemented operator from
SURVEY.md §2; ``oracle_sql()`` the DuckDB twin for each (same column
names — the driver's compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kinesis_alerts_consumer_spark.plans.declared import (
    DECLARED_QUERIES,
    oracle_sql_for,
    run_declared,
)
from kinesis_alerts_consumer_spark.plans.extended import EXT_QUERIES
from kinesis_alerts_consumer_spark.plans.kayvee_queries import KAYVEE_QUERIES
from kinesis_alerts_consumer_spark.plans.llm_queries import LLM_QUERIES
from kinesis_alerts_consumer_spark.plans.multimodal_queries import (
    MULTIMODAL_QUERIES,
)
from kinesis_alerts_consumer_spark.plans.streaming_queries import (
    STREAMING_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return run_declared(spark, "/root/testdata/sf0.001", "dq02_join_agg")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    for name in DECLARED_QUERIES:
        out[name] = (
            lambda spark, sf_dir, _n=name: run_declared(spark, sf_dir, _n)
        )

    for group in (
        LLM_QUERIES,
        EXT_QUERIES,
        KAYVEE_QUERIES,
        MULTIMODAL_QUERIES,
        STREAMING_QUERIES,
    ):
        for name, (fn, _sql) in group.items():
            out[name] = fn

    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each entry in ``queries()``."""
    out: dict[str, str] = {}
    for name in DECLARED_QUERIES:
        out[name] = oracle_sql_for(name)
    for group in (
        LLM_QUERIES,
        EXT_QUERIES,
        KAYVEE_QUERIES,
        MULTIMODAL_QUERIES,
        STREAMING_QUERIES,
    ):
        for name, (_fn, sql) in group.items():
            if sql is not None:  # rows-only entries (approx aggregates)
                out[name] = sql
    return out
