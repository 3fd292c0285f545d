"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import duckdb
import pytest

from kinesis_alerts_consumer_spark.session import get_spark
from kinesis_alerts_consumer_spark.sources import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views,
    mirroring the driver's oracle setup."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{SF_SMOKE}/{name}.parquet'"
        )
    yield con
    con.close()
