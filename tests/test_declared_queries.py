"""DQ1-DQ16 cross-engine correctness: Spark vs DuckDB at sf0.001.

This mirrors the driver's t2 harness (row-count + schema + value
comparison after sorting columns by name). The driver re-runs the same
check at sf0.01.
"""

from __future__ import annotations

import pytest

from kinesis_alerts_consumer_spark.plans.declared import (
    DECLARED_QUERIES,
    oracle_sql_for,
    run_declared,
)

from .comparison import assert_frames_match
from .conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(DECLARED_QUERIES))
def test_declared_query_matches_oracle(spark, duck, name):
    df = run_declared(spark, SF_SMOKE, name)
    assert_frames_match(df, duck, oracle_sql_for(name), name=name)
