"""Extended-surface + kayvee-pipeline queries vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_alerts_consumer_spark.plans.extended import EXT_QUERIES
from kinesis_alerts_consumer_spark.plans.kayvee_queries import KAYVEE_QUERIES
from kinesis_alerts_consumer_spark.plans.multimodal_queries import (
    MULTIMODAL_QUERIES,
)
from kinesis_alerts_consumer_spark.plans.streaming_queries import (
    STREAMING_QUERIES,
)

from .comparison import assert_frames_match
from .conftest import SF_SMOKE

ALL = {
    **EXT_QUERIES,
    **KAYVEE_QUERIES,
    **MULTIMODAL_QUERIES,
    **STREAMING_QUERIES,
}


@pytest.mark.parametrize("name", sorted(ALL))
def test_extended_query_matches_oracle(spark, duck, name):
    fn, oracle = ALL[name]
    if oracle is None:  # rows-only capability (approx aggregates)
        assert fn(spark, SF_SMOKE).count() > 0
    else:
        assert_frames_match(fn(spark, SF_SMOKE), duck, oracle, name=name)


def test_approx_aggregates_within_bounds(spark):
    """approx_count_distinct must be within its rsd of the exact count;
    approx_percentile within the value range."""
    from kinesis_alerts_consumer_spark.sources import register_tables

    t = register_tables(spark, SF_SMOKE)
    exact = {
        r.event_type: r.n
        for r in t["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in EXT_QUERIES["ext05_approx_distinct"][0](spark, SF_SMOKE).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.15 * n), (k, approx[k], n)

    lo, hi = t["events"].agg(F.min("value"), F.max("value")).first()
    for r in EXT_QUERIES["ext06_approx_quantiles"][0](spark, SF_SMOKE).collect():
        assert lo <= r.p50 <= r.p90 <= r.p99 <= hi


def test_asof_join_semantics(spark):
    """Backward as-of: ties match (>=), no prior purchase -> null, and
    every matched purchase is the latest one at-or-before the event."""
    from pyspark.sql import functions as F

    from kinesis_alerts_consumer_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (1, 5, 102), (2, 7, 103)],
        "k int, t int, lid int",
    ).select("k", F.col("t").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 15, 2.0), (2, 9, 3.0)], "k int, t int, v double"
    ).select("k", F.col("t").alias("ts"), "v")

    got = {
        r.lid: r.r_v
        for r in asof_join_backward(left, right, key="k").collect()
    }
    # lid 100 at t=10: right row AT t=10 matches (inclusive).
    # lid 101 at t=20: latest is t=15. lid 102 at t=5: none.
    # lid 103 at t=7 (k=2): right t=9 is later -> none.
    assert got == {100: 1.0, 101: 2.0, 102: None, 103: None}
