"""Skew operators: salted results == plain results; bucketed joins
plan without a shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_alerts_consumer_spark.operators.skew import (
    salted_agg,
    salted_join,
    write_bucketed,
)
from kinesis_alerts_consumer_spark.sources import register_tables

from .conftest import SF_SMOKE


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_matches_plain(spark):
    ev = register_tables(spark, SF_SMOKE)["events"]
    plain = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    salted = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n": ("count", "value"),
            "sv": ("sum", "value"),
            "mn": ("min", "value"),
            "mx": ("max", "value"),
        },
        salt_n=16,
        salt_on="event_id",
    )
    a = {r.event_type: (r.n, round(r.sv, 6), r.mn, r.mx) for r in plain.collect()}
    b = {r.event_type: (r.n, round(r.sv, 6), r.mn, r.mx) for r in salted.collect()}
    assert a == b


def test_salted_join_matches_plain(spark):
    t = register_tables(spark, SF_SMOKE)
    left = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    right = t["customer"].select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = left.join(right, "o_custkey")
    salted = salted_join(left, right, key="o_custkey", salt_n=4)
    assert _canon(plain.select("o_orderkey", "c_name")) == _canon(
        salted.select("o_orderkey", "c_name")
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = register_tables(spark, SF_SMOKE)
        write_bucketed(
            t["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
            "orders_b", key="o_custkey", buckets=8,
        )
        write_bucketed(
            t["customer"].select("c_custkey", "c_acctbal"),
            "customer_b", key="c_custkey", buckets=8,
        )
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:1000]
        # and it still returns the right rows
        n_plain = t["orders"].join(
            t["customer"], F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert joined.count() == n_plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_join_rejects_right_and_full(spark):
    """right/full would emit unmatched right rows once per salt
    replica; the operator refuses them."""
    import pytest

    t = register_tables(spark, SF_SMOKE)
    left = t["orders"].select("o_orderkey", "o_custkey")
    right = t["customer"].select(F.col("c_custkey").alias("o_custkey"))
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, key="o_custkey", how=how)


def test_vol03_salted_rollup_plan_splits_hot_key(spark):
    """vol03's physical plan must actually be the TWO-PHASE split:
    a partial aggregate keyed on (env, app, team, _salt) — the hot
    key's rows spread over salt_n reducers — exchanged on the salted
    key, then a merge exchange on the real key. Two hash-partitioning
    exchanges, the first carrying _salt."""
    from kinesis_alerts_consumer_spark.plans.kayvee_queries import (
        q_hot_key_log_volume,
    )

    df = q_hot_key_log_volume(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    # orderBy adds a rangepartitioning exchange; hash exchanges are
    # exactly the two aggregation phases
    assert len(exchanges) == 2, plan
    salted = [ln for ln in exchanges if "_salt" in ln]
    assert len(salted) == 1, exchanges
