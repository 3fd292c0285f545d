"""A1/A2 volume-metrics aggregation parity (reference metrics.go,
delay.go)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kinesis_alerts_consumer_spark.functions.kayvee import parse_lines
from kinesis_alerts_consumer_spark.operators.volume import (
    log_route_volume,
    log_volume,
    max_delay_seconds,
)

H = "2017-08-15T18:39:07.000000+00:00 host1 "


def parsed(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    return parse_lines(df, "value", "test-env")


def test_log_volume_keys_and_unknown_normalization(spark):
    lines = [
        # env--app present, team from _kvmeta
        H + 'prodA--app1/arn[1]: {"_kvmeta":{"team":"teamX","routes":[]}}',
        H + 'prodA--app1/arn[1]: {"_kvmeta":{"team":"teamX","routes":[]}}',
        # no separator -> env/app empty -> unknown; no team -> unknown
        H + 'bareprog[1]: {}',
    ]
    rows = {
        (r.env, r.app, r.team): (r.cnt, r.size)
        for r in log_volume(parsed(spark, lines)).collect()
    }
    assert rows[("prodA", "app1", "teamX")][0] == 2
    assert rows[("unknown", "unknown", "unknown")][0] == 1
    # byte sums are the raw line sizes (metrics.go work.size)
    assert rows[("prodA", "app1", "teamX")][1] == 2 * len(lines[0].encode())


def test_log_route_volume_counts_all_kvmeta_rules(spark):
    body = json.dumps(
        {
            "_kvmeta": {
                "routes": [
                    {"type": "analytics", "rule": "login-events"},
                    {"type": "alerts", "series": "s", "rule": "login-start",
                     "stat_type": "counter", "dimensions": []},
                ]
            }
        }
    )
    lines = [H + "e--a/arn[1]: " + body] * 3
    rows = {
        (r.app, r.env, r.rule): r.cnt
        for r in log_route_volume(parsed(spark, lines)).collect()
    }
    # both route rule names count, alerts or not (metrics.go:62-66)
    assert rows[("a", "e", "login-events")] == 3
    assert rows[("a", "e", "login-start")] == 3


def test_volume_counts_include_ignored_records(spark):
    # zero routes -> record is ignored by the alert pipeline but still
    # counts toward volume (recordMetrics runs before the filter)
    lines = [H + 'e--a/arn[1]: {"_kvmeta":{"team":"t","routes":[]}}']
    assert log_volume(parsed(spark, lines)).agg(F.sum("cnt")).collect()[0][0] == 1


def test_max_delay_seconds(spark):
    pts = spark.createDataFrame([(100,), (250,), (400,)], "ts bigint")
    row = max_delay_seconds(pts, now=F.lit(1000)).collect()[0]
    assert row["max_log_delay"] == 900
    # future timestamps floor at 0 like the reference's max fold
    row = max_delay_seconds(pts, now=F.lit(50)).collect()[0]
    assert row["max_log_delay"] == 0
