"""Config-driven routing rules (K3) unit tests."""

from __future__ import annotations

import json

from kinesis_alerts_consumer_spark.functions.kayvee import parse_lines
from kinesis_alerts_consumer_spark.operators.project import dd_points, project_routes
from kinesis_alerts_consumer_spark.operators.routing import with_routes
from kinesis_alerts_consumer_spark.operators.rules import (
    RuleSpec,
    with_config_routes,
)

H = "2017-08-15T18:39:07+00:00 h1 prod--app/arn[1]: "


def _run(spark, bodies, specs):
    lines = [(H + json.dumps(b),) for b in bodies]
    df = with_config_routes(
        with_routes(
            parse_lines(
                spark.createDataFrame(lines, "value string"), "value", "test-env"
            )
        ),
        specs,
    )
    return dd_points(project_routes(df))


def test_matcher_any_of_and_type_assert(spark):
    spec = RuleSpec(
        name="r1",
        matchers={"title": ["stats", "beat"], "source": ["svc"]},
        series="x.y",
        dimensions=("env",),
    )
    pts = _run(
        spark,
        [
            {"title": "stats", "source": "svc"},   # matches
            {"title": "beat", "source": "svc"},    # matches (any-of)
            {"title": "stats", "source": "other"}, # source mismatch
            {"title": "stats"},                    # source missing
            {"title": 7, "source": "svc"},         # non-string never matches
        ],
        [spec],
    ).collect()
    assert len(pts) == 2
    assert all(p.metric == "kv.x.y" and p.tags == ["env:test-env"] for p in pts)


def test_config_rules_compose_with_kvmeta_routes(spark):
    spec = RuleSpec(name="r2", matchers={"title": ["t"]}, series="cfg")
    body = {
        "title": "t",
        "_kvmeta": {
            "routes": [
                {
                    "type": "alerts",
                    "series": "kvm",
                    "dimensions": [],
                    "stat_type": "counter",
                    "rule": "k",
                }
            ]
        },
    }
    pts = _run(spark, [body], [spec]).collect()
    assert sorted(p.metric for p in pts) == ["kv.cfg", "kv.kvm"]


def test_unmatched_records_stay_ignored(spark):
    spec = RuleSpec(name="r3", matchers={"title": ["t"]}, series="cfg")
    pts = _run(spark, [{"title": "zzz"}], [spec])
    assert pts.count() == 0
