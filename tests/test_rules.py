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


def _notif(spark, bodies, specs):
    from kinesis_alerts_consumer_spark.operators.fields import with_typed_fields
    from kinesis_alerts_consumer_spark.operators.routing import with_mongo_fields
    from kinesis_alerts_consumer_spark.operators.rules import notification_rows

    lines = [(H + json.dumps(b),) for b in bodies]
    df = with_typed_fields(
        with_mongo_fields(
            parse_lines(
                spark.createDataFrame(lines, "value string"), "value", "test-env"
            )
        )
    )
    return notification_rows(df, specs)


def test_notification_interpolation(spark):
    """kvconfig notifications output (kvconfig.yml:14-20): %{field}
    interpolation, missing-field -> empty string, non-match drops."""
    from kinesis_alerts_consumer_spark.operators.rules import (
        SELF_NOTIFICATION_RULES,
    )

    rows = _notif(
        spark,
        [
            {"title": "failed-sending-volumes", "error": "boom"},
            {"title": "failed-sending-volumes"},          # no error field
            {"title": "failed-sending-volumes", "error": 7},  # non-string
            {"title": "stats", "error": "x"},             # no match
        ],
        SELF_NOTIFICATION_RULES,
    ).orderBy("message").collect()
    assert len(rows) == 3
    assert [r.message for r in rows] == [
        "Error sending log volumes: ``````",
        "Error sending log volumes: ``````",
        "Error sending log volumes: ```boom```",
    ]
    r = rows[0]
    assert (r.rule, r.channel, r.icon, r.user) == (
        "log-volume-send-failure",
        "#eng-infra-alerts-minor",
        ":signalfx:",
        "kinesis-alerts-consumer",
    )


def test_notification_multi_rule_and_segments(spark):
    from kinesis_alerts_consumer_spark.operators.rules import (
        NotificationRuleSpec,
    )

    specs = (
        NotificationRuleSpec(
            name="n1",
            matchers={"title": ["t"]},
            channel="#a",
            message="%{who} did %{what}!",
        ),
        NotificationRuleSpec(
            name="n2",
            matchers={"title": ["t"], "who": ["alice"]},
            channel="#b",
            message="literal only",
        ),
    )
    rows = _notif(
        spark, [{"title": "t", "who": "alice", "what": "deploy"}], specs
    ).orderBy("channel").collect()
    assert [(r.rule, r.channel, r.message) for r in rows] == [
        ("n1", "#a", "alice did deploy!"),
        ("n2", "#b", "literal only"),
    ]
