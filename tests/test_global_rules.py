"""Global routing rules parity (reference global_routes.go /
global_routes_test.go — table-driven semantics re-pinned here through
the full line pipeline)."""

from __future__ import annotations

import json

from kinesis_alerts_consumer_spark.pipeline import dd_points, process_lines

HEADER = "2017-08-15T18:39:07.000000+00:00 {host} some-env--some-app/arn[1]: "


def run(spark, bodies_hosts, deploy_env="test-env"):
    lines = [
        HEADER.format(host=h) + (json.dumps(b) if isinstance(b, dict) else b)
        for b, h in bodies_hosts
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    return process_lines(df, "value", deploy_env)


def metrics(out):
    return sorted(
        (r.asDict(recursive=True) for r in dd_points(out).collect()),
        key=lambda r: r["metric"],
    )


# --- process-metrics (global_routes.go:40-74) ------------------------


def test_process_metrics_counter(spark):
    body = {"via": "process-metrics", "source": "some-source",
            "title": "some-title", "value": 123, "type": "counter"}
    rows = metrics(run(spark, [(body, "h1")]))
    assert len(rows) == 1
    assert rows[0]["metric"] == "kv.process-metrics.some-title"
    assert rows[0]["mtype"] == "count"
    assert rows[0]["value"] == 123.0
    # dims [Hostname, env, source] (global_routes.go:68)
    assert rows[0]["tags"] == ["Hostname:h1", "env:test-env", "source:some-source"]


def test_process_metrics_guage_typo_normalizes(spark):
    body = {"via": "process-metrics", "source": "s", "title": "t",
            "value": 0.35, "type": "guage"}
    rows = metrics(run(spark, [(body, "h1")]))
    assert rows[0]["mtype"] == "gauge"
    assert rows[0]["value"] == 0.35


def test_process_metrics_requires_all_fields(spark):
    incomplete = [
        ({"via": "process-metrics", "title": "t", "type": "counter"}, "h"),
        ({"via": "process-metrics", "source": "s", "type": "counter"}, "h"),
        ({"via": "process-metrics", "source": "s", "title": "t"}, "h"),
        ({"via": "not-process-metrics", "source": "s", "title": "t",
          "type": "counter"}, "h"),
        ({}, "h"),
    ]
    out = run(spark, incomplete)
    assert dd_points(out).count() == 0
    assert out.filter("ignored").count() == len(incomplete)


# --- RDS slow query (global_routes.go:138-162) -----------------------


def test_rds_slow_query_routes(spark):
    body = {"user": "someuser[someuser]", "rawlog": "SELECT ..."}
    rows = metrics(run(spark, [(body, "aws-rds")]))
    assert len(rows) == 1
    assert rows[0]["metric"] == "kv.rds.slow-query"
    assert rows[0]["mtype"] == "count"
    # dims [env, programname] (global_routes.go:155)
    assert rows[0]["tags"] == ["env:test-env", "programname:some-env--some-app/arn"]


def test_rds_excludes_rdsadmin(spark):
    out = run(spark, [({"user": "rdsadmin[rdsadmin]"}, "aws-rds")])
    assert dd_points(out).count() == 0


def test_rds_requires_aws_rds_hostname(spark):
    out = run(spark, [({"user": "someuser[someuser]"}, "not-rds")])
    assert dd_points(out).count() == 0


# --- mongo slow query (global_routes.go:88-136) ----------------------

MONGO_LINES = [
    # (rawlog, operation, namespace, is_collscan, millis)
    ("[conn123] update clever.students query: { district: ObjectId('x') }"
     " nscanned:1 nMatched:1 2964ms", "update", "clever.students", False, 2964.0),
    ("[conn99] command db.$cmd command: update { update: \"students\" }"
     " keyUpdates:0 4608ms", "command", "db.$cmd", False, 4608.0),
    ("[conn7] query prod.users query: { e: 1 } planSummary: COLLSCAN"
     " ntoreturn:0 keyUpdates:0 1337ms", "query", "prod.users", True, 1337.0),
    ("[conn1] getmore local.oplog.rs cursorid:123 ntoreturn:0 101ms",
     "getmore", "local.oplog.rs", False, 101.0),
]


def test_mongo_slow_query_two_routes_and_derived_dims(spark):
    for rawlog, op, ns, collscan, millis in MONGO_LINES:
        rows = metrics(run(spark, [(rawlog, "mongo-host")]))
        assert [r["metric"] for r in rows] == [
            "kv.mongo.slow-query", "kv.mongo.slow-query-millis",
        ], rawlog
        counter, gauge = rows
        expected_tags = [
            "hostname:mongo-host",
            f"operation:{op}",
            f"namespace:{ns}",
            f"is_collscan:{'true' if collscan else 'false'}",
        ]
        assert counter["tags"] == expected_tags
        assert counter["mtype"] == "count"
        assert counter["value"] == 1.0  # no value_field -> counter default
        assert gauge["tags"] == expected_tags
        assert gauge["mtype"] == "gauge"
        assert gauge["value"] == millis


def test_mongo_non_matching_line_ignored(spark):
    out = run(spark, [("not a mongo line 123ms-ish", "mongo-host")])
    assert dd_points(out).count() == 0
    assert out.filter("ignored").count() == 1
