"""Mocked-HTTP tests for the Datadog / CloudWatch transports.

Pin the reference's wire semantics: DD success is exactly HTTP 202
(metrics.go:160-168); a non-202 raises so the sink's 5x50ms retrier
(alerts_consumer.go:257) governs redelivery; CW PutMetricData is a
SigV4-signed form POST with <=20 data (allowlist.go:6-7).
"""

from __future__ import annotations

import datetime
import io
import json
import urllib.parse

import pytest

from kinesis_alerts_consumer_spark.streaming.sinks import RetryPolicy
from kinesis_alerts_consumer_spark.streaming.transports import (
    AwsCredentials,
    CloudWatchTransport,
    DatadogTransport,
    TransportError,
)

DD_SCHEMA = (
    "tag string, metric string, mtype string, tags array<string>, "
    "ts long, value double"
)
CW_SCHEMA = (
    "tag string, metric_name string, "
    "dimensions array<struct<name:string, value:string>>, "
    "value double, ts long, storage_resolution int"
)


class FakeResponse(io.BytesIO):
    def __init__(self, status: int = 202):
        super().__init__(b"{}")
        self.status = status

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def dd_frame(spark, n=2):
    rows = [
        ("default", "kv.series-name", "count", ["env:test", "x:1"], 1500 + i,
         float(i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DD_SCHEMA)


def cw_frame(spark, n=2):
    rows = [
        ("us-west-2", "ContainerExitCount", [("env", "prod")], float(i),
         1500 + i, 1)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, CW_SCHEMA)


def test_dd_submit_202_payload(spark):
    seen = []

    def fake_urlopen(req, timeout):
        seen.append(req)
        return FakeResponse(202)

    DatadogTransport("k3y", urlopen=fake_urlopen).submit(dd_frame(spark))
    assert len(seen) == 1
    req = seen[0]
    assert req.full_url == "https://api.datadoghq.com/api/v1/series"
    assert req.get_header("Dd-api-key") == "k3y"
    payload = json.loads(req.data.decode())
    assert [s["metric"] for s in payload["series"]] == ["kv.series-name"] * 2
    assert payload["series"][0]["points"] == [[1500, 0.0]]
    assert payload["series"][0]["type"] == "count"
    assert "env:test" in payload["series"][0]["tags"]


def test_dd_non_202_raises(spark):
    with pytest.raises(TransportError, match="want 202"):
        DatadogTransport(
            "k", urlopen=lambda req, timeout: FakeResponse(200)
        ).submit(dd_frame(spark))


def test_dd_chunks_large_batches(spark):
    calls = []

    def fake_urlopen(req, timeout):
        calls.append(len(json.loads(req.data.decode())["series"]))
        return FakeResponse(202)

    t = DatadogTransport("k", urlopen=fake_urlopen, max_series_per_request=3)
    t.submit(dd_frame(spark, n=7))
    assert calls == [3, 3, 1]


def test_dd_retry_integration(spark):
    """Transport failure flows through the sink's RetryPolicy: two 500s
    then a 202 -> success on the third attempt."""
    statuses = iter([500, 500, 202])
    attempts = []

    def fake_urlopen(req, timeout):
        status = next(statuses)
        attempts.append(status)
        return FakeResponse(status)

    transport = DatadogTransport("k", urlopen=fake_urlopen)
    df = dd_frame(spark)
    err = RetryPolicy(initial_backoff_s=0.001).run(
        lambda: transport.submit(df)
    )
    assert err is None
    assert attempts == [500, 500, 202]


def test_cw_sigv4_put_metric_data(spark):
    seen = []

    def fake_urlopen(req, timeout):
        seen.append(req)
        return FakeResponse(200)

    t = CloudWatchTransport(
        "us-west-2",
        AwsCredentials("AKID", "s3cret"),
        urlopen=fake_urlopen,
        now=lambda: datetime.datetime(
            2026, 8, 13, 12, 0, 0, tzinfo=datetime.timezone.utc
        ),
    )
    t.submit(cw_frame(spark))
    assert len(seen) == 1
    req = seen[0]
    assert req.full_url == "https://monitoring.us-west-2.amazonaws.com/"
    body = dict(urllib.parse.parse_qsl(req.data.decode()))
    assert body["Action"] == "PutMetricData"
    assert body["Namespace"] == "LogMetrics"
    assert body["MetricData.member.1.MetricName"] == "ContainerExitCount"
    assert body["MetricData.member.1.StorageResolution"] == "1"
    assert body["MetricData.member.1.Dimensions.member.1.Name"] == "env"
    assert body["MetricData.member.2.Value"] == "1.0"
    auth = req.get_header("Authorization")
    assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKID/20260813/"
                           "us-west-2/monitoring/aws4_request")
    assert "SignedHeaders=content-type;host;x-amz-date" in auth
    assert "Signature=" in auth
    assert req.get_header("X-amz-date") == "20260813T120000Z"


def test_cw_signature_is_deterministic(spark):
    sigs = []

    def fake_urlopen(req, timeout):
        sigs.append(req.get_header("Authorization").split("Signature=")[1])
        return FakeResponse(200)

    for _ in range(2):
        CloudWatchTransport(
            "us-east-1",
            AwsCredentials("AKID", "s3cret", session_token="tok"),
            urlopen=fake_urlopen,
            now=lambda: datetime.datetime(
                2026, 1, 2, 3, 4, 5, tzinfo=datetime.timezone.utc
            ),
        ).submit(cw_frame(spark))
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == 64


def test_cw_non_200_raises(spark):
    with pytest.raises(TransportError, match="HTTP 403"):
        CloudWatchTransport(
            "us-west-2",
            AwsCredentials("A", "B"),
            urlopen=lambda req, timeout: FakeResponse(403),
        ).submit(cw_frame(spark))


def test_cw_empty_frame_no_call(spark):
    calls = []
    CloudWatchTransport(
        "us-west-2",
        AwsCredentials("A", "B"),
        urlopen=lambda req, timeout: calls.append(req) or FakeResponse(200),
    ).submit(cw_frame(spark).limit(0))
    assert calls == []
