"""Streaming queries through the driver's correctness gate.

Each entry replays the bounded ``events`` table as a file stream
(``availableNow`` trigger) through a REAL Structured Streaming
aggregation — watermark, tumbling/session windows, state store — into
a memory sink, and returns the sink table. The DuckDB oracle is the
batch-equivalent SQL, so the driver's hash compare IS the
streaming/batch equivalence theorem for these operators (SURVEY.md
§5.2 item 3) run on every round.

Session-gap semantics note: ``session_window`` starts a NEW session
when the inter-event gap is >= the gap duration (window overlap is
half-open); the oracle's island break uses ``>=`` to match exactly.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..session import configure
from ..streaming.aggregates import (
    hourly_type_rollup,
    stream_events,
    user_sessions,
)


def _run_to_memory(df: DataFrame, spark: SparkSession) -> DataFrame:
    name = "st_" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def q_stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    return _run_to_memory(
        hourly_type_rollup(stream_events(spark, sf_dir)), spark
    ).orderBy("w", "event_type")


SQL_STREAM_HOURLY = """
SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS cnt,
       ROUND(SUM(value), 2) AS sv
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    return _run_to_memory(
        user_sessions(stream_events(spark, sf_dir)), spark
    ).orderBy("user_id", "session_start")


SQL_STREAM_SESSIONS = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk,
         event_id
  FROM events),
s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM g)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n
FROM s GROUP BY user_id, sess ORDER BY user_id, session_start
"""


STREAMING_QUERIES: dict[str, tuple] = {
    "st01_stream_hourly_rollup": (q_stream_hourly_rollup, SQL_STREAM_HOURLY),
    "st02_stream_sessions": (q_stream_sessions, SQL_STREAM_SESSIONS),
}
