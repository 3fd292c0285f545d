"""Streaming windowed aggregations over the events stream.

These are the streaming twins of declared queries DQ6 (tumbling
hourly rollup — reference A1's shape) and DQ9 (sessionization —
``session_window`` instead of the batch gaps-and-islands SQL). The
streaming-equivalence tests replay the bounded ``events`` table with
``availableNow`` and require the sink table to match the batch
answers (SURVEY.md §5.2 item 3).

Late data: watermarks bound state; the reference's volume rollup has
NO event-time watermark (processing-time buckets, metrics.go:79-87) —
the engine default is event-time + watermark, the documented
divergence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a bounded stream with the SAME ``ts``
    normalization as the batch registry (:func:`..sources.load_table`).

    File streams require an explicit schema; hardcoding one is a trap —
    the fixture generator has shipped ``ts`` both as TIMESTAMP(NANOS)
    (reads as long nanos under ``nanosAsLong``) and as plain
    TIMESTAMP(MICROS) (reads as timestamp directly). A nanos-assuming
    ``DIV 1000`` on a µs file lands every event in 1970 and silently
    collapses window aggregates. Sniff the unit from the parquet footer
    (one cheap batch-read plan, no data scan) and convert only when the
    column really arrives as bigint.
    """
    # file streams need a directory source; glob-filter to the table
    path = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(path)
    df = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        conv = F.expr("timestamp_micros(ts DIV 1000)")
        # Sanity-gate the unit assumption on the batch twin BEFORE
        # starting the stream: a µs-shipping fixture would otherwise
        # collapse every window into 1970 silently (sources.tables
        # memoizes the check per path, so this is one agg per process).
        from ..sources.tables import assert_sane_ts

        assert_sane_ts(batch.withColumn("ts", conv), path)
        df = df.withColumn("ts", conv)
    elif ts_type == "timestamp_ntz":
        # watermarks require TIMESTAMP (with local tz); the session tz
        # is pinned UTC so the cast is value-preserving vs the oracle
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def hourly_type_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """DQ6 as a streaming tumbling-window aggregate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sv"))
        .select(F.col("win.start").alias("w"), "event_type", "cnt", "sv")
    )


def purchase_click_join(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Stream-stream INTERVAL join: every ``purchase`` event paired
    with the same user's ``click`` events from the preceding 30
    minutes (classic attribution join).

    Both sides carry a watermark and the join condition bounds the
    event-time distance, so Spark can evict buffered state once a
    side's watermark passes ``ts + 30 minutes`` — state is
    O(watermark-window x arrival rate), NOT O(stream length), which
    is what makes this shape survive an unbounded 100 TB stream. The
    join key (user_id) is the shuffle key; both sides co-partition on
    it, and inner-join results are append-mode deterministic, so the
    bounded replay must equal the batch interval join (the st07
    oracle).
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    )


def state_partitions_for(spark: SparkSession, sf_dir: str,
                         table: str = "events",
                         target_bytes: int = 64 << 20,
                         floor: int = 8) -> int:
    """Size shuffle partitions — which fix the STATE STORE partition
    count for a stateful query's whole lifetime at first start — to
    the state volume, not the session's batch shuffle default.

    THREE regimes, each measured (st07 stream-stream join and st08
    dedup; interleaved same-host A/Bs, r6/r9):

    - tiny state (source < one ``target_bytes``): per-store commit
      overhead dominates — fewer, fatter stores win (st07 sf0.1:
      8 partitions 3.1 s vs 32 partitions 6.2-6.8 s; st08 in-suite
      3.09 -> 1.76 s). Hence the ``floor`` of 8.
    - medium state: per-partition COMPUTE dominates — anything below
      the cluster's parallelism serializes cores (st08 sf10:
      8 partitions 31.9 s vs 32 partitions 10.8-14.5 s; st07 sf10:
      8 -> 27-32 s vs 32 -> 13-15 s — the r9 review of this very
      function's first cut, whose bytes-only answer returned the
      floor here). Hence at least ``defaultParallelism`` once the
      volume crosses one target.
    - large state: per-partition state SIZE dominates (RocksDB
      memtable flush/compaction, and on-heap provider OOM) — raise
      the count past the core count until each partition's state
      fits executor memory (st08 sf100: 60 partitions 112.9-130.0 s
      vs 32 partitions 141.8-170.1 s).

    An availableNow whole-corpus replay buffers everything before the
    watermark can evict, so worst-case join state ~ source bytes; one
    partition per ``target_bytes`` of source parquet approximates
    "per-partition state fits in memory" with compressed-parquet ×
    in-memory-inflation roughly cancelling the eviction Spark does
    manage between batches. Capped at 4x the session shuffle default:
    the cap keeps a misconfigured huge source from exploding the task
    count, while the 4x headroom lets volume sizing actually ENGAGE
    when one session's default is undersized for the state — at the
    r9 sf100 rehearsal a hard cap at the session default (32) made
    st08's sizing a no-op, while the volume answer (60 partitions)
    measured 112.9-130.0 s vs 141.8-170.1 s interleaved same-host
    (~1.25x; BASELINE.md round-9 notes). At real scale
    operators raise ``spark.sql.shuffle.partitions`` cluster-wide and
    this cap rises with it.
    """
    path = os.path.join(sf_dir, f"{table}.parquet")
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    nbytes = _source_bytes(spark, path)
    if nbytes is None:
        # Unsizable source (missing path, permission error, no
        # filesystem impl for the scheme): fall back UP to the session
        # shuffle default, not down to the floor — the floor recreates
        # the under-partitioned large-state regime this function exists
        # to avoid, and the session default is the cluster-sized knob
        # operators already raise at scale.
        return max(cap, floor)
    n = nbytes // target_bytes
    if n == 0:
        return floor
    cores = spark.sparkContext.defaultParallelism
    # the task-explosion cap may never undercut the cluster's own
    # parallelism: a tiny session shuffle default (e.g. 4 on a 32-core
    # box) would otherwise clamp the medium regime back into the
    # core-serialization the regime exists to avoid
    return max(floor, min(max(4 * cap, cores, floor), max(n, cores)))


def _source_bytes(spark: SparkSession, path: str) -> int | None:
    """Total bytes under ``path``, or None if unsizable.

    Local paths go through ``os.path`` (no JVM round-trip); everything
    else — s3://, hdfs://, any scheme with a Hadoop filesystem impl on
    the classpath — through ``FileSystem.getContentSummary``, so the
    volume-based state sizing engages on remote sources too (the
    large-state regime it was written for lives on exactly those).
    """
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _dns, fns in os.walk(path) for f in fns
            )
        return os.path.getsize(path)
    except OSError:
        pass
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(hpath).getLength())
    except Exception:  # py4j wraps IOE/ClassNotFound/UnsupportedFS
        return None


def user_sessions(events: DataFrame, gap: str = "30 minutes",
                  watermark: str = "2 hours") -> DataFrame:
    """DQ9 as a streaming session-window aggregate: one row per
    (user, session) with its event count."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n")
    )
