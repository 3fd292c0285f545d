"""A/B: does Spark's map-side session pre-merge help st02 at scale?

VERDICT r11 item 3: st02's sf100 wall is 94-95% session-window merge
replay (plans/streaming_queries.py docstring) and its 1000x ratio
(46.6x) grazes the <=45x precedent. The verdict's first candidate —
pre-aggregating (user_id, ts) — is a measured DEAD END at the data
level: count(DISTINCT (user_id, ts)) == count(*) at both sf0.1
(100k/100k) and sf100 (100M/100M), so collapsing duplicates removes
zero rows. The remaining in-engine lever is
``spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition``
(SPARK-36394, default false): sort each input partition locally and
merge its rows into session ranges BEFORE the state-store shuffle.
Expectation check before measuring: sf100 has ~67 events/user spread
over ~64 scan partitions, i.e. ~1 event per (user, partition) — local
merge should collapse almost nothing while paying a local sort, so
neutral-to-negative is the honest prior; the A/B decides.

One sample = one fresh JVM running q_stream_sessions end-to-end
(availableNow replay, RocksDB state store, ordered drain — the gated
query, unmodified except the conf under test). Interleave on/off.

Usage:
    python scripts/ab_st02_localmerge.py on|off SF_DIR     # one sample
    python scripts/ab_st02_localmerge.py loop ROUNDS SF_DIR  # interleaved
"""

from __future__ import annotations

import subprocess
import sys
import time

CONF = ("spark.sql.streaming.sessionWindow."
        "merge.sessions.in.local.partition")


def one_sample(mode: str, sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")
    from kinesis_alerts_consumer_spark.plans.streaming_queries import (
        q_stream_sessions,
    )
    from kinesis_alerts_consumer_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.conf.set(CONF, "true" if mode == "on" else "false")
    t0 = time.monotonic()
    n = q_stream_sessions(spark, sf_dir).count()
    wall = time.monotonic() - t0
    print(f"RESULT mode={mode} rows={n} wall={wall:.1f}s", flush=True)


def loop(rounds: int, sf_dir: str) -> None:
    for i in range(rounds):
        for mode in ("off", "on"):
            out = subprocess.run(
                [sys.executable, __file__, mode, sf_dir],
                capture_output=True, text=True, timeout=3600,
            )
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("RESULT")]
            print(f"round {i}: {lines[-1] if lines else out.stderr[-200:]}",
                  flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "loop":
        loop(int(sys.argv[2]), sys.argv[3])
    else:
        one_sample(sys.argv[1], sys.argv[2])
