"""Streaming replay throughput: full parse->route->project->sink
pipeline over an availableNow replay of synthesized kayvee lines.

Fills the BASELINE.md "streaming replay" row. Usage:

    python scripts/stream_throughput.py [sf_dir] [n_files]

Writes the sf's events table as kv01-style raw syslog/kayvee lines to
a temp text directory (n_files splits -> source parallelism), then
replays it through ``replay_lines`` (MetricsSink: DD rows + CW rows +
quarantine DLQ + max-delay gauge) and prints ONE JSON line with
records/s. The write phase is excluded from the measured window.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from kinesis_alerts_consumer_spark.session import get_spark
    from kinesis_alerts_consumer_spark.sources import register_tables
    from kinesis_alerts_consumer_spark.plans.kayvee_queries import _kv01_lines
    from kinesis_alerts_consumer_spark.streaming.pipeline import replay_lines

    spark = get_spark(app_name="stream-throughput")
    tables = register_tables(spark, sf_dir)

    work = tempfile.mkdtemp(prefix="stream-bench-")
    src, out, ckpt = f"{work}/lines", f"{work}/out", f"{work}/ckpt"
    lines = _kv01_lines(tables["events"])
    n = lines.count()
    lines.repartition(n_files).write.mode("overwrite").text(src)

    start = time.perf_counter()
    q = replay_lines(spark, src, out, ckpt)
    q.awaitTermination()
    wall = time.perf_counter() - start

    dd_rows = spark.read.parquet(f"{out}/dd").count()
    print(
        json.dumps(
            {
                "metric": "streaming_replay_records_per_sec",
                "value": round(n / wall, 1),
                "unit": "records/sec",
                "records": n,
                "dd_rows": dd_rows,
                "wall_sec": round(wall, 2),
                "sf_dir": sf_dir,
                "n_files": n_files,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
