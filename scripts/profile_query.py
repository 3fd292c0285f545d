"""Per-query profiling harness for the optimization rounds.

For each named query: warm-up run, timed run(s), dump the
``explain("formatted")`` plan to ``plans/r14/<short>_<tag>.txt``, and
print the slowest stages of the timed run from the UI REST API
(stage wall, task count, shuffle read/write bytes, input bytes) so the
time can be attributed to operators instead of guessed.

Usage:
    python scripts/profile_query.py [--sf DIR] [--tag before] [--runs 1]
        [--no-plans] name [name ...]

The session mirrors bench.py (get_spark + register_tables + the
streaming state-store unload between st runs) but enables the UI so
stage metrics are readable. Timings here are for ATTRIBUTION, not the
record — the bench artifact stays the canonical number.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default=None,
                    help="write plans/r14/<short>_<tag>.txt when set")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--stages", type=int, default=12)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from kinesis_alerts_consumer_spark.session import (
        BUILD_CONFS, get_spark)
    from kinesis_alerts_consumer_spark.sources import register_tables
    import __spark_entry__ as entrymod
    from bench import is_streaming_query

    BUILD_CONFS["spark.ui.enabled"] = "true"
    BUILD_CONFS["spark.ui.port"] = "4049"
    spark = get_spark(app_name="profile-query")
    register_tables(spark, args.sf)
    qs = entrymod.queries()
    sc = spark.sparkContext

    def unload_state_stores() -> None:
        with contextlib.suppress(Exception):
            jvm = spark._jvm
            jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()

    def stage_rows() -> list[dict]:
        app_id = sc.applicationId
        url = f"http://localhost:4049/api/v1/applications/{app_id}/stages"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.load(r)

    for name in args.names:
        fn = qs[name]
        streaming = is_streaming_query(name)
        # warm-up
        t0 = time.perf_counter()
        fn(spark, args.sf).collect()
        warm = time.perf_counter() - t0
        if streaming:
            unload_state_stores()
        pre = stage_rows()
        pre_ids = {(s["stageId"], s["attemptId"]) for s in pre}
        best = None
        for _ in range(args.runs):
            sc.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.collect()
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            if streaming:
                unload_state_stores()
            if best is None or dt < best[0]:
                best = (dt, df)
        dt, df = best
        print(f"\n=== {name}: warm {warm:.2f}s, timed {dt:.2f}s "
              f"(best of {args.runs}) ===")
        if args.tag:
            short = name.split("_", 1)[0]
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            os.makedirs("/root/repo/plans/r14", exist_ok=True)
            path = f"/root/repo/plans/r14/{short}_{args.tag}.txt"
            with open(path, "w") as fh:
                fh.write(f"# {name} @ {args.sf} — explain('formatted') "
                         f"after execution, timed {dt:.2f}s\n")
                fh.write(buf.getvalue())
            print(f"plan -> {path}")
        post = stage_rows()
        new = [s for s in post
               if (s["stageId"], s["attemptId"]) not in pre_ids
               and s["status"] in ("COMPLETE", "FAILED")]

        def wall(s):
            try:
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                a = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                b = datetime.strptime(s["completionTime"], fmt)
                return (b - a).total_seconds()
            except Exception:
                return 0.0

        new.sort(key=lambda s: -wall(s))
        total_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"stages in timed run(s): {len(new)}, executorRunTime sum "
              f"{total_run/1000:.2f}s (over all cores)")
        for s in new[:args.stages]:
            nm = (s.get("name") or "")[:70].replace("\n", " ")
            print(
                f"  wall {wall(s):6.2f}s"
                f" run {s.get('executorRunTime', 0)/1000:7.2f}s"
                f" cpu {s.get('executorCpuTime', 0)/1e9:7.2f}s"
                f" tasks {s.get('numCompleteTasks', 0):4d}"
                f" in {s.get('inputBytes', 0)/1e6:7.1f}MB"
                f" sr {s.get('shuffleReadBytes', 0)/1e6:6.1f}MB"
                f" sw {s.get('shuffleWriteBytes', 0)/1e6:6.1f}MB"
                f"  {nm}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
