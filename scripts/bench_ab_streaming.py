"""Interleaved same-host A/B of the streaming bench family between
two checked-out trees (VERDICT r11 item 2: the r11 driver artifact's
st01 4.36 s / st07 4.48 s exceed the documented host band on a round
whose only streaming code change, st02, did not regress — decide
whether the r11 TREE is slower or the artifact is a host-band-high
sample).

Protocol (the repo's standing A/B discipline): fresh JVM per sample
(each bench.py invocation is its own process), trees interleaved
A,B,A,B,... so host drift hits both arms equally, >= ROUNDS samples
per arm, full streaming family via SPARK_GRAFT_QUERIES so the
per-family state-store unload protocol runs exactly as the driver's
bench does. Each tree's bench.py runs with its OWN tree first on
sys.path (python <tree>/bench.py).

Usage:
    python scripts/bench_ab_streaming.py TREE_A TREE_B [ROUNDS [SF_DIR]]

Prints per-sample JSON lines and a final per-query mean/min table plus
adjacent-pair wins, the decision style BASELINE.md records.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

STREAMING = ",".join([
    "st01_stream_hourly_rollup", "st02_stream_sessions",
    "st03_stream_stateful_totals", "st04_stream_dedup",
    "st05_stream_kayvee_pipeline", "st06_stream_volume_rollup",
    "st07_stream_stream_join", "st08_stream_dedup_within_wm",
])


def run_once(tree: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_QUERIES"] = STREAMING
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, cwd=tree, capture_output=True, text=True, timeout=1800,
    )
    # r12 review: a failed bench (missing data dir, import error,
    # OOM) must surface its stderr instead of dying on an empty
    # stdout and taking every prior sample with it
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py in {tree} failed (rc={out.returncode}); "
            f"stderr tail: {out.stderr[-500:]}")
    try:
        return json.loads(lines[-1])
    except json.JSONDecodeError as exc:
        raise RuntimeError(
            f"bench.py in {tree} printed an unparseable last line "
            f"{lines[-1][:200]!r}; stderr tail: {out.stderr[-300:]}"
        ) from exc


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    samples: dict[str, list[dict]] = {tree_a: [], tree_b: []}
    for i in range(rounds):
        for tree in (tree_a, tree_b):
            r = run_once(tree, sf_dir)
            samples[tree].append(r)
            print(json.dumps({"round": i, "tree": tree,
                              "total": r["value"],
                              "queries": r["queries"]}), flush=True)
    print("\nper-query mean (min) over", rounds, "samples:")
    keys = sorted(samples[tree_a][0]["queries"])
    hdr = f"{'query':8} {os.path.basename(tree_a):>18} {os.path.basename(tree_b):>18}"
    print(hdr)
    for k in keys:
        va = [s["queries"][k] for s in samples[tree_a]]
        vb = [s["queries"][k] for s in samples[tree_b]]
        print(f"{k:8} {statistics.mean(va):8.2f} ({min(va):5.2f})    "
              f"{statistics.mean(vb):8.2f} ({min(vb):5.2f})")
    ta = [s["value"] for s in samples[tree_a]]
    tb = [s["value"] for s in samples[tree_b]]
    wins_b = sum(b < a for a, b in zip(ta, tb))
    print(f"\ntotals {os.path.basename(tree_a)}: {ta}")
    print(f"totals {os.path.basename(tree_b)}: {tb}")
    print(f"mean {statistics.mean(ta):.2f} vs {statistics.mean(tb):.2f}; "
          f"adjacent pairs won by B: {wins_b}/{rounds}")


if __name__ == "__main__":
    main()
