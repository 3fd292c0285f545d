"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is executed via the same path the correctness harness uses
(register views -> spark.sql / DataFrame op) and fully drained with a
collect so the measured time includes the whole plan, not just
planning. Every query is run once un-timed first (time-the-second-run
protocol) so the numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# The streaming-entry NAMING SHAPE (st01_stream_..., pinned by the
# contract test against the actual STREAMING_QUERIES registry), not a
# bare startswith("st"): a future batch entry named e.g.
# stats01_profile must NOT be silently timed last with per-run
# state-store unloads (ADVICE r8). \d+ not \d{2}: a hypothetical
# st100_stream_* entry must stay in the streaming family at RUN time,
# not only be caught by the contract test's registry cross-check
# (ADVICE r9).
_STREAMING_NAME = re.compile(r"st\d+_stream_")


def is_streaming_query(name: str) -> bool:
    return bool(_STREAMING_NAME.match(name))


def suite_families(names) -> list[list[str]]:
    """Execution grouping: all batch queries first, the Structured
    Streaming st* family strictly last. Every st execution leaves JVM
    residue (cached RocksDB state-store providers, state/scratch
    shuffle files) that inflated later batch queries up to 10x
    in-suite (vol04 11.07 s in the r7 artifact vs ~1.1 s isolated),
    so no batch timing may run in a JVM that has executed a streaming
    query. The contract test pins this split."""
    return [
        sorted(n for n in names if not is_streaming_query(n)),
        sorted(n for n in names if is_streaming_query(n)),
    ]


def run_suite(names, run_query, unload_state_stores,
              on_warmup_error=None, medians=None,
              median_threshold=1.0, median_extra_runs=2) -> dict[str, float]:
    """The suite's execution wiring, factored out so the contract test
    can drive it with stubs and assert the REAL order (not just the
    suite_families split): per family, warm up every query, then time
    every query; after each streaming execution (warm-up and timed),
    unload cached state-store providers so the next streaming timing
    starts from the isolated-run condition — each st run caches
    providers for its own fresh-UUID checkpoint that no later query
    can reuse, so the cache is pure residue (RocksDB native memory +
    maintenance work) that made late st-family timings swing up to
    2.5x (st04 1.93-4.86 s across the r8 acceptance runs).

    ``medians`` (r15, VERDICT r14 item 7): when a dict is passed,
    every query whose timed run was >= ``median_threshold`` seconds is
    re-run ``median_extra_runs`` more times in a THIRD per-family pass
    — strictly AFTER the timed pass, so the stdout-line numbers come
    from exactly the r14 protocol — and the median of all its timed
    runs lands in the dict. Detail-file only (the per-query ±1-2 s
    single-run noise made driver statuses weakly informative); the
    stdout line and its `value` stay the single-timed-run record."""
    import statistics

    timings: dict[str, float] = {}
    for family in suite_families(names):
        streaming_family = bool(family) and is_streaming_query(family[0])
        for name in family:
            try:
                run_query(name)
            except Exception as exc:  # timed run will surface it properly
                if on_warmup_error is not None:
                    on_warmup_error(name, exc)
            if streaming_family:
                unload_state_stores()
        for name in family:
            start = time.perf_counter()
            run_query(name)
            timings[name] = round(time.perf_counter() - start, 4)
            if streaming_family:
                unload_state_stores()
        if medians is None:
            continue
        for name in family:
            if timings[name] < median_threshold:
                continue
            reruns = [timings[name]]
            for _ in range(median_extra_runs):
                start = time.perf_counter()
                run_query(name)
                reruns.append(round(time.perf_counter() - start, 4))
                if streaming_family:
                    unload_state_stores()
            medians[name] = round(statistics.median(reruns), 4)
    return timings


def build_bench_line(timings: dict[str, float], sf: str,
                     degraded: tuple[str, ...] = (),
                     warmup_failures: tuple[str, ...] = ()) -> str:
    """The canonical stdout JSON line. The driver records only the
    LAST ~2000 chars of stdout and json-parses the final line; full
    query names blow that budget (BENCH_r01..r03 all show
    "parsed": null with the line truncated mid-number), so the line
    uses SHORT keys — the unique "dq01"/"kv01"/"llm03" name prefix of
    each query (mapping documented in BASELINE.md). The contract test
    calls THIS function so test and emitter cannot drift.

    ``degraded`` names measurement-protocol steps that FAILED during
    the run (e.g. ``state_unload``): they make the artifact carry its
    own health so a silently weakened protocol (st timings quietly
    residue-inflated again) is visible in BENCH_r{N}.json, not just on
    a stderr stream the driver throws away.

    ``warmup_failures`` names queries whose WARM-UP run threw (short
    keys, like ``queries``): their timed number ran cold — one-time
    compile costs included — so the artifact must say so. BENCH_r13's
    tail carried an anonymous py4j stack from exactly this path
    (VERDICT r13 item 2): the stderr message embedded the full Java
    stack, scrolling the query name out of the driver's ~2000-char
    tail buffer, and nothing in the JSON line recorded that a warm-up
    had failed at all."""
    # centisecond resolution below 1000 s, whole seconds above: a
    # >=1000 s timing is a pathology where 0.01 s is noise, and the
    # width bound is what keeps the worst-case line inside the
    # driver's tail buffer (8 chars/value overflowed at 104 queries;
    # the contract test re-proves the bound at the CURRENT surface —
    # 106 as of r14 — on every run)
    short = {
        name.split("_", 1)[0]: round(t, 2) if t < 1000 else int(round(t))
        for name, t in timings.items()
    }
    # Driver-contract guards: real raises, not asserts — python -O
    # strips asserts and an over-long/key-colliding line would reach
    # the driver's 2000-char tail buffer unparsed.
    if len(short) != len(timings):
        raise RuntimeError("bench short keys must stay unique")
    payload = {
        "metric": "declared_query_suite_wall_clock",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": short,
        "sf": sf,
        # Warm-up protocol: every query once at the target SF (absorbs
        # per-query-shape compile: py4j tree build, Catalyst analysis,
        # janino codegen, worker-pool spawn), plus one pandas_udf
        # identity. Warm-up + timing proceed per family — batch first,
        # streaming (st*) last — so streaming state-store residue
        # never touches a batch timing. Steady-state timings mirror a
        # deployment where a query compiles once and runs for hours.
        "warmup": ["per_family@sf", "pandas_pool"],
    }
    if degraded:
        payload["degraded"] = sorted(set(degraded))
    wf_full = sorted({name.split("_", 1)[0] for name in warmup_failures})
    # compact separators: at 96+ queries the default ", "/": " padding
    # alone (~200 chars) would push the worst-case line past the
    # driver's ~2000-char stdout tail buffer
    compact = {"separators": (",", ":")}
    # warmup_failures is the one unbounded optional field (the full
    # 106-key surface's short keys alone are ~800 chars): shrink it
    # until the line fits,
    # keeping an overflow marker with the true count — a run where
    # warm-ups fail en masse is catastrophically unhealthy and the
    # count says so; the leading names still identify the victims.
    for keep in range(min(12, len(wf_full)), -1, -1):
        if wf_full:
            wf = wf_full[:keep]
            if keep < len(wf_full):
                wf.append(f"+{len(wf_full) - keep}more")
            payload["warmup_failures"] = wf
        line = json.dumps(payload, **compact)
        if len(line) < 1900:
            break
    if len(line) >= 1900 and wf_full:
        # last resort (every warm-up failed AND every timing is
        # 5-digit): a bare count — the health signal survives even
        # when no name fits
        payload["warmup_failures"] = len(wf_full)
        line = json.dumps(payload, **compact)
    if len(line) >= 1900:
        raise RuntimeError(f"bench JSON line too long ({len(line)})")
    return line


def build_detail(line: str, timings: dict[str, float],
                 warmup_failures: tuple[str, ...] = (),
                 medians: dict[str, float] | None = None) -> dict:
    """BENCH_DETAIL.json payload: the stdout line's fields with
    FULL-NAME timings, and — unlike the tail-buffer-constrained line —
    the FULL warmup-failure names. In a mass warm-up failure the
    stdout line truncates to short-key prefixes + an overflow marker
    (or a bare count); the detail file has no length constraint and is
    the durable artifact, so it must preserve the victims' names
    (r14 review). ``medians`` (r15): per-query in-process 3x medians
    for the >=1 s queries (see ``run_suite``) — detail-file only, so
    the next judge can separate noise from regression without
    trusting prose; the stdout line is unchanged."""
    detail = {**json.loads(line), "queries": timings}
    if warmup_failures:
        detail["warmup_failures"] = sorted(set(warmup_failures))
    if medians:
        detail["medians"] = dict(sorted(medians.items()))
    return detail


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # A ~200-execution suite (warm-up + timed pass over the full surface)
    # overflows HotSpot's default 240 MB code cache; once the JIT
    # starts flushing, late-suite queries degrade 2-3x (st02 measured
    # 5.9 s vs 2.4 s steady). 512 MB was stable at the 98-query
    # surface; the r12 99-query suite (llm39's banded-signature
    # stages) tipped it back into flushing — roaming 2-10x spikes on
    # codegen-heavy queries (llm34 1.5->15.8 s in one run, llm14/15/
    # 07/05 in another, different victims each run), while a 1g cache
    # ran spike-free (113.4 vs 135.8/121.8/160.3 s totals, same tree,
    # same host). 1 GB is code-cache reservation, not heap — the
    # earlier 1g-HEAP + AlwaysPreTouch slowdown (see session.py) does
    # not apply. Bench-local default; any caller-set value wins.
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:ReservedCodeCacheSize=1g"
    )

    from kinesis_alerts_consumer_spark.session import get_spark
    from kinesis_alerts_consumer_spark.sources import register_tables

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="kinesis-alerts-consumer-spark-bench")
    register_tables(spark, sf_dir)

    qs = entrymod.queries()

    # Optional subset for scale rehearsals (comma-separated names):
    # SPARK_GRAFT_QUERIES=kv01_route_project,llm15_dedup_clusters ...
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    if subset:
        keep = {q.strip() for q in subset.split(",") if q.strip()}
        unknown = keep - qs.keys()
        if unknown:
            raise SystemExit(f"unknown SPARK_GRAFT_QUERIES: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in keep}

    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _identity(x):
        return x

    cores = spark.sparkContext.defaultParallelism
    spark.range(0, 2 * cores, 1, cores).select(_identity("id")).collect()

    # Warm-up rationale: a query's first run pays one-time
    # per-QUERY-SHAPE costs that are independent of data scale — py4j
    # Column-tree construction (memoized per shape), Catalyst
    # analysis, janino/HotSpot compile of the generated code (cached
    # on source text), Python/Arrow worker-pool spawn — measured at
    # 2-16 s per kayvee/streaming query vs ~2 s steady state at sf0.1,
    # and an sf0.001-only warm-up still left ~1 s/query of
    # scale-transition residue (AQE/JIT at the larger input). A
    # deployment compiles a query once and runs it for hours over
    # 100 TB, so steady state is the number that scales; the protocol
    # is declared in the output line ("warmup": ["per_family@sf",
    # "pandas_pool"]). Execution order lives in run_suite.
    degraded: list[str] = []

    def unload_state_stores() -> None:
        try:
            jvm = spark._jvm
            jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        except Exception as exc:  # internal API: degrade to old behavior,
            # but carry the failure into the artifact (see
            # build_bench_line's `degraded`) — stderr alone is thrown
            # away by the driver.
            if "state_unload" not in degraded:
                degraded.append("state_unload")
            print(f"state-store unload skipped: {exc}", file=sys.stderr)

    warmup_failures: list[str] = []

    def on_warmup_error(name: str, exc: Exception) -> None:
        # ONE line: name + exception class + first message line. A py4j
        # exception stringifies with its full Java stack; printed raw it
        # scrolled the query name out of the driver's ~2000-char tail
        # buffer (BENCH_r13's anonymous trace — VERDICT r13 item 2).
        # For Py4JJavaError that first line is only the generic wrapper
        # ("An error occurred while calling o123.collect") — append the
        # Java root cause's own first line so the record says WHY, not
        # just where.
        first = str(exc).splitlines()[0][:200] if str(exc) else ""
        java = getattr(exc, "java_exception", None)
        if java is not None:
            try:
                first += " <- " + str(java).splitlines()[0][:200]
            except Exception:
                pass  # cause attribution is best-effort
        print(f"warmup {name} failed: {type(exc).__name__}: {first}",
              file=sys.stderr)
        warmup_failures.append(name)

    # in-process 3x medians for the >=1 s queries, detail-file only
    # (VERDICT r14 item 7). SPARK_GRAFT_MEDIANS=0 disables the extra
    # runs (e.g. for scale rehearsals where wall-clock matters).
    medians: dict[str, float] | None = (
        {} if os.environ.get("SPARK_GRAFT_MEDIANS", "1") != "0" else None
    )
    timings = run_suite(
        qs,
        run_query=lambda name: qs[name](spark, sf_dir).collect(),
        unload_state_stores=unload_state_stores,
        on_warmup_error=on_warmup_error,
        medians=medians,
    )

    line = build_bench_line(timings, sf, degraded=tuple(degraded),
                            warmup_failures=tuple(warmup_failures))
    # full-name detail for humans; stdout line is the driver contract
    detail = build_detail(line, timings, tuple(warmup_failures),
                          medians=medians)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DETAIL.json"), "w"
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass  # detail file is best-effort; the stdout line is the contract
    print(line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
