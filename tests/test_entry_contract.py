"""Driver-contract pins for ``__spark_entry__`` and ``bench.py``.

The driver (a) snapshots correctness for exactly the FIRST 50 keys of
``queries()`` insertion order, and (b) json-parses the LAST line of
bench stdout from a ~2000-char tail buffer. Both contracts were
discovered empirically (CORRECTNESS_r01-r03 key sets; BENCH_r01-r03
``"parsed": null``) and are easy to regress silently — pin them.
"""

from __future__ import annotations

import json

import __spark_entry__ as entry


def test_query_count_and_oracle_coverage():
    qs = entry.queries()
    osql = entry.oracle_sql()
    # 103 = the 98-query r11 surface + llm39 (debuted r12) + llm40,
    # llm41, llm42, st09 (debuted r13, outside the window per the
    # rotation plan)
    assert len(qs) == 103
    # every oracle key is a query; only the two approximate aggregates
    # are rows-only
    assert set(osql) <= set(qs)
    assert set(qs) - set(osql) == {
        "ext05_approx_distinct",
        "ext06_approx_quantiles",
    }


def test_driver_window_priority():
    names = list(entry.queries())
    window = set(names[:50])
    # round-13 rotation: the window IS the explicit _R13_WINDOW set —
    # the 48 keys whose last green driver row is r11 (the r12 verdict's
    # mandatory rotation list; the full r11 window) with ONE swap per
    # VERDICT r12 item 1: dq05 (seven-rounds-stable) out, llm39 (the
    # only never-driver-verified oracle-backed key) in.
    assert entry._R13_WINDOW <= window, sorted(entry._R13_WINDOW - window)
    assert len(entry._R13_WINDOW) == 48
    # the 48 mandatory last-green-in-r11 keys individually (family
    # spot-pins; the full list is the _R13_WINDOW literal itself)
    for must in (["dq03", "dq04"]
                 + ["dq%02d_" % i for i in range(6, 32)]
                 + ["kv06", "kv07", "llm14", "llm24"]
                 + ["llm%02d_" % i for i in range(26, 33)]
                 + ["llm34", "llm37", "llm39"]
                 + ["st03", "st06", "st07", "st08", "vol01", "vol04"]):
        hit = [n for n in window if n.startswith(must)]
        assert hit, f"{must} must be inside the r13 window"
    # everything green in r12 — plus displaced dq05 — must NOT consume
    # window slots (spot-pin the families)
    for out in (["dq01", "dq02", "dq05"]
                + ["ext01", "ext02", "ext03", "ext04", "ext07"]
                + ["kv%02d_" % i for i in range(1, 6)]
                + ["llm%02d_" % i for i in range(1, 14)]
                + ["llm%02d_" % i for i in range(15, 24)]
                + ["llm25", "llm33", "llm35", "llm36", "llm38"]
                + ["mm01", "mm02", "mm03"]
                + ["st01", "st02", "st04", "st05", "vol02", "vol03"]):
        hit = [n for n in window if n.startswith(out)]
        assert not hit, f"{out} should be outside the window: {hit}"
    # no-oracle entries last inside the window, fewest-rows ext06 first
    assert names[48:50] == ["ext06_approx_quantiles", "ext05_approx_distinct"]


def test_bench_family_isolation_order():
    """Pin the r8 residue fix by driving the REAL execution wiring
    (run_suite) with stubs: every batch execution must happen before
    ANY Structured Streaming (st*) execution — streaming runs leave
    state-store residue that inflated batch timings up to 10x — and
    the state-store unload must fire after every streaming execution
    (warm-up and timed) and never around a batch one."""
    from bench import run_suite, suite_families

    from kinesis_alerts_consumer_spark.plans.streaming_queries import (
        STREAMING_QUERIES,
    )

    names = list(entry.queries())
    batch, streaming = suite_families(names)
    # the split must agree with the REAL streaming registry, not just
    # with bench's own name predicate (ADVICE r8: a batch entry named
    # stats01_* must not be misgrouped into the streaming family)
    assert sorted(streaming) == sorted(STREAMING_QUERIES)
    assert batch and not set(batch) & set(STREAMING_QUERIES)
    assert sorted(batch + streaming) == sorted(names)
    # the predicate rejects st-prefixed batch shapes outright
    from bench import is_streaming_query

    assert not is_streaming_query("stats01_profile")
    assert not is_streaming_query("st99_batch_thing")
    assert is_streaming_query("st01_stream_hourly_rollup")
    # 3+ digit streaming names stay in the streaming family at RUN
    # time, not just under the registry cross-check (ADVICE r9)
    assert is_streaming_query("st100_stream_future_thing")

    events: list[str] = []
    timings = run_suite(
        names,
        run_query=lambda name: events.append(name),
        unload_state_stores=lambda: events.append("<unload>"),
    )
    assert sorted(timings) == sorted(names)
    executed = [e for e in events if e != "<unload>"]
    first_streaming = min(
        i for i, e in enumerate(executed) if is_streaming_query(e)
    )
    assert not any(
        not is_streaming_query(e) for e in executed[first_streaming:]
    ), "a batch query executed after a streaming query"
    # every query runs exactly twice (warm-up + timed)
    assert all(executed.count(n) == 2 for n in names)
    # unload follows every streaming execution, and only those
    for i, e in enumerate(events):
        if is_streaming_query(e):
            assert events[i + 1] == "<unload>", (i, e)
    n_st_runs = sum(1 for e in executed if is_streaming_query(e))
    assert events.count("<unload>") == n_st_runs


def test_bench_line_fits_driver_tail_buffer():
    """Exercises bench.py's REAL line builder (not a replica), so any
    key added to the emitted line or change to the short-key scheme is
    measured against the driver's ~2000-char tail buffer here."""
    from bench import build_bench_line

    names = list(entry.queries())
    line = build_bench_line({n: 12345.6789 for n in names}, "0.1")
    parsed = json.loads(line)
    assert len(line) < 1900
    assert parsed["unit"] == "sec" and len(parsed["queries"]) == len(names)
    # the TRUE worst case includes the degraded key (ADVICE r8): the
    # full surface plus every protocol-failure marker must still fit
    worst = build_bench_line(
        {n: 12345.6789 for n in names}, "0.1",
        degraded=("state_unload",),
    )
    assert len(worst) < 1900
    assert json.loads(worst)["degraded"] == ["state_unload"]
