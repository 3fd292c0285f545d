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
    assert len(qs) == 96
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
    # round-8 rotation: the window IS the explicit _R8_WINDOW set —
    # the 46 entries whose last green row is r6 (the r7 verdict's
    # mandatory rotation list), plus kv01/st05 as changed-code
    # re-validations (both ride the routing.py mongo-guard change).
    assert entry._R8_WINDOW <= window, sorted(entry._R8_WINDOW - window)
    assert len(entry._R8_WINDOW) == 48
    # the 46 mandatory last-green-in-r6 keys individually (family
    # spot-pins; the full list is the _R8_WINDOW literal itself)
    for must in (["dq01", "dq02", "ext01", "ext02", "ext03", "ext04",
                  "ext07", "kv02", "kv03", "kv04", "kv05"]
                 + ["llm%02d" % i for i in range(1, 14)]
                 + ["llm%02d" % i for i in range(15, 24)]
                 + ["llm25", "llm33", "llm35", "llm36",
                    "mm01", "mm02", "mm03",
                    "st01", "st02", "st03", "st04",
                    "vol02", "vol03",
                    # changed-code re-validation slots (routing.py
                    # mongo-guard riders out of the r6 list)
                    "kv01_route_project",
                    "st05_stream_kayvee_pipeline"]):
        hit = [n for n in window if n.startswith(must)]
        assert hit, f"{must} must be inside the r8 window"
    # everything green in r7 must NOT consume window slots (spot-pin
    # the families; kv01/st05 are deliberate re-validations)
    for out in ("dq03", "dq17", "dq31", "kv06", "kv07", "llm14",
                "llm24", "llm26", "llm32", "llm34", "st06", "st07",
                "st08", "vol01", "vol04"):
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

    names = list(entry.queries())
    batch, streaming = suite_families(names)
    assert streaming and all(n.startswith("st") for n in streaming)
    assert batch and not any(n.startswith("st") for n in batch)
    assert sorted(batch + streaming) == sorted(names)

    events: list[str] = []
    timings = run_suite(
        names,
        run_query=lambda name: events.append(name),
        unload_state_stores=lambda: events.append("<unload>"),
    )
    assert sorted(timings) == sorted(names)
    executed = [e for e in events if e != "<unload>"]
    first_streaming = min(
        i for i, e in enumerate(executed) if e.startswith("st")
    )
    assert not any(
        not e.startswith("st") for e in executed[first_streaming:]
    ), "a batch query executed after a streaming query"
    # every query runs exactly twice (warm-up + timed)
    assert all(executed.count(n) == 2 for n in names)
    # unload follows every streaming execution, and only those
    for i, e in enumerate(events):
        if e.startswith("st") and not e.startswith("st<"):
            assert events[i + 1] == "<unload>", (i, e)
    n_st_runs = sum(1 for e in executed if e.startswith("st"))
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
