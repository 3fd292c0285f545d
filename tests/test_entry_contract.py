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
    # 107 = the 98-query r11 surface + llm39 (debuted r12) + llm40,
    # llm41, llm42, st09 (debuted r13) + mm04/mm05/mm06/st10 (debuted
    # r14, outside the window per the rotation plan)
    assert len(qs) == 107
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
    # round-14 rotation: the window IS the explicit _R14_WINDOW set —
    # the 48 keys whose last green driver row is r12 (the full r12
    # window), with FIVE swaps per VERDICT r13 item 1: the five keys
    # without a trailing-two-round driver row seated (dq05 + the four
    # r13 debutantes llm40/llm41/llm42/st09), the five stablest
    # r12-window keys displaced as riders.
    assert entry._R14_WINDOW <= window, sorted(entry._R14_WINDOW - window)
    assert len(entry._R14_WINDOW) == 48
    # the five priority seats individually — the whole point of r14
    for must in ("dq05_regex_extract", "llm40_incremental_near_dup",
                 "llm41_hyperplane_incremental", "llm42_split_assign",
                 "st09_stream_incremental_dedup"):
        assert must in window, f"{must} must hold a priority r14 seat"
    # the remaining last-green-in-r12 keys (family spot-pins; the full
    # list is the _R14_WINDOW literal itself)
    for must in (["ext01", "ext02", "ext04", "ext07"]
                 + ["kv%02d_" % i for i in range(1, 6)]
                 + ["llm%02d_" % i for i in range(1, 14)]
                 + ["llm15", "llm17", "llm18", "llm19", "llm20",
                    "llm21", "llm22", "llm23"]
                 + ["llm25", "llm33", "llm35", "llm36", "llm38"]
                 + ["mm01", "mm02"]
                 + ["st01", "st02", "st04", "st05", "vol02", "vol03"]):
        hit = [n for n in window if n.startswith(must)]
        assert hit, f"{must} must be inside the r14 window"
    # everything green in r13 — plus the five displaced riders — must
    # NOT consume window slots (spot-pin the families)
    for out in (["dq01", "dq02", "dq03", "dq04"]
                + ["dq%02d_" % i for i in range(6, 32)]
                + ["ext03", "kv06", "kv07", "llm14", "llm16", "llm24"]
                + ["llm%02d_" % i for i in range(26, 33)]
                + ["llm34", "llm37", "llm39", "mm03"]
                + ["st03", "st06", "st07", "st08", "vol01", "vol04"]):
        hit = [n for n in window if n.startswith(out)]
        assert not hit, f"{out} should be outside the window: {hit}"
    # no-oracle entries last inside the window, fewest-rows ext06 first
    assert names[48:50] == ["ext06_approx_quantiles", "ext05_approx_distinct"]


def test_substitute_rider_set_is_exactly_the_documented_list():
    """VERDICT r13 item 6: with 101 oracle-backed keys and 96 trailing
    two-window slots, five keys per cycle ride the substitute protocol.
    Pin it structurally: the keys absent from BOTH trailing windows
    must be exactly the documented ``_R14_RIDERS`` list — so a key
    cannot silently go three rounds without either a driver row or a
    recorded substitute verify. Updating a window without updating the
    rider list (or vice versa) fails here loudly."""
    oracle_backed = set(entry.oracle_sql())
    riders = oracle_backed - (entry._R13_WINDOW | entry._R14_WINDOW) \
        - entry._R14_DEBUTS
    assert riders == entry._R14_RIDERS, (
        sorted(riders ^ entry._R14_RIDERS))
    # debutantes are genuinely new this round: outside both windows,
    # never a rider
    assert not entry._R14_DEBUTS & (
        entry._R13_WINDOW | entry._R14_WINDOW | entry._R14_RIDERS)
    # the windows themselves must be disjoint (each key's seat counts
    # once) and every rider must be oracle-backed (the no-oracle
    # ext05/ext06 entries are pinned at 49-50, not riders)
    assert not entry._R13_WINDOW & entry._R14_WINDOW
    assert entry._R14_RIDERS <= oracle_backed
    # each rider is covered by the substitute protocol: the in-session
    # full-surface verify cited in the r14 rotation commit ran all 101
    # oracle-backed keys at sf0.01 via scripts/driver_emulation.py;
    # riders additionally carry pytest oracle twins in their family
    # test modules (dq01/dq02 test_declared_queries, ext03
    # test_extended_queries, mm03 test_multimodal, llm16
    # test_llm_queries).


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


def test_bench_medians_pass_is_detail_only_and_after_timed_pass():
    """r15 (VERDICT r14 item 7): the optional medians pass re-runs
    >=threshold queries in a THIRD per-family pass — the stdout-line
    timing must remain the FIRST timed run (the r14 protocol,
    byte-identical when medians are off), the medians land in the
    caller's dict, and streaming extra runs still unload state stores.
    """
    from bench import is_streaming_query, run_suite, suite_families

    names = list(entry.queries())
    events: list[str] = []
    medians: dict[str, float] = {}
    timings = run_suite(
        names,
        run_query=lambda name: events.append(name),
        unload_state_stores=lambda: events.append("<unload>"),
        medians=medians,
        median_threshold=0.0,  # force the pass with instant stubs
        median_extra_runs=2,
    )
    assert sorted(timings) == sorted(names)
    executed = [e for e in events if e != "<unload>"]
    # warm-up + timed + 2 median re-runs
    assert all(executed.count(n) == 4 for n in names)
    assert sorted(medians) == sorted(names)
    # per family: the medians pass starts only after EVERY query of
    # the family has its timed run (the stdout number's protocol is
    # untouched) — i.e. within a family, the 3rd occurrence of any
    # query comes after the 2nd occurrence of every query
    for family in suite_families(names):
        second = {n: [i for i, e in enumerate(executed) if e == n][1]
                  for n in family}
        third = {n: [i for i, e in enumerate(executed) if e == n][2]
                 for n in family}
        assert min(third.values()) > max(second.values())
    # unload still follows every streaming execution, incl. re-runs
    for i, e in enumerate(events):
        if is_streaming_query(e):
            assert events[i + 1] == "<unload>", (i, e)
    # detail carries medians; the line does not
    from bench import build_bench_line, build_detail

    line = build_bench_line(timings, "0.1")
    detail = build_detail(line, timings, medians=medians)
    assert "medians" not in json.loads(line)
    assert detail["medians"] == dict(sorted(medians.items()))


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
    # the TRUE worst case includes the degraded key (ADVICE r8) AND a
    # warmup_failures list (VERDICT r13 item 2 — every query failing
    # warm-up at once): the full surface plus every protocol-failure
    # marker must still fit the driver's tail buffer
    worst = build_bench_line(
        {n: 12345.6789 for n in names}, "0.1",
        degraded=("state_unload",),
        warmup_failures=tuple(names),
    )
    parsed_worst = json.loads(worst)
    assert len(worst) < 1900
    assert parsed_worst["degraded"] == ["state_unload"]
    # in the doubly-pathological case (every timing 5-digit AND every
    # warm-up failed) the field degrades to a bare count — the health
    # signal survives even when no name fits
    all_short = sorted({n.split("_", 1)[0] for n in names})
    wf = parsed_worst["warmup_failures"]
    if isinstance(wf, int):
        assert wf == len(all_short)
    else:
        kept, marker = wf[:-1], wf[-1]
        assert kept == all_short[:len(kept)]
        assert marker == f"+{len(all_short) - len(kept)}more"
    # with realistic timing magnitudes the same all-fail case keeps
    # the leading names + an overflow marker
    realistic = json.loads(build_bench_line(
        {n: 1.0 for n in names}, "0.1", warmup_failures=tuple(names),
    ))
    wf = realistic["warmup_failures"]
    assert wf[:-1] == all_short[:12]
    assert wf[-1] == f"+{len(all_short) - 12}more"
    # a small failure set is carried verbatim
    few = json.loads(build_bench_line(
        {n: 1.0 for n in names}, "0.1",
        warmup_failures=("st09_stream_incremental_dedup",
                         "llm40_incremental_near_dup"),
    ))
    assert few["warmup_failures"] == ["llm40", "st09"]
    # a clean run carries NO warmup_failures key (absence == health,
    # same contract as degraded)
    clean = json.loads(build_bench_line({n: 1.0 for n in names}, "0.1"))
    assert "warmup_failures" not in clean and "degraded" not in clean
    # the DETAIL payload (BENCH_DETAIL.json) restores what the
    # tail-buffer constraint truncated: full-name timings and the
    # FULL warmup-failure names even in the mass-failure case where
    # the stdout line degraded to prefixes+marker (r14 review)
    from bench import build_detail

    detail = build_detail(realistic_line := build_bench_line(
        {n: 1.0 for n in names}, "0.1", warmup_failures=tuple(names)),
        {n: 1.0 for n in names}, tuple(names))
    assert json.loads(realistic_line)["warmup_failures"][-1].endswith(
        "more")
    assert detail["warmup_failures"] == sorted(names)
    assert set(detail["queries"]) == set(names)
    clean_detail = build_detail(clean_line := build_bench_line(
        {n: 1.0 for n in names}, "0.1"), {n: 1.0 for n in names})
    assert "warmup_failures" not in clean_detail
    assert json.loads(clean_line)["value"] == clean_detail["value"]
