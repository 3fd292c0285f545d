"""Property-based tests (SURVEY.md §5.2 item 4): the per-record
semantics hold for ARBITRARY JSON scalars, not just the golden
fixtures.

- dimension coercion is a total function: every JSON value type either
  yields the documented tag string or quarantines the record — never
  crashes, never drops silently (except documented missing-field skip);
- value resolution: numbers pass through, strings/bools/null
  quarantine, missing applies the counter/gauge default;
- route fan-out: dd point count == kvmeta 'alerts' routes (others
  ignored).

Each hypothesis example builds ONE DataFrame of records (batching keeps
the Spark-job count low); expectations are computed independently in
Python, with Java's HALF_UP %.0f semantics for number dims (the engine
documents the divergence from Go's half-even — SURVEY.md §4).
"""

from __future__ import annotations

import json
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kinesis_alerts_consumer_spark.operators.project import dd_points, quarantine
from kinesis_alerts_consumer_spark.pipeline import process_lines

HEADER = "2017-08-15T18:39:07+00:00 host1 prod--app/arn[1]: "

scalar = st.one_of(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
        ),
        max_size=12,
    ),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    st.booleans(),
    st.none(),
    st.lists(st.integers(min_value=0, max_value=9), max_size=3),
    st.dictionaries(st.sampled_from(["a", "b"]), st.integers(0, 9), max_size=2),
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk_line(body: dict) -> str:
    return HEADER + json.dumps(body)


def _route(value_field=None, dims=("x",), stat="counter"):
    return {
        "type": "alerts",
        "series": "s",
        "dimensions": list(dims),
        "stat_type": stat,
        "value_field": value_field,
        "rule": "r",
    }


def _java_format_0f(x: float) -> str:
    """Java Formatter %.0f: HALF_UP on the exact binary double value.

    Negative zero: Spark's ``parse_json`` stores small JSON numbers as
    decimal and normalizes ``-0.0`` to ``0.0``, so the engine renders
    "0" where Go's float64 path renders "-0" — documented divergence
    (SURVEY.md §4), modeled here by dropping the zero sign.
    """
    if x == 0.0:
        x = 0.0  # parse_json collapses -0.0; match the engine
    d = Decimal(x).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    return str(d)


def _expected_dim(v):
    """-> ('tag', text) | ('skip', None) | ('error', None)."""
    if isinstance(v, bool):
        return ("tag", "true" if v else "false")
    if isinstance(v, (int, float)):
        # JSON numbers arrive as float64 in the reference
        return ("tag", _java_format_0f(float(v)))
    if isinstance(v, str):
        return ("tag", v)
    return ("error", None)  # null / object / array -> record error


@given(vals=st.lists(scalar, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_dim_coercion_total(spark, vals):
    lines, want = [], []
    for i, v in enumerate(vals):
        body = {"_kvmeta": {"routes": [_route()]}}
        if v is not None or True:  # JSON null is a value, keep it
            body["x"] = v
        lines.append(_mk_line(body))
        want.append(_expected_dim(v))

    df = process_lines(
        spark.createDataFrame([(l,) for l in lines], "value string"),
        "value",
        "test-env",
    )
    pts = {
        tuple(r.tags): r
        for r in dd_points(df).collect()
    }
    n_quar = quarantine(df).count()

    want_errors = sum(1 for k, _ in want if k == "error")
    assert n_quar == want_errors
    assert len(pts) + n_quar >= 1  # total: every record lands somewhere
    got_tags = sorted(t[0] for t in pts if t)
    want_tags = sorted(
        f"x:{txt}" for k, txt in want if k == "tag"
    )
    # duplicate tag values collapse in the dict; compare as sets
    assert set(got_tags) == set(want_tags)


@given(
    vals=st.lists(scalar, min_size=1, max_size=25),
    stat=st.sampled_from(["counter", "gauge"]),
)
@settings(**_SETTINGS)
def test_value_resolution(spark, vals, stat):
    lines, want = [], []
    for v in vals:
        body = {"_kvmeta": {"routes": [_route(value_field="v", stat=stat)]}}
        body["v"] = v
        lines.append(_mk_line(body))
        if isinstance(v, bool) or isinstance(v, (str, list, dict)) or v is None:
            want.append(("error", None))
        else:
            want.append(("value", float(v)))

    df = process_lines(
        spark.createDataFrame([(l,) for l in lines], "value string"),
        "value",
        "test-env",
    )
    got_vals = sorted(r.value for r in dd_points(df).collect())
    want_vals = sorted(v for k, v in want if k == "value")
    assert quarantine(df).count() == sum(1 for k, _ in want if k == "error")
    assert len(got_vals) == len(want_vals)
    for g, w in zip(got_vals, want_vals):
        assert math.isclose(g, w, rel_tol=0, abs_tol=0), (g, w)


@given(
    n_alerts=st.integers(min_value=0, max_value=5),
    n_other=st.integers(min_value=0, max_value=3),
)
@settings(**_SETTINGS)
def test_route_fanout_count(spark, n_alerts, n_other):
    routes = [_route(dims=()) for _ in range(n_alerts)]
    routes += [
        {"type": "notifications", "channel": "#c", "rule": f"n{i}"}
        for i in range(n_other)
    ]
    line = _mk_line({"_kvmeta": {"routes": routes}})
    df = process_lines(
        spark.createDataFrame([(line,)], "value string"), "value", "test-env"
    )
    assert dd_points(df).count() == n_alerts
    if n_alerts == 0:
        assert df.filter("ignored").count() == 1


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_passage_dedup_invariants(spark, docs):
    """For ANY corpus: block accounting is conserved (dup + kept
    counts partition the blocks), kept tokens never exceed totals,
    every distinct block text survives in exactly one doc, and a
    duplicate-free corpus passes through untouched."""
    from kinesis_alerts_consumer_spark.operators.dedup import passage_dedup

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in passage_dedup(df, block=4).collect()}

    total_tokens = {i: len(words) for i, words in enumerate(docs)}
    n_blocks = {i: (len(w) + 3) // 4 for i, w in enumerate(docs)}
    distinct_blocks = {
        " ".join(w[s : s + 4])
        for w in docs
        for s in range(0, len(w), 4)
    }
    kept_total = sum(r.kept_tokens for r in out.values())
    # each distinct block text survives exactly once corpus-wide
    assert kept_total == sum(len(b.split(" ")) for b in distinct_blocks)
    for i, words in enumerate(docs):
        r = out[i]
        assert r.n_blocks == n_blocks[i]
        assert 0 <= r.n_dup_blocks <= r.n_blocks
        assert 0 <= r.kept_tokens <= total_tokens[i]


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("aB c.0!x\né")), max_size=90
        ),
        min_size=1,
        max_size=10,
    ),
    k=st.sampled_from([2, 4, 8]),
    w=st.sampled_from([2, 4]),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_winnowing_matches_python_reference(spark, texts, k, w):
    """winnow_fingerprints (codegen k-gram regex + window-min) must
    equal the executable MOSS spec (Schleimer et al. §winnowing)
    computed independently in Python: normalize, hash every char
    k-gram with md5-prefix-60-bit, keep the min of each window of w
    k-gram hashes over FULL windows only. Also pins the degenerate
    edges: a doc whose normalized form has fewer than k+w-1 chars
    yields no fingerprints (no crash, no partial-window fps)."""
    import hashlib
    import re

    from kinesis_alerts_consumer_spark.operators.dedup import (
        winnow_fingerprints,
    )

    def ref(text: str) -> set[int]:
        nt = re.sub("[^a-z0-9]", "", text.lower())
        grams = [nt[i : i + k] for i in range(len(nt) - k + 1)]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            for g in grams
        ]
        return {
            min(hs[p : p + w]) for p in range(len(grams) - w + 1)
        }

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == ref(t), (t, k, w)


def test_winnowing_shared_substring_guarantee(spark):
    """The MOSS guarantee, end to end: any two docs sharing a common
    normalized substring of length >= k + w - 1 share at least one
    fingerprint (here k=8, w=4 — the llm14 defaults)."""
    from kinesis_alerts_consumer_spark.operators.dedup import (
        winnow_fingerprints,
    )

    common = "the quick brown fox jumps!"  # 21 normalized chars >= 11
    docs = [
        (0, "AAA unrelated prefix. " + common + " zz tail one"),
        (1, "completely different opening __ " + common + " 999"),
        (2, "no overlap with anybody here at all, none whatsoever"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps: dict[int, set[int]] = {0: set(), 1: set(), 2: set()}
    for r in winnow_fingerprints(df, k=8, w=4).collect():
        fps[r.doc_id].add(r.fp)
    assert fps[0] & fps[1], "shared substring must share a fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab \t\n.x0é")), max_size=60
        ),
        min_size=1,
        max_size=12,
    ),
    n=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_shingle_regex_matches_python_reference(spark, texts, n):
    """shingle_strings (codegen lookahead regex) must implement the
    DOCUMENTED shingle semantics — consecutive n-grams over maximal
    \\S+ token runs, space-joined — on arbitrary whitespace-mangled
    unicode text (python str.split() is the executable spec). The old
    transform/element_at form differed on degenerate text only
    (split('\\n','\\s+') manufactures empty '' tokens); the regex form
    drops them, which is also what every oracle fixture contains."""
    from pyspark.sql import functions as F

    from kinesis_alerts_consumer_spark.operators.dedup import shingle_strings

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text", shingle_strings(F.col("text"), n).alias("got")
    ).collect()
    for r in rows:
        toks = r.text.split()
        want = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        assert r.got == want, (r.text, n, r.got, want)


# --- llm37 domain affinity vs an independent Python model ----------

_word = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=6,
)
_doc_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_lang = st.sampled_from(["en", "zh", "fr"])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(_doc_text, _lang), min_size=1, max_size=12))
def test_domain_affinity_matches_python_model(spark, docs_rows):
    """domain_affinity == an independently-written Python model for
    arbitrary small corpora (unicode words, empty texts, mixed langs):
    same whitespace tokenization (trim + \\s+ split, where '' yields
    the single empty token), corpus-wide conditional counts, and the
    floor(1e6 * sum_tgt / sum_all) integer form. Catches tokenizer or
    count-scope drift that the fixture oracle could miss."""
    import re

    from kinesis_alerts_consumer_spark.operators.text import domain_affinity

    rows = [(i, text, lang) for i, (text, lang) in enumerate(docs_rows)]

    def toks(text):
        return re.split(r"\s+", text.strip())

    df_all: dict = {}
    df_tgt: dict = {}
    for _i, text, lang in rows:
        for t in toks(text):
            df_all[t] = df_all.get(t, 0) + 1
            if lang == "en":
                df_tgt[t] = df_tgt.get(t, 0) + 1
    want = {}
    for i, text, _lang in rows:
        ts = toks(text)
        sum_all = sum(df_all[t] for t in ts)
        sum_tgt = sum(df_tgt.get(t, 0) for t in ts)
        want[i] = (len(ts),
                   math.floor(sum_tgt * 1000000.0 / float(sum_all)))

    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: (r.n_tok, r.affinity_ppm)
        for r in domain_affinity(docs, target_lang="en").collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(_doc_text, min_size=1, max_size=10),
    st.lists(_doc_text, min_size=1, max_size=10),
    st.sampled_from([32, 256, 4096]),
    st.sampled_from([1, 2, 4]),
)
def test_bloom_dedup_equals_plain_for_any_corpus_and_sizing(
    spark, old_texts, new_texts, m_bits, k
):
    """incremental_new_docs_bloom == incremental_new_docs for
    arbitrary snapshots and ANY (m_bits, k) — including bitmaps so
    small every probe collides. The no-false-negative equivalence is
    the operator's entire correctness story; randomizing the dup
    structure (hypothesis may generate overlapping, duplicated, or
    disjoint texts) exercises both branches."""
    from kinesis_alerts_consumer_spark.operators.dedup import (
        incremental_new_docs,
        incremental_new_docs_bloom,
    )

    old = spark.createDataFrame(
        [(i, t) for i, t in enumerate(old_texts)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(new_texts)],
        "doc_id long, text string",
    )
    plain = sorted(map(tuple, incremental_new_docs(new, old).collect()))
    bloom = sorted(
        map(
            tuple,
            incremental_new_docs_bloom(
                new, old, m_bits=m_bits, k=k
            ).collect(),
        )
    )
    assert bloom == plain


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        # arbitrary unicode incl. whitespace runs, punctuation, CJK,
        # empty — the shapes the token_stats count identities must
        # survive (r10 rewrite: regexp_count replaced materializing
        # forms; see operators/text.py docstring)
        st.text(
            alphabet=st.characters(
                codec="utf-8", categories=("L", "N", "P", "Z", "Cc")
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_token_stats_count_identities(spark, texts):
    """token_stats' counting rewrites are value-identical to the
    materializing forms they replaced: regexp_count(re) ==
    size(regexp_extract_all(re)) and length - regexp_count('\\s') ==
    length(regexp_replace('\\s+','')) for ANY text, including empty
    strings, whitespace runs, unicode spaces and control chars (the
    Java regex \\s class is shared, so drift is impossible — this
    test pins that argument against future edits)."""
    from pyspark.sql import functions as F

    from kinesis_alerts_consumer_spark.operators.text import token_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict() for r in token_stats(df).collect()
    }
    toks = F.split(F.trim(F.col("text")), r"\s+")
    old = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            F.size(
                F.regexp_extract_all(
                    F.col("text"), F.lit(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]"), 0
                )
            ).alias("n_subtokens"),
            F.round(
                F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
                / F.size(toks),
                6,
            ).alias("mean_token_len"),
        ).collect()
    }
    for i in got:
        assert got[i]["n_subtokens"] == old[i]["n_subtokens"], (
            i, texts[i], got[i], old[i],
        )
        assert got[i]["mean_token_len"] == old[i]["mean_token_len"], (
            i, texts[i], got[i], old[i],
        )
