"""The split-based syslog header parse is byte-equivalent to the
regex-group parse it replaced (functions/kayvee.py parse_lines).

parse_lines used to run SYSLOG_RE five times per line (rlike + 4x
regexp_extract); it now runs it once (validity) and derives the header
fields from one `split(line, ' ', 4)`. These tests pin the exact
equivalence claim: for EVERY input line, (line_ok, _ts_raw, hostname,
programname, body) match what regexp_extract produced — including the
documented regexp_extract conventions ('' on no-match) and Java regex
edge cases:

- `$` (non-MULTILINE) matches before one final \n, \r\n, \r, U+0085,
  U+2028, U+2029 — the body token must strip exactly that terminator;
- `.` excludes all six terminators, so an EMBEDDED terminator fails
  the match entirely;
- `\\S` excludes \t but the programname class `[^\\[ ]` permits it;
- multiple spaces / leading space / missing ': ' separator all fail.

Lines are generated from terminator/whitespace/bracket-heavy alphabets
so the adversarial shapes above actually occur.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_alerts_consumer_spark.functions.kayvee import (
    SYSLOG_RE,
    parse_lines,
)

TERMINATORS = ["\n", "\r", "\r\n", "\u0085", "\u2028", "\u2029"]

# Small alphabet concentrated on the characters that decide the parse.
_tricky = st.sampled_from(
    list(" \t[]:/-8a") + ["\n", "\r", "\u0085", "\u2028", "\u2029"]
)
_line = st.one_of(
    # NULL lines: regexp_extract(NULL) yields NULL, not ''.
    st.none(),
    # Fully arbitrary short strings over the tricky alphabet.
    st.text(alphabet=_tricky, max_size=24),
    # Near-valid shapes: header-ish prefix + arbitrary body + optional
    # trailing terminator (the `$`-tolerance edge).
    st.tuples(
        st.sampled_from(
            [
                "2017-08-15T18:39:07+00:00 host1 prog[1]: ",
                "2017-08-15T18:39:07+00:00 host1 prod--app/arn[1]: ",
                "t h p[12]: ",
                "t  h p[12]: ",  # double space -> invalid
                "t h p[12]:",  # no space after ':' -> invalid
                "t h p[x]: ",  # non-numeric pid -> invalid
                "t h p[1]x: ",  # junk after ']' -> invalid
                "t h [1]: ",  # empty programname -> invalid
                " t h p[1]: ",  # leading space -> invalid
                "t h p\t2[1]: ",  # tab inside programname class
            ]
        ),
        st.text(alphabet=_tricky, max_size=12),
        st.sampled_from([""] + TERMINATORS),
    ).map(lambda t: t[0] + t[1] + t[2]),
)


def _regex_twin(df):
    """The retired 5-pass implementation, reconstructed verbatim."""
    line = F.col("value")
    return df.select(
        line.alias("value"),
        line.rlike(SYSLOG_RE).alias("line_ok"),
        F.regexp_extract(line, SYSLOG_RE, 1).alias("_ts_raw"),
        F.regexp_extract(line, SYSLOG_RE, 2).alias("hostname"),
        F.regexp_extract(line, SYSLOG_RE, 3).alias("programname"),
        F.regexp_extract(line, SYSLOG_RE, 5).alias("body"),
    )


def _assert_equivalent(spark, lines: list[str | None]) -> None:
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    # _ts_raw is dropped by parse_lines, so its equivalence is checked
    # through the downstream `timestamp` twin (try_cast of group 1).
    got = {
        r["_raw"]: (
            r["line_ok"],
            r["hostname"],
            r["programname"],
            r["body"],
            r["timestamp"],
        )
        for r in parse_lines(df)
        .select("_raw", "line_ok", "hostname", "programname", "body",
                "timestamp")
        .collect()
    }
    want_rows = _regex_twin(df).withColumn(
        "timestamp", F.expr("try_cast(_ts_raw as timestamp)")
    ).collect()
    for r in want_rows:
        want = (r["line_ok"], r["hostname"], r["programname"], r["body"],
                r["timestamp"])
        assert got[r["value"]] == want, (
            f"split-parse diverges from regex-parse on {r['value']!r}: "
            f"got {got[r['value']]}, want {want}"
        )


@given(lines=st.lists(_line, min_size=1, max_size=64, unique=True))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_header_parse_equivalence(spark, lines):
    _assert_equivalent(spark, lines)


def test_header_parse_equivalence_pinned_edges(spark):
    """The edges that motivated the gated design, spelled out."""
    lines = [
        # valid, each trailing terminator flavor
        *[f"t h p[1]: body x{t}" for t in TERMINATORS],
        "t h p[1]: ",  # empty body
        "t h p[1]: \n",  # empty body + terminator
        "t h p[1]: a b c: d[2]: e",  # spaces/brackets in body
        "t h p\t2[1]: x",  # tab inside programname (class allows it)
        "t h p[1]: x\n\n",  # double terminator -> invalid
        "t h p[1]: x\ny",  # embedded terminator -> invalid
        "t\th p[1]: x",  # tab where regex wants a literal space
        "a b",  # too few tokens
        "",  # empty line
        None,  # NULL line: header fields stay NULL (regexp_extract(NULL))
        "2017-08-15T18:39:07+00:00 ip-10-0-0-1 prod--app/arn%3A[9]: {}",
    ]
    _assert_equivalent(spark, lines)
