"""The guarded mongo slow-query matcher is equivalent to the bare
regex matcher it wraps (operators/routing.py).

The mongo rule used to run MONGO_SLOW_RE on EVERY rawlog; it is now
gated behind ``startswith(rawlog, '[conn') AND contains(rawlog, 'ms')``
(codegen substring probes, no regex) so non-mongo lines — the
overwhelming majority in production — never enter the regex engine.
The gate is sound only if it is IMPLIED by the pattern: MONGO_SLOW_RE
is anchored ``^\\[conn`` (Java ``^`` without MULTILINE matches only at
input start) and contains the literal ``ms`` before ``$``, so any
match satisfies the guard and ``guard AND rlike == rlike`` for every
input — including the Java ``$``-before-final-line-terminator
tolerance (a line ending ``...5ms\\n`` matches the regex AND contains
'ms', so the guard never disagrees) and NULL rawlogs (both sides
evaluate NULL; the route CASE takes the else branch either way).

These tests pin that claim for the two expression sites that carry the
guard: the route-array CASE (``_mongo_slow_query_routes_sql``) and the
derived-field predicate (``_mongo_field_exprs``), each compared
against its reconstructed unguarded twin over adversarial inputs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_alerts_consumer_spark.operators.routing import (
    MONGO_SLOW_RE,
    _mongo_guard,
)

# Java `$` (non-MULTILINE) also matches before one final terminator.
TERMINATORS = ["\n", "\r", "\r\n", "", " ", " "]

# Alphabet concentrated on the characters that decide guard vs regex:
# bracket/digit/space for the [connNN] header, 'm'/'s' so 'ms' can
# appear with and without a preceding digit, terminators for the `$`
# tolerance edge.
_tricky = st.sampled_from(
    list("[]conn 123ms.xq{}\t") + ["\n", "\r", "", " "]
)
_line = st.one_of(
    # NULL rawlog: rlike(NULL) and the guard are both NULL.
    st.none(),
    # Fully arbitrary short strings over the tricky alphabet.
    st.text(alphabet=_tricky, max_size=32),
    # Near-valid shapes: mongo-ish prefix + body + millis-ish suffix +
    # optional trailing terminator.
    st.tuples(
        st.sampled_from(
            [
                "[conn123] query db.coll ",  # valid header
                "[conn] query db.coll ",  # no digits -> regex fails
                "[Conn123] query db.coll ",  # case -> guard+regex fail
                " [conn123] query db.coll ",  # leading space -> both fail
                "[conn123]  query db.coll ",  # double space -> \s group edge
                "[conn123] QUERY db.coll ",  # op class is [a-z]+
                "[conn123] query  ",  # namespace missing
            ]
        ),
        st.text(alphabet=_tricky, max_size=12),
        st.sampled_from(["137ms", "ms", "9 ms", "9m", "", "COLLSCAN 5ms"]),
        st.sampled_from([""] + TERMINATORS),
    ).map(lambda t: t[0] + t[1] + " " + t[2] + t[3]),
)


def _assert_equivalent(spark, lines: list[str | None]) -> None:
    df = spark.createDataFrame([(s,) for s in lines], "rawlog string")
    bare = F.col("rawlog").rlike(MONGO_SLOW_RE)
    guarded = _mongo_guard() & bare
    rows = df.select(
        "rawlog",
        bare.alias("bare"),
        guarded.alias("guarded"),
        # the guard itself, to assert the implication direction too
        _mongo_guard().alias("guard"),
    ).collect()
    for r in rows:
        assert r["guarded"] == r["bare"], (
            f"guarded matcher diverges on {r['rawlog']!r}: "
            f"guarded={r['guarded']} bare={r['bare']} guard={r['guard']}"
        )
        if r["bare"]:
            assert r["guard"], (
                f"regex matched but guard rejected {r['rawlog']!r} — "
                "the guard is NOT implied by MONGO_SLOW_RE"
            )


@given(lines=st.lists(_line, min_size=1, max_size=64, unique=True))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mongo_guard_equivalence(spark, lines):
    _assert_equivalent(spark, lines)


def test_mongo_guard_equivalence_pinned_edges(spark):
    """The edges that motivated the guard design, spelled out."""
    lines = [
        # valid slow-query line, bare and with each terminator flavor
        "[conn42] query prod.users scanned:100 137ms",
        *[f"[conn42] query prod.users scanned:100 137ms{t}"
          for t in TERMINATORS],
        # COLLSCAN variant (drives the is_collscan derived field)
        "[conn1] getmore db.c COLLSCAN keys:0 9ms",
        # guard passes, regex fails: 'ms' present but not `\d+ms$`
        "[conn42] query prod.users took ms",
        "[conn42] query prod.users 9 ms",
        "[conn42] msq",  # 'ms' mid-string, no millis suffix
        # guard fails, regex must fail too (sanity on the implication)
        "conn42] query prod.users 137ms",
        "[CONN42] query prod.users 137ms",
        "prefix [conn42] query prod.users 137ms",
        # embedded terminator: `.` excludes terminators -> regex fails,
        # guard may pass -> guarded must still equal bare (false)
        "[conn42] query prod.users\n137ms",
        # double trailing terminator -> regex fails ('$' tolerates one)
        "[conn42] query prod.users 137ms\n\n",
        "",  # empty line
        None,  # NULL rawlog
    ]
    _assert_equivalent(spark, lines)


def test_guarded_route_and_fields_match_unguarded_twins(spark):
    """Composite-expression pin: the full guarded route-array SQL and
    the guarded derived-field exprs equal their unguarded
    reconstructions row-for-row (not just the boolean matcher)."""
    from kinesis_alerts_consumer_spark.operators.routing import (
        _mongo_slow_query_routes_sql,
        with_mongo_fields,
    )

    lines = [
        "[conn42] query prod.users scanned:100 137ms",
        "[conn1] getmore db.c COLLSCAN keys:0 9ms",
        "[conn42] query prod.users scanned:100 137ms\n",
        "[conn42] query prod.users took ms",
        "not a mongo line at all",
        "",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in lines], "rawlog string")

    guarded_sql = _mongo_slow_query_routes_sql()
    assert "startswith(rawlog, '[conn')" in guarded_sql
    unguarded_sql = guarded_sql.replace(
        "(startswith(rawlog, '[conn') AND contains(rawlog, 'ms')) AND ",
        "",
    )
    assert unguarded_sql != guarded_sql

    # route array: guarded SQL vs its unguarded reconstruction
    got_routes = {
        r["rawlog"]: r["routes"]
        for r in df.select(
            "rawlog", F.expr(guarded_sql).alias("routes")
        ).collect()
    }
    for r in df.select(
        "rawlog", F.expr(unguarded_sql).alias("routes")
    ).collect():
        assert got_routes[r["rawlog"]] == r["routes"], r["rawlog"]

    # derived fields: guarded implementation vs the unguarded twin
    matched = F.col("rawlog").rlike(MONGO_SLOW_RE)
    want = {
        r["rawlog"]: (r["operation"], r["namespace"], r["is_collscan"],
                      r["millis"])
        for r in df.select(
            "rawlog",
            F.when(matched,
                   F.regexp_extract("rawlog", MONGO_SLOW_RE, 1))
            .alias("operation"),
            F.when(matched,
                   F.regexp_extract("rawlog", MONGO_SLOW_RE, 2))
            .alias("namespace"),
            F.when(matched, F.col("rawlog").contains("COLLSCAN"))
            .alias("is_collscan"),
            F.when(matched,
                   F.regexp_extract("rawlog", MONGO_SLOW_RE, 3)
                   .cast("double"))
            .alias("millis"),
        ).collect()
    }
    for r in with_mongo_fields(df).select(
        "rawlog", "operation", "namespace", "is_collscan", "millis"
    ).collect():
        got = (r["operation"], r["namespace"], r["is_collscan"],
               r["millis"])
        assert got == want[r["rawlog"]], r["rawlog"]
