"""Spark-vs-DuckDB result comparison used across correctness tests.

Mirrors the driver's approach: sort columns by name, canonicalize
values, compare order-insensitively (the declared queries all carry a
total ORDER BY, but canonical comparison keeps the check robust).
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _canon(value):
    if value is None:
        return None
    if isinstance(value, bool):
        return value
    if isinstance(value, Decimal):
        value = float(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # round-trip through repr keeps full double precision;
        # round to 9 sig-decimals to absorb <1-ulp engine noise
        return round(value, 9)
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    return value


def canonical_rows(columns, rows):
    """-> sorted list of tuples, columns ordered by name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((v is None, str(v)) for v in r))
    return out


def spark_rows(df):
    cols = df.columns
    return cols, [tuple(row) for row in df.collect()]


def duck_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def assert_no_hugeint(con, sql, name=""):
    """DuckDB types SUM(integer) as HUGEINT (int128); Spark has no such
    type, and the driver's value hash serializes int128 differently from
    int64 even when values match (round-1 failure mode for
    dq09/llm12/llm16/llm17). Oracles must CAST such sums to BIGINT."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(c, t) for c, t, *_ in desc if "HUGEINT" in t.upper()]
    assert not bad, (
        f"{name}: oracle output has HUGEINT columns {bad}; "
        "wrap with CAST(... AS BIGINT) to match Spark serialization"
    )


def assert_frames_match(df, con, oracle_sql, name=""):
    assert_no_hugeint(con, oracle_sql, name)
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duck_rows(con, oracle_sql)
    assert sorted(c.lower() for c in s_cols) == sorted(
        c.lower() for c in d_cols
    ), f"{name}: column sets differ: spark={s_cols} duck={d_cols}"
    left = canonical_rows([c.lower() for c in s_cols], s_rows)
    right = canonical_rows([c.lower() for c in d_cols], d_rows)
    assert len(left) == len(right), (
        f"{name}: row counts differ: spark={len(left)} duck={len(right)}"
    )
    for i, (a, b) in enumerate(zip(left, right)):
        assert a == b, f"{name}: first mismatch at canonical row {i}: {a} != {b}"
