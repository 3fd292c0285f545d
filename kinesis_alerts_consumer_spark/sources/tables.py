"""Parquet table registry for the engine's fixture star schema.

Tables (TESTDATA.md / FIXTURES.md §1): region nation customer supplier
part orders lineitem events documents embeddings — one parquet file per
table under ``<sf_dir>/``.

The only table needing normalization is ``events``: its ``ts`` column
is parquet TIMESTAMP(NANOS). With
``spark.sql.legacy.parquet.nanosAsLong=true`` (pinned in
:mod:`..session`) it reads as LongType nanos and is converted here with
``timestamp_micros(ts DIV 1000)``. Integer ``DIV`` is load-bearing —
see session.py docstring.

Scale note: at 100 TB these would be directory-partitioned datasets,
not single files; ``load_table`` takes any path Spark can scan
(glob/dir), and all downstream operators are written against the
DataFrame, so switching layout is a registry change only. Filters and
projections on the registered views push into the parquet scan
(verified via ``explain`` in tests — PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Paths whose converted ts range already passed the sanity window —
# one min/max agg per (path) per process, then free.
_TS_SANITY_OK: set[str] = set()


def assert_sane_ts(df: DataFrame, src: str, col: str = "ts") -> None:
    """Fail LOUDLY if the converted event timestamps fall outside a
    plausible epoch window (1990..2100).

    The bigint-ts path assumes the integers are NANOSECONDS (the
    nanosAsLong read of TIMESTAMP(NANOS)); a fixture shipping plain
    INT64 *micro*seconds would also arrive as bigint, and DIV 1000
    would land every event in 1970 — silently collapsing every window
    aggregate instead of erroring. One tiny column-pruned min/max agg,
    memoized per path."""
    if src in _TS_SANITY_OK:
        return
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    if lo is not None and (lo.year < 1990 or hi.year > 2100):
        raise ValueError(
            f"{src}: converted {col!r} range [{lo} .. {hi}] is outside "
            "1990..2100 — the bigint column is probably not nanoseconds "
            "(unit drift in the fixture generator); refusing to "
            "silently collapse event-time windows"
        )
    _TS_SANITY_OK.add(src)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying per-table normalization."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long nanos -> µs-truncated timestamp,
        # matching DuckDB's CAST(ts AS TIMESTAMP) of the same file.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        assert_sane_ts(df, path)
    return df


# (session id, sf_dir, names) -> loaded frames. Re-loading per query
# re-reads parquet footers and re-plans; at 16 queries that fixed cost
# dominated the sf0.1 bench (~1 s/query). Loaded frames are cached
# forever; temp VIEWS are global per session, so they are refreshed
# whenever the active (sf_dir, names) for a session changes — without
# this, sf0.001 -> sf0.01 -> sf0.001 would silently leave the views
# pointing at sf0.01 data.
_REGISTRY: dict[tuple[int, str, tuple], dict[str, DataFrame]] = {}
_ACTIVE_VIEWS: dict[int, tuple[str, tuple]] = {}


def register_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view.

    Frames are cached per (session, sf_dir, names); views are
    re-registered whenever the session's active sf_dir changes.
    """
    sid = id(spark)
    key = (sid, sf_dir, names)
    cached = _REGISTRY.get(key)
    if cached is not None and _ACTIVE_VIEWS.get(sid) == (sf_dir, names):
        return cached
    if cached is None:
        cached = {name: load_table(spark, sf_dir, name) for name in names}
        _REGISTRY[key] = cached
    for name, df in cached.items():
        df.createOrReplaceTempView(name)
    _ACTIVE_VIEWS[sid] = (sf_dir, names)
    return cached
