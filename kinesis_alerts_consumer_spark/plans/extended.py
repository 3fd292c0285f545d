"""Extended relational surface: as-of join, range join, pivot, exact
percentiles — oracle-checked DataFrame queries beyond the 16 declared
SQL texts (SURVEY.md §2C joins/aggregations rows).

Each entry pairs a Spark DataFrame builder with a DuckDB-dialect
oracle producing the identical result (total ORDER BY, ROUND on
doubles, deterministic tie-breaks everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward
from ..session import configure
from ..sources import register_tables


def _tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    configure(spark)
    return register_tables(spark, sf_dir)


# ---------------------------------------------------------- as-of join


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: each event joined to the same user's most
    recent purchase at-or-before its timestamp (backward as-of).
    Duplicate right (user, ts) rows resolve via the in-window
    tiebreak (max purchase_id) — no pre-dedup shuffle."""
    t = _tables(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id", "ts")
    pur = t["events"].filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), F.col("value")
    )
    joined = asof_join_backward(
        ev, pur, key="user_id", right_tiebreak="purchase_id"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("r_purchase_id").alias("purchase_id"),
        F.round(F.col("r_value"), 2).alias("purchase_value"),
    ).orderBy("event_id")


SQL_ASOF_JOIN = """
WITH pur AS (
  SELECT user_id, ts, event_id AS purchase_id, value FROM (
    SELECT user_id, ts, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase') WHERE rn = 1
)
SELECT e.event_id, e.user_id, p.purchase_id,
       ROUND(p.value, 2) AS purchase_value
FROM events e ASOF LEFT JOIN pur p
  ON e.user_id = p.user_id AND e.ts >= p.ts
ORDER BY e.event_id
"""


# --------------------------------------------------------- range join

# Verbatim-portable: an inline VALUES dim table joined on a band
# predicate. Spark plans this as a broadcast nested-loop join (the
# build side is 4 rows); at scale the small side stays broadcast and
# the probe is a narrow scan pass — no shuffle.
SQL_RANGE_JOIN = """
SELECT t.tier, COUNT(*) AS n, ROUND(SUM(e.value), 2) AS sv
FROM events e
JOIN (VALUES ('low', 0.0, 25.0), ('mid', 25.0, 50.0),
             ('high', 50.0, 100.0), ('top', 100.0, 1000.0))
     AS t(tier, lo, hi)
  ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier ORDER BY t.tier
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tables(spark, sf_dir)
    return spark.sql(SQL_RANGE_JOIN)


# -------------------------------------------------------------- pivot

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame pivot: per user-cohort event-type counts. The pivoted
    value list is explicit, so the plan is a single groupBy — no extra
    distinct-values job, which matters when the input is large."""
    t = _tables(spark, sf_dir)
    piv = (
        t["events"]
        .withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "cohort",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in EVENT_TYPES],
    ).orderBy("cohort")


SQL_PIVOT = """
SELECT user_id % 10 AS cohort,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS view
FROM events GROUP BY user_id % 10 ORDER BY cohort
"""


# -------------------------------------------------- exact percentiles


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type. Spark's
    ``percentile`` (exact, sort-based) — the approx variant
    (``approx_percentile``) is the scale path but is excluded from
    hash-matching by design (SURVEY.md §2B exclusions)."""
    t = _tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


SQL_PERCENTILES = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6)  AS p50,
       ROUND(quantile_cont(value, 0.9), 6)  AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# ------------------------------------------------ bucketed-table join


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-FREE fact↔dim join via bucketed tables
    (operators/skew.write_bucketed): orders and customer are persisted
    ONCE bucketed+sorted by custkey, so the join reads co-located
    buckets and plans SortMergeJoin with NO Exchange on custkey
    (plan-asserted in tests/test_plans.py) — the 100 TB pattern for a
    fact table joined on the same key every day: pay the shuffle once
    at ingest, never again. Revenue is floor-cents integer-exact (the
    vol04 device). Oracle = the plain join, since bucketing is purely
    physical.

    The bucketed copies live under a content-stable scratch dir and
    are REUSED across calls in one pipeline session (ingest once, join
    many) — rewritten only when absent, e.g. first run per sf_dir."""
    import hashlib
    import os
    import tempfile

    from ..operators.skew import write_bucketed

    t = _tables(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"kacs_bucketed_{tag}")
    names = {}
    for tbl, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        names[tbl] = f"bkt_{tbl}_{tag}"
        if not spark.catalog.tableExists(names[tbl]):
            (
                t[tbl].write.bucketBy(32, key).sortBy(key)
                .option("path", os.path.join(root, tbl))
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(names[tbl])
            )
    o = spark.table(names["orders"])
    # MERGE hint: at fixture scale the optimizer would broadcast the
    # tiny customer table (also shuffle-free, but it proves nothing
    # about bucketing); at 100 TB both sides are large and the
    # bucket-aligned SortMergeJoin IS the target plan — the hint makes
    # the test-scale plan the production plan.
    c = spark.table(names["customer"]).hint("merge")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("revenue_cents"),
        )
        .orderBy("c_mktsegment")
    )


SQL_BUCKETED_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ----------------------------- approximate aggregates (rows-only)
# HLL / GK-sketch results are engine-specific by design — declared as
# capabilities with a rows-only driver check (SURVEY.md §2B
# exclusions); sanity bounds are asserted in tests instead.


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.approx_count_distinct("event_id", rsd=0.02).alias("approx_events"),
        )
        .orderBy("event_type")
    )


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.expr("approx_percentile(value, array(0.5, 0.9, 0.99), 1000)").alias(
                "q"
            )
        )
        .select(
            "event_type",
            F.col("q").getItem(0).alias("p50"),
            F.col("q").getItem(1).alias("p90"),
            F.col("q").getItem(2).alias("p99"),
        )
        .orderBy("event_type")
    )


EXT_QUERIES: dict[str, tuple] = {
    "ext01_asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "ext02_range_join": (q_range_join, SQL_RANGE_JOIN),
    "ext03_pivot": (q_pivot, SQL_PIVOT),
    "ext04_percentiles": (q_percentiles, SQL_PERCENTILES),
    "ext07_bucketed_join": (q_bucketed_join, SQL_BUCKETED_JOIN),
    # rows-only (no oracle): approximate by construction
    "ext05_approx_distinct": (q_approx_distinct, None),
    "ext06_approx_quantiles": (q_approx_quantiles, None),
}
