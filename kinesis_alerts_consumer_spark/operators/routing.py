"""Route assembly: per-record alert routes from _kvmeta plus the three
global rules, as a single array<route> column (no shuffle, no UDF).

Reference semantics reproduced (citations into /root/reference):

- kvmeta alert routes: only ``type == 'alerts'`` routes select
  (alerts_consumer_test.go:382-404); default dimensions ``Hostname``,
  ``env`` are appended to each (alerts_consumer.go:92-99, :23).
- global rules (NOT given default dims — they declare their own):
  * process-metrics (global_routes.go:40-74): ``via=='process-metrics'``
    and string ``source``/``title``/``type``; the ``'guage'`` library
    typo normalizes to ``'gauge'`` (:61-63); series
    ``process-metrics.<title>``; dims [Hostname, env, source];
    value_field ``value``.
  * RDS slow query (global_routes.go:138-162): syslog hostname
    ``aws-rds``, string ``user`` not equal ``rdsadmin[rdsadmin]``;
    counter ``rds.slow-query``; dims [env, programname].
  * mongo slow query (global_routes.go:88-136): ``rawlog`` matching
    ``MONGO_SLOW_RE`` derives record fields operation / namespace /
    is_collscan / millis (:106-109) and emits a counter
    ``mongo.slow-query`` (no value_field) plus a gauge
    ``mongo.slow-query-millis`` (value_field=millis); dims
    [hostname, operation, namespace, is_collscan].

The route array is built BEFORE the ignore filter so Catalyst sees
``size(routes) > 0`` as a plain filter over one codegen'd projection —
mirroring the reference's drop-early order (alerts_consumer.go:101-103)
while staying a narrow op at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .fields import field_str as _field_str
from .fields import with_typed_fields
from .util import memo_expr

DEFAULT_DIMENSIONS = ("Hostname", "env")

# Same pattern text as the reference (global_routes.go:88). Java regex
# and Go RE2 agree on all nine production fixtures (pinned in tests).
MONGO_SLOW_RE = r"^\[conn\d+\]\s([a-z]+)\s([^\s]+?)\s.*\s(\d+)ms$"

# Evaluated route schema: global rules emit these directly; kvmeta
# routes are projected onto it (type dropped after the alerts filter).
ALERT_ROUTE = (
    "struct<series: string, dimensions: array<string>, "
    "stat_type: string, value_field: string, rule: string>"
)


def _route(
    series: Column,
    dimensions: list[str],
    stat_type: Column | str,
    value_field: str | None,
    rule: str,
) -> Column:
    st = F.lit(stat_type) if isinstance(stat_type, str) else stat_type
    return F.struct(
        series.alias("series"),
        F.array(*[F.lit(d) for d in dimensions]).alias("dimensions"),
        st.alias("stat_type"),
        (F.lit(value_field) if value_field else F.lit(None).cast("string")).alias(
            "value_field"
        ),
        F.lit(rule).alias("rule"),
    )


def kvmeta_alert_routes() -> Column:
    """_kvmeta.routes filtered to alerts, with default dims appended."""
    routes = F.coalesce(
        F.col("kvmeta.routes"),
        F.expr("array()").cast(f"array<{ALERT_ROUTE.replace('struct<', 'struct<type: string, ')}>"),
    )
    alerts = F.filter(routes, lambda r: r.getField("type") == "alerts")
    return F.transform(
        alerts,
        lambda r: F.struct(
            r.getField("series").alias("series"),
            F.concat(
                F.coalesce(r.getField("dimensions"), F.expr("array()").cast("array<string>")),
                F.array(*[F.lit(d) for d in DEFAULT_DIMENSIONS]),
            ).alias("dimensions"),
            r.getField("stat_type").alias("stat_type"),
            r.getField("value_field").alias("value_field"),
            r.getField("rule").alias("rule"),
        ),
    )


def process_metrics_routes() -> Column:
    """global_routes.go:40-74 as a conditional one-element array."""
    via = _field_str("via")
    source = _field_str("source")
    title = _field_str("title")
    stat = _field_str("type")
    stat = F.when(stat == "guage", F.lit("gauge")).otherwise(stat)
    cond = (
        (via == "process-metrics")
        & source.isNotNull()
        & title.isNotNull()
        & stat.isNotNull()
    )
    route = _route(
        F.concat(F.lit("process-metrics."), title),
        ["Hostname", "env", "source"],
        stat,
        "value",
        "global-process-metrics",
    )
    return F.when(cond, F.array(route)).otherwise(F.expr(f"array()").cast(f"array<{ALERT_ROUTE}>"))


def rds_slow_query_routes() -> Column:
    """global_routes.go:138-162."""
    user = _field_str("user")
    cond = (
        (F.col("hostname") == "aws-rds")
        & user.isNotNull()
        & (user != "rdsadmin[rdsadmin]")
    )
    route = _route(
        F.lit("rds.slow-query"),
        ["env", "programname"],
        "counter",
        "value",
        "global-rds-slow-query-count",
    )
    return F.when(cond, F.array(route)).otherwise(F.expr(f"array()").cast(f"array<{ALERT_ROUTE}>"))


def mongo_slow_query_routes() -> Column:
    """global_routes.go:88-136 — the route array only; the derived
    record fields are added by :func:`with_mongo_fields`."""
    cond = F.col("rawlog").rlike(MONGO_SLOW_RE)
    dims = ["hostname", "operation", "namespace", "is_collscan"]
    counter = _route(
        F.lit("mongo.slow-query"), dims, "counter", None,
        "global-mongo-slow-query-count",
    )
    gauge = _route(
        F.lit("mongo.slow-query-millis"), dims, "gauge", "millis",
        "global-mongo-slow-query-gauge",
    )
    return F.when(cond, F.array(counter, gauge)).otherwise(
        F.expr(f"array()").cast(f"array<{ALERT_ROUTE}>")
    )


def _mongo_field_exprs() -> dict[str, Column]:
    matched = F.col("rawlog").rlike(MONGO_SLOW_RE)
    return {
        "operation": F.when(
            matched, F.regexp_extract(F.col("rawlog"), MONGO_SLOW_RE, 1)
        ),
        "namespace": F.when(
            matched, F.regexp_extract(F.col("rawlog"), MONGO_SLOW_RE, 2)
        ),
        "is_collscan": F.when(matched, F.col("rawlog").contains("COLLSCAN")),
        "millis": F.when(
            matched,
            F.regexp_extract(F.col("rawlog"), MONGO_SLOW_RE, 3).cast("double"),
        ),
    }


def with_mongo_fields(df: DataFrame) -> DataFrame:
    """Derived columns the mongo rule injects into the record
    (global_routes.go:106-109): operation, namespace, is_collscan,
    millis. Null when the rule doesn't match."""
    return df.withColumns(memo_expr("routing.mongo_fields", _mongo_field_exprs))


def with_routes(df: DataFrame) -> DataFrame:
    """Assemble the full per-record route array (kvmeta alerts with
    default dims ++ global rules — alerts_consumer.go:92-99) plus the
    mongo derived fields. Adds ``routes`` and ``ignored`` columns."""
    df = with_mongo_fields(df)
    df = with_typed_fields(df)
    # explode(array(...)) = generator barrier: the route-assembly
    # expression (kvmeta transform + three rule predicates over variant
    # fields) evaluates once per record instead of being inlined into
    # every downstream reference (see project.with_typed_fields).
    df = df.withColumn(
        "routes",
        memo_expr(
            "routing.routes_array",
            lambda: F.explode(
                F.array(
                    F.concat(
                        kvmeta_alert_routes(),
                        process_metrics_routes(),
                        rds_slow_query_routes(),
                        mongo_slow_query_routes(),
                    )
                )
            ),
        ),
    )
    # F1 ignore filter (alerts_consumer.go:101-103): kept as a column so
    # callers can count ignores; `routed()` applies the filter.
    return df.withColumn("ignored", F.size("routes") <= 0)


def routed(df: DataFrame) -> DataFrame:
    """Drop ignored records (reference ErrMessageIgnored)."""
    return df.filter(~F.col("ignored"))
