"""Oracle-checked kayvee-pipeline queries: the reference-parity hot
path (parse -> enrich -> route -> project, SURVEY.md §2A P1-P7/F1-F4)
driven end-to-end through the driver's correctness gate.

Construction: deterministic syslog/kayvee lines are SYNTHESIZED from
the ``events`` fixture table with pure column logic, fed through the
REAL pipeline (`process_lines` -> `dd_points`), and aggregated. The
DuckDB oracle computes the expected output directly from ``events`` —
it never parses; it independently derives what the pipeline must
produce. A disagreement in parsing, routing, dimension coercion,
value-resolution defaults, typo-fixing, or quarantine precedence
shows up as a hash mismatch.

Covered reference semantics (citations into /root/reference):
- kv01: kvmeta alert routes + default dims, dim coercion of string /
  bool / JSON-number (%.0f), value_field lookup + counter/gauge
  defaults when absent (alerts_consumer.go:92-99, 126-192).
- kv02: the mongo slow-query regex rule with derived fields and its
  two-route fan-out (global_routes.go:88-136).
- kv03: the process-metrics rule incl. the 'guage' typo fix and
  series concatenation (global_routes.go:40-74).
- kv04: record disposition precedence — parse failure / ignored /
  wrong-typed value quarantine / clean (alerts_consumer.go:55-114,
  157-192).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import process_lines
from ..operators.project import dd_points, quarantine
from ..operators.util import spread_for_compute
from ..session import configure
from ..sources import register_tables


def _tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    configure(spark)
    return register_tables(spark, sf_dir)


def _s(col: Column) -> Column:
    return col.cast("string")


def _header(ts_col: Column, host: Column, prog: Column) -> Column:
    """``<RFC3339-ish ts> <host> <prog>[1]: `` — second precision so the
    epoch roundtrip is exact (parse truncates to the header text)."""
    return F.concat(
        F.date_format(ts_col, "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit(" "), host, F.lit(" "), prog, F.lit("[1]: "),
    )


# ------------------------------------------------ kv01: kvmeta routes


def _kv01_lines(events: DataFrame) -> DataFrame:
    """One kayvee line per event: route series-<id%5>, dims district
    (string) / flag (bool) / bucket (JSON int), counter on odd ids
    (gauge even), value_field 'value' except id%5==0 (absent ->
    counter 1.0 / gauge 0.0 defaults)."""
    events = spread_for_compute(events)
    eid = F.col("event_id")
    body = F.to_json(
        F.struct(
            F.col("value").alias("value"),
            F.concat(F.lit("d"), _s(eid % 3)).alias("district"),
            (eid % 2 == 0).alias("flag"),
            F.floor(F.col("value")).cast("long").alias("bucket"),
            F.struct(
                F.lit("t").alias("team"),
                F.array(
                    F.struct(
                        F.lit("alerts").alias("type"),
                        F.concat(F.lit("series-"), _s(eid % 5)).alias("series"),
                        F.array(
                            F.lit("district"), F.lit("flag"), F.lit("bucket")
                        ).alias("dimensions"),
                        F.when(eid % 2 == 1, F.lit("counter"))
                        .otherwise(F.lit("gauge"))
                        .alias("stat_type"),
                        F.when(eid % 5 != 0, F.lit("value")).alias("value_field"),
                        F.concat(F.lit("rule-"), _s(eid % 5)).alias("rule"),
                    )
                ).alias("routes"),
            ).alias("_kvmeta"),
        )
    )
    header = _header(
        F.col("ts"),
        F.concat(F.lit("host"), _s(eid % 7)),
        F.concat(F.lit("prod--app"), _s(F.col("user_id") % 4), F.lit("/arn")),
    )
    return events.select(F.concat(header, body).alias("value"))


def q_kayvee_route_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    pts = dd_points(process_lines(_kv01_lines(t["events"]), "value", "production"))
    return (
        pts.select(
            "metric", "mtype", F.concat_ws(",", "tags").alias("tags"), "ts", "value"
        )
        .groupBy("metric", "mtype", "tags")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("metric", "mtype", "tags")
    )


SQL_KAYVEE_ROUTE_PROJECT = """
WITH x AS (
  SELECT 'kv.series-' || (event_id % 5) AS metric,
         CASE WHEN event_id % 2 = 1 THEN 'count' ELSE 'gauge' END AS mtype,
         'district:d' || (event_id % 3)
           || ',flag:' || (CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END)
           || ',bucket:' || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
           || ',Hostname:host' || (event_id % 7)
           || ',env:production' AS tags,
         CASE WHEN event_id % 5 = 0
              THEN (CASE WHEN event_id % 2 = 1 THEN 1.0 ELSE 0.0 END)
              ELSE value END AS value,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts
  FROM events)
SELECT metric, mtype, tags, COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM x GROUP BY metric, mtype, tags
ORDER BY metric, mtype, tags
"""


# ---------------------------------------- kv02: mongo slow-query rule


def _kv02_lines(events: DataFrame) -> DataFrame:
    """Raw (non-JSON) mongo slow-query lines: ``[connN] <op> <ns>
    <plan> <ms>ms`` — op cycles query/update/remove, every 4th line a
    COLLSCAN, millis = event_id % 997."""
    events = spread_for_compute(events)
    eid = F.col("event_id")
    op = (
        F.when(eid % 3 == 0, F.lit("query"))
        .when(eid % 3 == 1, F.lit("update"))
        .otherwise(F.lit("remove"))
    )
    ns = F.concat(F.lit("db"), _s(eid % 5), F.lit(".coll"), _s(eid % 7))
    plan = F.when(eid % 4 == 0, F.lit("COLLSCAN")).otherwise(F.lit("IXSCAN"))
    rawlog = F.concat(
        F.lit("[conn"), _s(eid), F.lit("] "), op, F.lit(" "), ns,
        F.lit(" planSummary: "), plan, F.lit(" "), _s(eid % 997), F.lit("ms"),
    )
    header = _header(
        F.col("ts"),
        F.concat(F.lit("mongo"), _s(F.col("user_id") % 3)),
        F.lit("mongod"),
    )
    return events.select(F.concat(header, rawlog).alias("value"))


def q_kayvee_mongo_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    pts = dd_points(process_lines(_kv02_lines(t["events"]), "value", "production"))
    return (
        pts.select(
            "metric", "mtype", F.concat_ws(",", "tags").alias("tags"), "value"
        )
        .groupBy("metric", "mtype", "tags")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("metric", "mtype", "tags")
    )


SQL_KAYVEE_MONGO_RULE = """
WITH base AS (
  SELECT 'mongo' || (user_id % 3) AS host,
         CASE WHEN event_id % 3 = 0 THEN 'query'
              WHEN event_id % 3 = 1 THEN 'update'
              ELSE 'remove' END AS op,
         'db' || (event_id % 5) || '.coll' || (event_id % 7) AS ns,
         CASE WHEN event_id % 4 = 0 THEN 'true' ELSE 'false' END AS collscan,
         CAST(event_id % 997 AS DOUBLE) AS ms
  FROM events),
x AS (
  SELECT 'kv.mongo.slow-query' AS metric, 'count' AS mtype,
         'hostname:' || host || ',operation:' || op || ',namespace:' || ns
           || ',is_collscan:' || collscan AS tags,
         1.0 AS value
  FROM base
  UNION ALL
  SELECT 'kv.mongo.slow-query-millis', 'gauge',
         'hostname:' || host || ',operation:' || op || ',namespace:' || ns
           || ',is_collscan:' || collscan,
         ms
  FROM base)
SELECT metric, mtype, tags, COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM x GROUP BY metric, mtype, tags
ORDER BY metric, mtype, tags
"""


# -------------------------------------- kv03: process-metrics rule


def _kv03_lines(events: DataFrame) -> DataFrame:
    """Kayvee process-metrics bodies; every 3rd line uses the 'guage'
    library typo that the rule must normalize to 'gauge'
    (global_routes.go:61-63)."""
    events = spread_for_compute(events)
    eid = F.col("event_id")
    stat = (
        F.when(eid % 3 == 0, F.lit("guage"))
        .when(eid % 3 == 1, F.lit("gauge"))
        .otherwise(F.lit("counter"))
    )
    body = F.to_json(
        F.struct(
            F.lit("process-metrics").alias("via"),
            F.concat(F.lit("src"), _s(eid % 4)).alias("source"),
            F.concat(F.lit("metric"), _s(eid % 6)).alias("title"),
            stat.alias("type"),
            F.col("value").alias("value"),
        )
    )
    header = _header(
        F.col("ts"),
        F.concat(F.lit("host"), _s(eid % 7)),
        F.concat(F.lit("prod--app"), _s(F.col("user_id") % 4), F.lit("/arn")),
    )
    return events.select(F.concat(header, body).alias("value"))


def q_kayvee_process_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    pts = dd_points(process_lines(_kv03_lines(t["events"]), "value", "production"))
    return (
        pts.select(
            "metric", "mtype", F.concat_ws(",", "tags").alias("tags"), "value"
        )
        .groupBy("metric", "mtype", "tags")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("metric", "mtype", "tags")
    )


SQL_KAYVEE_PROCESS_METRICS = """
WITH x AS (
  SELECT 'kv.process-metrics.metric' || (event_id % 6) AS metric,
         CASE WHEN event_id % 3 = 2 THEN 'count' ELSE 'gauge' END AS mtype,
         'Hostname:host' || (event_id % 7)
           || ',env:production,source:src' || (event_id % 4) AS tags,
         value
  FROM events)
SELECT metric, mtype, tags, COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM x GROUP BY metric, mtype, tags
ORDER BY metric, mtype, tags
"""


# ------------------------- kv04: disposition (clean/ignored/quarantine)


def _kv04_lines(events: DataFrame) -> DataFrame:
    """Mixed-disposition lines keyed on event_id % 10:
    0 -> unparseable garbage (parse failure),
    1 -> kayvee with zero routes (ignored),
    2 -> route whose value_field holds a string (wrong-type quarantine),
    else -> clean counter route."""
    events = spread_for_compute(events)
    eid = F.col("event_id")
    header = _header(
        F.col("ts"), F.concat(F.lit("host"), _s(eid % 7)), F.lit("prod--app/arn")
    )
    clean_body = F.to_json(
        F.struct(
            F.col("value").alias("value"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit("alerts").alias("type"),
                        F.lit("disposition").alias("series"),
                        F.expr("array()").cast("array<string>").alias("dimensions"),
                        F.lit("counter").alias("stat_type"),
                        F.lit("value").alias("value_field"),
                        F.lit("rule-d").alias("rule"),
                    )
                ).alias("routes")
            ).alias("_kvmeta"),
        )
    )
    bad_value_body = F.to_json(
        F.struct(
            F.lit("not-a-number").alias("value"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit("alerts").alias("type"),
                        F.lit("disposition").alias("series"),
                        F.expr("array()").cast("array<string>").alias("dimensions"),
                        F.lit("counter").alias("stat_type"),
                        F.lit("value").alias("value_field"),
                        F.lit("rule-d").alias("rule"),
                    )
                ).alias("routes")
            ).alias("_kvmeta"),
        )
    )
    no_routes_body = F.lit('{"_kvmeta":{"routes":[]}}')
    line = (
        F.when(eid % 10 == 0, F.lit("!! not a syslog line !!"))
        .when(eid % 10 == 1, F.concat(header, no_routes_body))
        .when(eid % 10 == 2, F.concat(header, bad_value_body))
        .otherwise(F.concat(header, clean_body))
    )
    return events.select(line.alias("value"))


def q_kayvee_disposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    df = process_lines(_kv04_lines(t["events"]), "value", "production")
    status = (
        F.when(F.col("error").isNotNull() & ~F.col("line_ok"), F.lit("parse_failure"))
        .when(F.col("error").isNotNull(), F.lit("quarantined"))
        .when(F.col("ignored"), F.lit("ignored"))
        .otherwise(F.lit("clean"))
    )
    return (
        df.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy("status")
    )


SQL_KAYVEE_DISPOSITION = """
WITH x AS (
  SELECT CASE WHEN event_id % 10 = 0 THEN 'parse_failure'
              WHEN event_id % 10 = 1 THEN 'ignored'
              WHEN event_id % 10 = 2 THEN 'quarantined'
              ELSE 'clean' END AS status
  FROM events)
SELECT status, COUNT(*) AS n FROM x GROUP BY status ORDER BY status
"""




# ----------------------- vol01/vol02: A1 volume rollups (metrics.go)


def _vol_lines(events: DataFrame) -> DataFrame:
    """Lines for the volume rollup: body built by string concat with
    ONLY string/int parts, so the DuckDB oracle reproduces the exact
    byte length (no float rendering divergence)."""
    events = spread_for_compute(events)
    eid = F.col("event_id")
    body = F.concat(
        F.lit('{"team":"team-'), _s(eid % 3),
        F.lit('","_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"s",'
              '"dimensions":[],"stat_type":"counter","rule":"rule-'),
        _s(eid % 5),
        F.lit('"}]}}'),
    )
    header = _header(
        F.col("ts"),
        F.concat(F.lit("host"), _s(eid % 7)),
        F.concat(F.lit("prod--app"), _s(F.col("user_id") % 4), F.lit("/arn")),
    )
    return events.select(F.concat(header, body).alias("value"))


_VOL_LINE_DUCK = """
  strftime(ts, '%Y-%m-%dT%H:%M:%S') || ' host' || (event_id % 7)
    || ' prod--app' || (user_id % 4) || '/arn[1]: '
    || '{"team":"team-' || (event_id % 3)
    || '","_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"s","dimensions":[],"stat_type":"counter","rule":"rule-'
    || (event_id % 5) || '"}]}}'
"""


def q_log_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 rollup: counts + byte sums by (env, app, team) — env/app from
    the ECS programname, team from the body (metrics.go:48-89)."""
    from ..operators.volume import log_volume
    from ..functions.kayvee import parse_lines

    t = _tables(spark, sf_dir)
    parsed = parse_lines(_vol_lines(t["events"]), "value", "production")
    return log_volume(parsed).orderBy("env", "app", "team")


SQL_LOG_VOLUME = f"""
WITH x AS (
  SELECT 'prod' AS env, 'app' || (user_id % 4) AS app,
         'team-' || (event_id % 3) AS team,
         octet_length(CAST(({_VOL_LINE_DUCK}) AS BLOB)) AS nb
  FROM events)
SELECT env, app, team, COUNT(*) AS cnt, CAST(SUM(nb) AS BIGINT) AS size
FROM x GROUP BY env, app, team ORDER BY env, app, team
"""


def q_log_route_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 per-rule rollup: (app, env, rule) counts over kvmeta route
    rule names (metrics.go:62-66, 84-87)."""
    from ..operators.volume import log_route_volume
    from ..functions.kayvee import parse_lines

    t = _tables(spark, sf_dir)
    parsed = parse_lines(_vol_lines(t["events"]), "value", "production")
    return log_route_volume(parsed).orderBy("app", "env", "rule")


SQL_LOG_ROUTE_VOLUME = """
SELECT 'app' || (user_id % 4) AS app, 'prod' AS env,
       'rule-' || (event_id % 5) AS rule, COUNT(*) AS cnt
FROM events GROUP BY 1, 2, 3 ORDER BY app, env, rule
"""


# -------- vol03: A1 rollup under a pathological hot key (salted agg)


def _vol03_lines(events: DataFrame) -> DataFrame:
    """Same body/shape as :func:`_vol_lines` but with a DELIBERATELY
    skewed app: every even event_id lands on app ``apphot`` (~50% of
    all records on one (env, app) key) — the distribution where a
    plain groupBy bottlenecks on a single reducer and AQE cannot help
    because one GROUP can't be split."""
    events = spread_for_compute(events)
    eid = F.col("event_id")
    body = F.concat(
        F.lit('{"team":"team-'), _s(eid % 3),
        F.lit('","_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"s",'
              '"dimensions":[],"stat_type":"counter","rule":"rule-'),
        _s(eid % 5),
        F.lit('"}]}}'),
    )
    app = F.when(eid % 2 == 0, F.lit("hot")).otherwise(_s(F.col("user_id") % 4))
    header = _header(
        F.col("ts"),
        F.concat(F.lit("host"), _s(eid % 7)),
        F.concat(F.lit("prod--app"), app, F.lit("/arn")),
    )
    return events.select(F.concat(header, body).alias("value"))


def q_hot_key_log_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 rollup over the hot-key distribution, executed through the
    TWO-PHASE SALTED aggregation (operators/skew.salted_agg): phase 1
    partial-aggregates on (env, app, team, salt) — the hot key's rows
    spread over salt_n reducers — phase 2 merges the partials on the
    real key. count/sum are algebraic, so salting is invisible in the
    result: the oracle is the PLAIN GROUP BY. The skew story proven
    under the hash gate, not just claimed (skew.py docstring)."""
    from ..operators.volume import salted_log_volume
    from ..functions.kayvee import parse_lines

    t = _tables(spark, sf_dir)
    parsed = parse_lines(_vol03_lines(t["events"]), "value", "production")
    return salted_log_volume(parsed, salt_n=16).orderBy("env", "app", "team")


_VOL03_LINE_DUCK = """
  strftime(ts, '%Y-%m-%dT%H:%M:%S') || ' host' || (event_id % 7)
    || ' prod--app'
    || (CASE WHEN event_id % 2 = 0 THEN 'hot'
             ELSE CAST(user_id % 4 AS VARCHAR) END)
    || '/arn[1]: '
    || '{"team":"team-' || (event_id % 3)
    || '","_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"s","dimensions":[],"stat_type":"counter","rule":"rule-'
    || (event_id % 5) || '"}]}}'
"""

SQL_HOT_KEY_LOG_VOLUME = f"""
WITH x AS (
  SELECT 'prod' AS env,
         'app' || (CASE WHEN event_id % 2 = 0 THEN 'hot'
                        ELSE CAST(user_id % 4 AS VARCHAR) END) AS app,
         'team-' || (event_id % 3) AS team,
         octet_length(CAST(({_VOL03_LINE_DUCK}) AS BLOB)) AS nb
  FROM events)
SELECT env, app, team, COUNT(*) AS cnt, CAST(SUM(nb) AS BIGINT) AS size
FROM x GROUP BY env, app, team ORDER BY env, app, team
"""




# -------- vol04: skewed fact->dim join through the SALTED JOIN


def q_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-JOIN twin of vol03: ~50% of fact rows share one app
    key ('apphot'), joined to a small per-app quota dim through
    operators/skew.salted_join — the left side salts uniformly, the
    dim replicates per salt, so the hot key's rows land on salt_n
    reducers instead of one. Salting is invisible in the result (each
    left row matches exactly its salt's replica), so the oracle is
    the PLAIN join. The weighted sum is integer-exact
    (floor(value*mult*100) cents, the llm30 device) — a double SUM
    over a 50%-hot group is large enough for engine summation order
    to flip a ROUND(_,2) at the boundary."""
    from ..operators import skew as SK

    t = _tables(spark, sf_dir)
    ev = spread_for_compute(t["events"])
    eid = F.col("event_id")
    fact = ev.select(
        F.when(eid % 2 == 0, F.lit("apphot"))
        .otherwise(F.concat(F.lit("app"), _s(F.col("user_id") % 4)))
        .alias("app"),
        "value",
    )
    dim = spark.createDataFrame(
        [("apphot", 0.5), ("app0", 1.0), ("app1", 1.5),
         ("app2", 2.0), ("app3", 2.5)],
        "app string, mult double",
    )
    joined = SK.salted_join(fact, dim, key="app", salt_n=8)
    cents = F.floor(F.col("value") * F.col("mult") * 100).cast("bigint")
    return (
        joined.groupBy("app")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("weighted_cents"),
        )
        .orderBy("app")
    )


SQL_HOT_KEY_JOIN = """
WITH f AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 'apphot'
              ELSE 'app' || CAST(user_id % 4 AS VARCHAR) END AS app,
         value
  FROM events),
d (app, mult) AS (VALUES ('apphot', 0.5), ('app0', 1.0), ('app1', 1.5),
                         ('app2', 2.0), ('app3', 2.5))
SELECT f.app AS app, COUNT(*) AS n,
       CAST(SUM(CAST(floor(f.value * d.mult * 100) AS BIGINT)) AS BIGINT)
         AS weighted_cents
FROM f JOIN d ON f.app = d.app
GROUP BY f.app ORDER BY f.app
"""


# ------------- kv06: multi-route fan-out + mixed-region dispatch
# (alerts_consumer_test.go:306-380 multi-route golden; :406-687 region
# batch dispatch; tag rules alerts_consumer.go:206-223)


def _kv06_lines(events: DataFrame) -> DataFrame:
    """Every record fans out to TWO alert routes; region dispatch
    cycles on event_id % 4:
      0 -> allowlisted route + ``region``      -> tag us-west-1
      1 -> allowlisted route + ``pod-region``  -> tag us-east-2
      2 -> allowlisted route, region missing   -> tag default
      3 -> no allowlisted route (region set!)  -> tag default
    (the region only dispatches when an allowlisted series is on the
    record, alerts_consumer.go:206-223)."""
    events = spread_for_compute(events)
    eid = F.col("event_id")
    m = eid % 4

    def route(series: Column) -> Column:
        return F.struct(
            F.lit("alerts").alias("type"),
            series.alias("series"),
            F.array(F.lit("district")).alias("dimensions"),
            F.lit("gauge").alias("stat_type"),
            F.lit("value").alias("value_field"),
            F.lit("rule-m").alias("rule"),
        )

    first = F.when(m == 3, F.lit("series-a")).otherwise(
        F.lit("ContainerExitCount")
    )
    body = F.to_json(
        F.struct(
            F.col("value").alias("value"),
            F.concat(F.lit("d"), _s(eid % 3)).alias("district"),
            # to_json drops null fields, so these keys only exist on
            # their cycle's records
            F.when(m == 0, F.lit("us-west-1"))
            .when(m == 3, F.lit("eu-west-1"))
            .alias("region"),
            F.when(m == 1, F.lit("us-east-2")).alias("pod-region"),
            F.struct(
                F.lit("t").alias("team"),
                F.array(route(first), route(F.lit("series-b"))).alias(
                    "routes"
                ),
            ).alias("_kvmeta"),
        )
    )
    header = _header(
        F.col("ts"),
        F.concat(F.lit("host"), _s(eid % 7)),
        F.concat(F.lit("prod--app"), _s(F.col("user_id") % 4), F.lit("/arn")),
    )
    return events.select(F.concat(header, body).alias("value"))


def q_kayvee_multiroute_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    pts = dd_points(process_lines(_kv06_lines(t["events"]), "value", "production"))
    return (
        pts.select(
            "tag", "metric", "mtype",
            F.concat_ws(",", "tags").alias("tags"), "value",
        )
        .groupBy("tag", "metric", "mtype", "tags")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("tag", "metric", "mtype", "tags")
    )


SQL_KAYVEE_MULTIROUTE_REGIONS = """
WITH base AS (
  SELECT event_id % 4 AS m,
         'd' || (event_id % 3) AS district,
         'host' || (event_id % 7) AS host,
         value
  FROM events),
tagged AS (
  SELECT CASE WHEN m = 0 THEN 'us-west-1'
              WHEN m = 1 THEN 'us-east-2'
              ELSE 'default' END AS tag,
         CASE WHEN m = 3 THEN 'kv.series-a'
              ELSE 'kv.ContainerExitCount' END AS metric1,
         'district:' || district || ',Hostname:' || host
           || ',env:production' AS tags,
         value
  FROM base),
x AS (
  SELECT tag, metric1 AS metric, tags, value FROM tagged
  UNION ALL
  SELECT tag, 'kv.series-b', tags, value FROM tagged)
SELECT tag, metric, 'gauge' AS mtype, tags, COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM x GROUP BY tag, metric, tags
ORDER BY tag, metric, mtype, tags
"""


# ------------------------ kv05: config-driven rules (kvconfig / K3)


def _kv05_lines(events: DataFrame) -> DataFrame:
    """Self-instrumentation-style kayvee bodies routed ONLY by config
    rules: title cycles stats / error-sending-to-cloudwatch / other
    (the last matches no rule -> ignored)."""
    events = spread_for_compute(events)
    eid = F.col("event_id")
    title = (
        F.when(eid % 3 == 0, F.lit("stats"))
        .when(eid % 3 == 1, F.lit("error-sending-to-cloudwatch"))
        .otherwise(F.lit("heartbeat"))
    )
    body = F.to_json(F.struct(title.alias("title"), F.col("value").alias("value")))
    header = _header(
        F.col("ts"),
        F.concat(F.lit("host"), _s(eid % 7)),
        F.concat(F.lit("prod--app"), _s(F.col("user_id") % 4), F.lit("/arn")),
    )
    return events.select(F.concat(header, body).alias("value"))


def q_kayvee_config_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.kayvee import parse_lines
    from ..operators.routing import with_routes
    from ..operators.rules import SELF_INSTRUMENTATION_RULES, with_config_routes
    from ..operators.project import project_routes

    t = _tables(spark, sf_dir)
    df = with_config_routes(
        with_routes(parse_lines(_kv05_lines(t["events"]), "value", "production")),
        SELF_INSTRUMENTATION_RULES,
    )
    pts = dd_points(project_routes(df))
    return (
        pts.select("metric", "mtype", F.concat_ws(",", "tags").alias("tags"))
        .groupBy("metric", "mtype", "tags")
        .agg(F.count("*").alias("n"))
        .orderBy("metric", "mtype", "tags")
    )


SQL_KAYVEE_CONFIG_RULES = """
WITH x AS (
  SELECT CASE WHEN event_id % 3 = 0
              THEN 'kv.kinesis-alerts-consumer.stats'
              WHEN event_id % 3 = 1
              THEN 'kv.kinesis-alerts-consumer.cloudwatch-errors'
              END AS metric,
         'Hostname:host' || (event_id % 7) || ',env:production' AS tags
  FROM events WHERE event_id % 3 < 2)
SELECT metric, 'count' AS mtype, tags, COUNT(*) AS n
FROM x GROUP BY metric, tags ORDER BY metric, mtype, tags
"""


# --------------- kv07: notifications output type (kvconfig.yml:12-20)


def _kv07_lines(events: DataFrame) -> DataFrame:
    """Self-instrumentation bodies for the notifications route: title
    cycles failed-sending-volumes (matches) / stats / heartbeat; the
    matching third carries an ``error`` field ``timeout-<id%5>``
    except every 15th id, which omits it (pins the missing-field ->
    empty-string interpolation seam)."""
    events = spread_for_compute(events)
    eid = F.col("event_id")
    title = (
        F.when(eid % 3 == 0, F.lit("failed-sending-volumes"))
        .when(eid % 3 == 1, F.lit("stats"))
        .otherwise(F.lit("heartbeat"))
    )
    err = F.when(eid % 15 != 0, F.concat(F.lit("timeout-"), _s(eid % 5)))
    body = F.to_json(
        F.struct(
            title.alias("title"),
            err.alias("error"),
            F.col("value").alias("value"),
        )
    )
    header = _header(
        F.col("ts"),
        F.concat(F.lit("host"), _s(eid % 7)),
        F.concat(F.lit("prod--app"), _s(F.col("user_id") % 4), F.lit("/arn")),
    )
    return events.select(F.concat(header, body).alias("value"))


def q_kayvee_notifications(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kvconfig `notifications` output (kvconfig.yml:14-20): matcher ->
    (channel, icon, user, message) rows with `%{error}` interpolated
    from the record — the notification sink-table projection, rolled
    up per distinct message for the oracle compare."""
    from ..functions.kayvee import parse_lines
    from ..operators.fields import with_typed_fields
    from ..operators.routing import with_mongo_fields
    from ..operators.rules import SELF_NOTIFICATION_RULES, notification_rows

    t = _tables(spark, sf_dir)
    rows = notification_rows(
        with_typed_fields(
            with_mongo_fields(
                parse_lines(_kv07_lines(t["events"]), "value", "production")
            )
        ),
        SELF_NOTIFICATION_RULES,
    )
    return (
        rows.groupBy("rule", "channel", "icon", "user", "message")
        .agg(F.count("*").alias("n"))
        .orderBy("message")
    )


SQL_KAYVEE_NOTIFICATIONS = """
WITH x AS (
  SELECT CASE WHEN event_id % 15 = 0 THEN ''
              ELSE 'timeout-' || (event_id % 5) END AS err
  FROM events WHERE event_id % 3 = 0)
SELECT 'log-volume-send-failure' AS rule,
       '#eng-infra-alerts-minor' AS channel,
       ':signalfx:' AS icon,
       'kinesis-alerts-consumer' AS "user",
       'Error sending log volumes: ```' || err || '```' AS message,
       COUNT(*) AS n
FROM x GROUP BY message ORDER BY message
"""


KAYVEE_QUERIES: dict[str, tuple] = {
    "kv01_route_project": (q_kayvee_route_project, SQL_KAYVEE_ROUTE_PROJECT),
    "kv02_mongo_rule": (q_kayvee_mongo_rule, SQL_KAYVEE_MONGO_RULE),
    "kv03_process_metrics": (q_kayvee_process_metrics, SQL_KAYVEE_PROCESS_METRICS),
    "kv04_disposition": (q_kayvee_disposition, SQL_KAYVEE_DISPOSITION),
    "vol01_log_volume": (q_log_volume, SQL_LOG_VOLUME),
    "vol02_log_route_volume": (q_log_route_volume, SQL_LOG_ROUTE_VOLUME),
    "vol03_hot_key_rollup": (q_hot_key_log_volume, SQL_HOT_KEY_LOG_VOLUME),
    "vol04_hot_key_join": (q_hot_key_join, SQL_HOT_KEY_JOIN),
    "kv05_config_rules": (q_kayvee_config_rules, SQL_KAYVEE_CONFIG_RULES),
    "kv07_notifications": (q_kayvee_notifications, SQL_KAYVEE_NOTIFICATIONS),
    "kv06_multiroute_regions": (
        q_kayvee_multiroute_regions,
        SQL_KAYVEE_MULTIROUTE_REGIONS,
    ),
}
