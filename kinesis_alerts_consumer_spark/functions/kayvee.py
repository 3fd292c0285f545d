"""Kayvee log-line parsing and enrichment as pure column expressions.

Reproduces the observable semantics of the reference's parse stage
(`decode.ParseAndEnhance` as called from
/root/reference/alerts_consumer.go:55-63 and pinned by the fixtures in
/root/reference/alerts_consumer_test.go:21,58):

- wire shape: ``<RFC3339 ts> <hostname> <programname>[<pid>]: <body>``
- body is usually a JSON object (kayvee) but may be raw text (mongo
  slow-query lines) — both must flow through with ``rawlog`` set;
- ECS-style programname ``env--app/<urlencoded arn>`` yields
  ``container_env`` / ``container_app``;
- ``env`` defaults to the deploy env when the body doesn't carry one
  (pinned by the expected ``env:test-env`` tag,
  alerts_consumer_test.go:41);
- ``team`` falls back from the record field to ``_kvmeta.team``
  (alerts_consumer.go:86-89).

Spark-first design notes:

- The open ``map[string]interface{}`` record becomes ONE
  ``map<string,variant>`` column (Spark 4 VARIANT): dynamic key lookup
  with full JSON type fidelity (string vs number vs bool vs
  object/array/null), entirely JVM-side — no Python UDF anywhere on
  the hot path. ``schema_of_variant`` drives the reference's
  type-switch coercion (alerts_consumer.go:130-146) downstream.
- Everything here is a narrow projection: at 100 TB this stage is one
  whole-stage-codegen span over the source scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One capture group per syslog header component; body is the remainder.
# RFC3339(+nano) timestamp, hostname, programname (no spaces/brackets),
# numeric pid, ': ' separator.
SYSLOG_RE = r"^(\S+) (\S+) ([^\[ ]+)\[(\d+)\]: (.*)$"

# _kvmeta.routes wire schema (alerts_consumer_test.go:113-125; struct
# usage at global_routes.go:65-73). Non-"alerts" routes carry other
# keys (channel/message/...) that parse as nulls here — they're only
# needed for rule-name volume metrics, which use `rule`.
ROUTE_STRUCT = (
    "struct<type: string, series: string, dimensions: array<string>, "
    "stat_type: string, value_field: string, rule: string>"
)
KVMETA_SCHEMA = (
    "struct<_kvmeta: struct<team: string, kv_version: string, "
    f"kv_language: string, routes: array<{ROUTE_STRUCT}>>, "
    "team: string, env: string>"
)


_EMPTY_FIELDS = 'cast(map() as map<string,variant>)'


def parse_lines(
    df: DataFrame, line_col: str = "value", deploy_env: str = "production"
) -> DataFrame:
    """Parse raw syslog/kayvee lines into the engine's typed record.

    Output columns:
      line_ok boolean        — header matched (parse failures quarantine)
      timestamp timestamp    — syslog header time (null -> record error)
      hostname, programname, rawlog string
      container_env, container_app string — from ``env--app/...``
      env string             — body env, else deploy_env
      team string            — body team, else _kvmeta.team
      kvmeta                 — typed _kvmeta struct (routes array)
      fields map<string,variant> — the open JSON record
      num_bytes int          — raw line size (volume metrics input)
    """
    line = F.col(line_col)
    # regexp_extract returns '' on no-match; use rlike for validity.
    ok = line.rlike(SYSLOG_RE)

    df = df.select(
        line.alias("_raw"),
        ok.alias("line_ok"),
        F.regexp_extract(line, SYSLOG_RE, 1).alias("_ts_raw"),
        F.regexp_extract(line, SYSLOG_RE, 2).alias("hostname"),
        F.regexp_extract(line, SYSLOG_RE, 3).alias("programname"),
        F.regexp_extract(line, SYSLOG_RE, 5).alias("body"),
        F.octet_length(line).alias("num_bytes"),
    )

    df = df.withColumn("timestamp", F.expr("try_cast(_ts_raw as timestamp)"))
    df = df.withColumn("rawlog", F.col("body"))

    # ECS programname: env--app/<arn...>  ->  container_env, container_app
    prog_head = F.split(F.col("programname"), "/").getItem(0)
    has_sep = prog_head.contains("--")
    df = df.withColumn(
        "container_env",
        F.when(has_sep, F.split(prog_head, "--").getItem(0)).otherwise(F.lit("")),
    ).withColumn(
        "container_app",
        F.when(has_sep, F.split(prog_head, "--").getItem(1)).otherwise(F.lit("")),
    )

    # ONE JSON parse per record: the variant is materialized behind a
    # generator barrier, then both the typed kvmeta view (struct cast)
    # and the open map derive from it as binary-variant walks — no
    # from_json second parse, no whole-body schema_of_variant (that
    # built the full nested schema TEXT per record; try_cast to map is
    # the cheap object check). ``_kvmeta`` is dropped from the open map
    # mirroring the reference's ExtractKVMeta delete
    # (alerts_consumer.go:83 — extracted then discarded), which also
    # keeps the big nested object out of the per-field type dispatch.
    df = df.withColumn("_v", F.explode(F.array(F.expr("try_parse_json(body)"))))
    df = df.withColumn("kv", F.col("_v").cast(KVMETA_SCHEMA)).withColumn(
        "fields",
        F.map_filter(
            F.coalesce(
                F.expr("try_cast(_v as map<string,variant>)"),
                F.expr(_EMPTY_FIELDS),
            ),
            lambda k, v: k != "_kvmeta",
        ),
    ).drop("_v")

    df = (
        df.withColumn(
            "env", F.coalesce(F.col("kv.env"), F.lit(deploy_env))
        )
        # Reference (alerts_consumer.go:86-89): `team, _ :=
        # fields["team"].(string)` — the body team counts only when it
        # is string-TYPED and non-empty; numbers/bools/objects (which a
        # struct cast would stringify) and "" fall back to kvmeta.Team.
        .withColumn(
            "team",
            F.when(
                (
                    F.expr("schema_of_variant(try_element_at(fields, 'team'))")
                    == F.lit("STRING")
                )
                & (F.col("kv.team") != F.lit("")),
                F.col("kv.team"),
            ).otherwise(F.col("kv._kvmeta.team")),
        )
        .withColumn("kvmeta", F.col("kv._kvmeta"))
        .drop("kv", "_ts_raw")
    )
    return df
