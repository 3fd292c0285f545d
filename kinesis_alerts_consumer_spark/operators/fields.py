"""Typed field resolution for the open (dynamic) record.

The reference reads fields from one merged ``map[string]interface{}``
(JSON body + syslog-derived + rule-derived fields) with a type switch
per access (alerts_consumer.go:130-146). The engine materializes that
merged view ONCE per record as

    fields_typed: map<string, struct<s,d,b,kind>>

(kind ∈ string|double|bool|other) by (a) running the variant type
dispatch over every body field in a single ``transform_values`` pass
and (b) ``map_concat``-ing the engine-materialized columns (syslog
header fields, mongo-rule derivations) over it — LAST_WIN dedup makes
the engine columns take precedence, mirroring the reference's merge
order. Every downstream dimension/value lookup is then one
``element_at`` instead of a per-lookup type-dispatch chain: the
higher-order route-eval expressions are interpreted (lambda
expressions are CodegenFallback), so shrinking per-lookup expression
size is the main throughput lever on the hot path.

``explode(array(...))`` wraps the map construction as a generator
barrier — CollapseProject would otherwise inline a full copy of the
dispatch into every referencing output column (observed: 1 GiB driver
heap exhausted at 10k rows before the barrier existed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Engine-known record fields -> backing column. The parse/enrich stage
# and the mongo rule materialize these as real columns; everything else
# resolves against the body variant map. "Hostname" is the reference's
# capitalized backfill of "hostname" (alerts_consumer.go:105-109).
STRING_FIELDS = {
    "Hostname": "hostname",
    "hostname": "hostname",
    "env": "env",
    "programname": "programname",
    "container_env": "container_env",
    "container_app": "container_app",
    "team": "team",
    "rawlog": "rawlog",
    "operation": "operation",
    "namespace": "namespace",
}
DOUBLE_FIELDS = {"millis": "millis"}
BOOL_FIELDS = {"is_collscan": "is_collscan"}


def res(s=None, d=None, b=None, kind="missing") -> Column:
    return F.struct(
        (s if s is not None else F.lit(None).cast("string")).alias("s"),
        (d if d is not None else F.lit(None).cast("double")).alias("d"),
        (b if b is not None else F.lit(None).cast("boolean")).alias("b"),
        F.lit(kind).alias("kind") if isinstance(kind, str) else kind.alias("kind"),
    )


def _typed(v: Column) -> Column:
    """One variant value -> typed struct<s,d,b,kind> (the reference's
    type switch, alerts_consumer.go:130-146)."""
    sch = F.schema_of_variant(v)
    return (
        F.when(sch == "STRING", res(s=v.cast("string"), kind="string"))
        .when(sch == "BOOLEAN", res(b=v.cast("boolean"), kind="bool"))
        .when(
            sch.rlike("^(BIGINT|INT|SMALLINT|TINYINT|DOUBLE|FLOAT|DECIMAL)"),
            res(d=v.cast("double"), kind="double"),
        )
        # OBJECT / ARRAY / VOID(JSON null): reference errors on these.
        # s stays NULL here — casting a whole nested object to its JSON
        # text per record measurably slowed the hot path (~20% on the
        # kv01 pipeline); the quarantine error message re-fetches the
        # text lazily from the raw `fields` map instead (CASE branches
        # evaluate only when matched).
        .otherwise(res(kind=F.lit("other")))
    )


def _known_map() -> Column:
    """Engine-materialized columns as a typed map (null column ==
    absent field, e.g. mongo derivations on non-mongo records —
    filtered out so they don't shadow body fields)."""
    entries: list[Column] = []
    for field, col_name in STRING_FIELDS.items():
        c = F.col(col_name)
        entries += [
            F.lit(field),
            F.when(c.isNotNull(), res(s=c, kind="string")).otherwise(res()),
        ]
    for field, col_name in DOUBLE_FIELDS.items():
        c = F.col(col_name)
        entries += [
            F.lit(field),
            F.when(c.isNotNull(), res(d=c, kind="double")).otherwise(res()),
        ]
    for field, col_name in BOOL_FIELDS.items():
        c = F.col(col_name)
        entries += [
            F.lit(field),
            F.when(c.isNotNull(), res(b=c, kind="bool")).otherwise(res()),
        ]
    return F.map_filter(
        F.create_map(*entries), lambda k, v: v.getField("kind") != "missing"
    )


def _typed_fields_expr() -> Column:
    typed = F.transform_values(F.col("fields"), lambda k, v: _typed(v))
    merged = F.map_concat(typed, _known_map())
    return F.explode(F.array(merged))


def with_typed_fields(df: DataFrame) -> DataFrame:
    """Materialize ``fields_typed`` (body variant dispatch ⊕ known
    columns, known winning) behind a generator barrier. Requires the
    session conf ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (pinned in
    session.RUNTIME_CONFS)."""
    from .util import memo_expr

    return df.withColumn(
        "fields_typed", memo_expr("fields.typed_fields", _typed_fields_expr)
    )


def resolve_field(name: Column) -> Column:
    """Field name -> typed struct<s,d,b,kind> ('missing' when absent).
    One map lookup; requires :func:`with_typed_fields` upstream."""
    return F.coalesce(
        F.element_at(F.col("fields_typed"), F.coalesce(name, F.lit(""))), res()
    )


def field_str(name: str) -> Column:
    """Field as string iff its JSON type is string (Go type assert
    ``fields[k].(string)`` — non-strings behave as absent)."""
    e = F.element_at(F.col("fields_typed"), name)
    return F.when(e.getField("kind") == "string", e.getField("s"))
