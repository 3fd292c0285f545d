"""Per-route projection: dimension coercion, value resolution, metric
construction, partition-tag assignment, and per-record quarantine —
reference ``encodeMessage`` (alerts_consumer.go:104-231) re-expressed
as one whole-stage-codegen projection.

Key reproduced semantics (citations into /root/reference):

- dim lookup & coercion (alerts_consumer.go:130-146): string as-is;
  JSON number via ``%.0f`` (3.2 -> "3"); bool -> "true"/"false";
  MISSING field -> dim silently skipped; any other JSON type -> the
  whole record errors (quarantine row here, exception there).
  Documented divergence: Go ``%.0f`` rounds half-even, Java
  ``format_string`` HALF_UP — differs only at exact .5 values
  (SURVEY.md §4; pinned in tests).
- value resolution (alerts_consumer.go:157-192): JSON float ok;
  present-but-not-float errors (even numeric strings, test :230-255);
  missing -> counter 1 / gauge 0; unknown stat_type errors.
- DD series (alerts_consumer.go:194-204): ``kv.<series>``, type
  count|gauge, one point (epoch seconds, value); tags in route-dim
  order (kvmeta dims then Hostname, env — test :36-48).
- CW datum (alerts_consumer.go:206-223): allowlisted series only,
  dims minus the default dims, StorageResolution 1; requires a string
  ``region`` (else ``pod-region``) field, which also becomes the
  record's partition tag; otherwise tag stays "default" (:122-124).
- error precedence: no routes -> ignored (checked before anything,
  :101-103); unparseable timestamp (:111-114); then per route: first
  bad dim, wrong-typed value, invalid stat_type — first route wins.

Scale notes: the whole evaluation runs BEFORE ``explode`` via
higher-order array functions, so per-record error semantics need no
groupBy-after-explode shuffle; quarantine/ignore splits are plain
filters on the same narrow projection. Dynamic-typed field access is
Spark-4 VARIANT (``schema_of_variant`` type dispatch) — JVM-side, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .allowlist import CLOUDWATCH_ALLOWLIST
from .fields import resolve_field, with_typed_fields
from .routing import DEFAULT_DIMENSIONS
from .util import memo_expr

_resolve = resolve_field


def _coerce_tag_value(r: Column) -> Column:
    """Typed dim value -> tag string (alerts_consumer.go:134-140)."""
    return (
        F.when(r.getField("kind") == "string", r.getField("s"))
        .when(
            r.getField("kind") == "double",
            F.format_string("%.0f", r.getField("d")),
        )
        .when(
            r.getField("kind") == "bool",
            F.when(r.getField("b"), F.lit("true")).otherwise(F.lit("false")),
        )
    )


def _eval_route(r: Column) -> Column:
    """Evaluate one route against the record -> struct with dd/cw rows
    and an error slot (null = ok)."""
    dims = F.transform(
        F.coalesce(r.getField("dimensions"), F.expr("array()").cast("array<string>")),
        lambda d: F.struct(d.alias("name"), _resolve(d).alias("r")),
    )
    present = F.filter(dims, lambda x: x.getField("r").getField("kind") != "missing")
    bad_dims = F.filter(
        dims, lambda x: x.getField("r").getField("kind") == "other"
    )
    tags = F.transform(
        present,
        lambda x: F.concat(
            x.getField("name"), F.lit(":"), _coerce_tag_value(x.getField("r"))
        ),
    )
    cw_dims = F.transform(
        F.filter(
            present,
            lambda x: ~x.getField("name").isin(*DEFAULT_DIMENSIONS)
            & (x.getField("r").getField("kind") != "other"),
        ),
        lambda x: F.struct(
            x.getField("name").alias("name"),
            _coerce_tag_value(x.getField("r")).alias("value"),
        ),
    )

    vres = _resolve(r.getField("value_field"))
    vkind = vres.getField("kind")
    stat = r.getField("stat_type")

    error = (
        F.when(
            F.size(bad_dims) > 0,
            F.concat(
                F.lit("error casting dimension value. rule="),
                F.coalesce(r.getField("rule"), F.lit("")),
                F.lit(" dim="),
                F.try_element_at(bad_dims, F.lit(1)).getField("name"),
                F.lit(" val="),
                # 'other'-kind values carry no pre-rendered text (see
                # fields._typed); fetch the JSON text lazily from the
                # raw variant map — this branch only evaluates for
                # quarantined records.
                F.coalesce(
                    F.try_element_at(bad_dims, F.lit(1)).getField("r").getField("s"),
                    F.try_element_at(
                        F.col("fields"),
                        F.try_element_at(bad_dims, F.lit(1)).getField("name"),
                    ).cast("string"),
                    F.lit("<nil>"),
                ),
            ),
        )
        .when(
            vkind.isin("string", "bool", "other"),
            F.concat(
                F.lit("value exists but is wrong type. rule="),
                F.coalesce(r.getField("rule"), F.lit("")),
                F.lit(" value_field="),
                F.coalesce(r.getField("value_field"), F.lit("")),
                F.lit(" value="),
                # Go fmt %s: string as-is, bool true/false, nil "<nil>";
                # variant OBJECT/ARRAY render as their JSON text
                # (documented formatting divergence from Go's map/slice
                # rendering — SURVEY.md §4).
                F.coalesce(
                    vres.getField("s"),
                    F.when(vres.getField("b").isNotNull(),
                           F.when(vres.getField("b"), F.lit("true"))
                           .otherwise(F.lit("false"))),
                    # lazy JSON text for 'other'-kind values (see above)
                    F.try_element_at(
                        F.col("fields"), r.getField("value_field")
                    ).cast("string"),
                    F.lit("<nil>"),
                ),
            ),
        )
        .when(
            ~stat.isin("counter", "gauge"),
            F.concat(F.lit("invalid StatType: "), F.coalesce(stat, F.lit(""))),
        )
    )

    value = F.when(
        stat == "counter", F.coalesce(vres.getField("d"), F.lit(1.0))
    ).otherwise(F.coalesce(vres.getField("d"), F.lit(0.0)))
    mtype = F.when(stat == "counter", F.lit("count")).otherwise(F.lit("gauge"))

    allowlisted = r.getField("series").isin(*sorted(CLOUDWATCH_ALLOWLIST))

    return F.struct(
        F.concat(F.lit("kv."), r.getField("series")).alias("metric"),
        mtype.alias("mtype"),
        tags.alias("tags"),
        value.alias("value"),
        r.getField("series").alias("series"),
        cw_dims.alias("cw_dims"),
        allowlisted.alias("allowlisted"),
        error.alias("error"),
    )


def project_routes(df: DataFrame) -> DataFrame:
    """Record-with-routes -> evaluated metrics + tag + error columns.

    Adds: ``evaled`` (array of per-route results), ``error`` (record
    level, null = clean), ``tag`` (partition key), ``dd_metrics``,
    ``cw_metrics``. Input must carry parse_lines + with_routes columns.

    ``evaled`` is wrapped in an ``explode(array(...))`` generator
    barrier so the (large) per-route evaluation expression runs once
    per record — without it CollapseProject inlines a full copy into
    error/tag/dd_metrics/cw_metrics each (see ``with_typed_fields``).
    """
    if "fields_typed" not in df.columns:
        df = with_typed_fields(df)
    df = df.withColumn(
        "evaled",
        memo_expr(
            "project.evaled",
            lambda: F.explode(
                F.array(F.transform(F.col("routes"), _eval_route))
            ),
        ),
    )
    df = df.withColumn("ignored", F.col("ignored") & F.col("line_ok"))
    df = df.withColumns(memo_expr("project.disposition", _disposition_exprs))
    return df.withColumns(memo_expr("project.metrics", _metric_exprs))


def _disposition_exprs() -> dict[str, Column]:
    first_err = F.try_element_at(
        F.filter(F.col("evaled"), lambda e: e.getField("error").isNotNull()), F.lit(1)
    )

    # region/pod-region must be JSON strings (Go .(string) assertion,
    # alerts_consumer.go:214-219).
    region = F.when(
        F.schema_of_variant(F.col("fields").getItem("region")) == "STRING",
        F.col("fields").getItem("region").cast("string"),
    )
    pod_region = F.when(
        F.schema_of_variant(F.col("fields").getItem("pod-region")) == "STRING",
        F.col("fields").getItem("pod-region").cast("string"),
    )
    cw_bound = F.exists(F.col("evaled"), lambda e: e.getField("allowlisted"))

    return {
        # Error precedence mirrors the reference: parse failure
        # (ProcessMessage -> ParseAndEnhance error, alerts_consumer.go:57-60)
        # precedes the ignore check (:101-103), which precedes the
        # timestamp check (:111-114), then the per-route errors.
        "error": (
            F.when(~F.col("line_ok"), F.lit("failed to parse log line"))
            .when(F.col("ignored"), F.lit(None).cast("string"))
            .when(
                F.col("timestamp").isNull(),
                F.lit("unable parse Time from message's 'timestamp' field"),
            )
            .otherwise(first_err.getField("error"))
        ),
        "_region": region,
        "_pod_region": pod_region,
        "tag": (
            F.when(cw_bound & region.isNotNull(), region)
            .when(cw_bound & pod_region.isNotNull(), pod_region)
            .otherwise(F.lit("default"))
        ),
    }


def _metric_exprs() -> dict[str, Column]:
    ok = F.col("error").isNull() & ~F.col("ignored")
    epoch = F.unix_timestamp(F.col("timestamp"))
    return {
        "dd_metrics": F.when(
            ok,
            F.transform(
                F.col("evaled"),
                lambda e: F.struct(
                    e.getField("metric").alias("metric"),
                    e.getField("mtype").alias("mtype"),
                    e.getField("tags").alias("tags"),
                    epoch.alias("ts"),
                    e.getField("value").alias("value"),
                ),
            ),
        ),
        "cw_metrics": F.when(
            ok & (F.col("_region").isNotNull() | F.col("_pod_region").isNotNull()),
            F.transform(
                F.filter(F.col("evaled"), lambda e: e.getField("allowlisted")),
                lambda e: F.struct(
                    e.getField("series").alias("metric_name"),
                    e.getField("cw_dims").alias("dimensions"),
                    e.getField("value").alias("value"),
                    F.col("timestamp").alias("ts"),
                    F.lit(1).alias("storage_resolution"),
                ),
            ),
        ).otherwise(F.expr("array()").cast(
            "array<struct<metric_name: string, dimensions: array<struct<name: string, value: string>>, "
            "value: double, ts: timestamp, storage_resolution: int>>"
        )),
    }


def encode_output(df: DataFrame) -> DataFrame:
    """Per-record ``EncodeOutput`` JSON envelope — the reference's
    serialized hop between the project stage and the batch sink
    (alerts_consumer.go:65-68, 226-231: ``{DDMetrics, CWMetrics}``
    marshalled per record, unmarshalled+concatenated in SendBatch).

    Spark doesn't need the serialize/deserialize hop (the DataFrame IS
    the envelope — SURVEY.md §1.4), so this exists as an export/interop
    format: one JSON line per clean routed record plus its partition
    tag, byte-compatible with what a reference-side consumer expects.
    """
    c = clean(df)
    return c.select(
        F.col("tag"),
        F.to_json(
            F.struct(
                F.col("dd_metrics").alias("DDMetrics"),
                F.col("cw_metrics").alias("CWMetrics"),
            )
        ).alias("encoded"),
    )


def clean(df: DataFrame) -> DataFrame:
    """Routed records that projected without error."""
    return df.filter(~F.col("ignored") & F.col("error").isNull())


def quarantine(df: DataFrame) -> DataFrame:
    """The engine's DLQ: records the reference fails with a Go error
    (FIXTURES.md §2.4 quarantine rows)."""
    return df.filter(F.col("error").isNotNull()).select(
        "_raw", "timestamp", "error", "tag"
    )


def dd_points(df: DataFrame) -> DataFrame:
    """Explode clean records into one row per Datadog series point."""
    return clean(df).select(
        "tag", F.explode("dd_metrics").alias("m")
    ).select(
        "tag",
        F.col("m.metric").alias("metric"),
        F.col("m.mtype").alias("mtype"),
        F.col("m.tags").alias("tags"),
        F.col("m.ts").alias("ts"),
        F.col("m.value").alias("value"),
    )


def cw_data(df: DataFrame) -> DataFrame:
    """Explode clean records into one row per CloudWatch datum."""
    return clean(df).select("tag", F.explode("cw_metrics").alias("m")).select(
        "tag",
        F.col("m.metric_name").alias("metric_name"),
        F.col("m.dimensions").alias("dimensions"),
        F.col("m.value").alias("value"),
        F.col("m.ts").alias("ts"),
        F.col("m.storage_resolution").alias("storage_resolution"),
    )
