"""Config-driven routing rules — the declarative form of the
reference's kvconfig.yml self-instrumentation routes (K3,
kvconfig.yml:1-28, loaded at main.go:40-49) and a generalization of
the three hard-coded global rules.

A rule is data, not code:

    RuleSpec(
        name="self-stats",
        matchers={"title": ["stats"], "via": ["process-metrics"]},
        series="kinesis-alerts-consumer.stats",
        dimensions=("Hostname", "env"),
        stat_type="counter",
        value_field=None,
    )

Matcher semantics follow the kayvee routing model the reference's
config uses: every matcher field must be a string field on the record
whose value is IN the allowed list (type-asserted like the Go rules —
non-string fields never match). The whole rule compiles to one
``when(cond, array(route))`` column, exactly like the built-in global
rules, so config rules and code rules compose in the same route
array and cost one narrow expression — no per-rule pass over the
data, no UDF, config-hot-reload = rebuild one column expression.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .fields import field_str
from .routing import ALERT_ROUTE, _route


def matcher_condition(matchers: Mapping[str, Sequence[str]]) -> Column:
    """Shared kvconfig matcher semantics (kvconfig.yml matchers block):
    every named field must be string-typed AND one of the allowed
    values. Used by both alert routes and notification rules so the
    two output types can never drift apart."""
    cond = F.lit(True)
    for fname, allowed in sorted(matchers.items()):
        f = field_str(fname)
        cond = cond & f.isNotNull() & f.isin(*[str(v) for v in allowed])
    return cond


@dataclass(frozen=True)
class RuleSpec:
    """One declarative routing rule (kvconfig.yml route analogue)."""

    name: str
    matchers: Mapping[str, Sequence[str]]
    series: str
    dimensions: tuple[str, ...] = ()
    stat_type: str = "counter"
    value_field: str | None = None

    def condition(self) -> Column:
        return matcher_condition(self.matchers)

    def route(self) -> Column:
        return _route(
            F.lit(self.series),
            list(self.dimensions),
            self.stat_type,
            self.value_field,
            self.name,
        )


def config_routes(specs: Sequence[RuleSpec]) -> Column:
    """All config rules as one array<route> column (empty when none
    match) — concat-able with the kvmeta/global route arrays."""
    empty = F.expr("array()").cast(f"array<{ALERT_ROUTE}>")
    if not specs:
        return empty
    arrays = [
        F.when(s.condition(), F.array(s.route())).otherwise(empty) for s in specs
    ]
    return F.concat(*arrays)


def with_config_routes(df: DataFrame, specs: Sequence[RuleSpec]) -> DataFrame:
    """Append config-rule routes to an existing ``routes`` column
    (after :func:`..operators.routing.with_routes`)."""
    if not specs:
        return df
    df = df.withColumn("routes", F.concat(F.col("routes"), config_routes(specs)))
    return df.withColumn("ignored", F.size("routes") <= 0)


# --------------------------------------------- notifications output


_INTERP_RE = re.compile(r"%\{([^}]+)\}")


@dataclass(frozen=True)
class NotificationRuleSpec:
    """One ``type: notifications`` route (kvconfig.yml:14-20: matcher
    -> channel / icon / user / message).

    The message template supports kayvee-router ``%{field}``
    interpolation: each token resolves against the record's merged
    field map (string-typed fields only, like every other matcher /
    dimension lookup — see :func:`..operators.fields.field_str`); a
    missing or non-string field interpolates as the empty string.
    The template is split ONCE at rule-compile time into literal
    segments and field lookups, so the per-record cost is a single
    codegen ``concat`` — no regex, no UDF.
    """

    name: str
    matchers: Mapping[str, Sequence[str]]
    channel: str
    message: str
    user: str = "kinesis-alerts-consumer"
    icon: str = ":ghost:"

    def condition(self) -> Column:
        return matcher_condition(self.matchers)

    def message_col(self) -> Column:
        parts: list[Column] = []
        pos = 0
        for m in _INTERP_RE.finditer(self.message):
            if m.start() > pos:
                parts.append(F.lit(self.message[pos : m.start()]))
            parts.append(F.coalesce(field_str(m.group(1)), F.lit("")))
            pos = m.end()
        if pos < len(self.message):
            parts.append(F.lit(self.message[pos:]))
        if not parts:
            return F.lit("")
        return F.concat(*parts)

    def row(self) -> Column:
        return F.struct(
            F.lit(self.name).alias("rule"),
            F.lit(self.channel).alias("channel"),
            F.lit(self.icon).alias("icon"),
            F.lit(self.user).alias("user"),
            self.message_col().alias("message"),
        )


def notification_rows(
    df: DataFrame, specs: Sequence[NotificationRuleSpec]
) -> DataFrame:
    """Project matching records through notification rules: one output
    row per (record, matching rule) with columns
    ``rule, channel, icon, user, message`` — the sink-table shape for
    the reference's Slack-style notification output. One narrow pass:
    all rules compile into a single array of conditional structs,
    nulls compacted out, exploded. Records matching no rule vanish in
    the explode (no null-row handling, no shuffle)."""
    structs = [
        F.when(s.condition(), s.row()).otherwise(F.lit(None)) for s in specs
    ]
    arr = F.array_compact(F.array(*structs))
    return df.select(F.explode(arr).alias("n")).select("n.*")


# The reference's own kvconfig.yml routes, re-declared (kvconfig.yml:
# title=stats -> counter series; error-sending-to-cloudwatch ->
# counter; failed-sending-volumes -> notification (no metric route)).
SELF_INSTRUMENTATION_RULES: tuple[RuleSpec, ...] = (
    RuleSpec(
        name="self-stats",
        matchers={"title": ["stats"]},
        series="kinesis-alerts-consumer.stats",
        dimensions=("Hostname", "env"),
        stat_type="counter",
    ),
    RuleSpec(
        name="self-cw-errors",
        matchers={"title": ["error-sending-to-cloudwatch"]},
        series="kinesis-alerts-consumer.cloudwatch-errors",
        dimensions=("Hostname", "env"),
        stat_type="counter",
    ),
)


# kvconfig.yml:12-20 (`log-volume-send-failure`): the one notifications
# route the reference ships — previously documented-but-dropped (the
# alerts consumer only pulls AlertRoutes); now compiled first-class.
SELF_NOTIFICATION_RULES: tuple[NotificationRuleSpec, ...] = (
    NotificationRuleSpec(
        name="log-volume-send-failure",
        matchers={"title": ["failed-sending-volumes"]},
        channel="#eng-infra-alerts-minor",
        icon=":signalfx:",
        user="kinesis-alerts-consumer",
        message="Error sending log volumes: ```%{error}```",
    ),
)
