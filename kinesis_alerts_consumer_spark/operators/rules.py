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

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .fields import field_str
from .routing import ALERT_ROUTE, _route


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
        cond = F.lit(True)
        for fname, allowed in sorted(self.matchers.items()):
            f = field_str(fname)
            cond = cond & f.isNotNull() & f.isin(*[str(v) for v in allowed])
        return cond

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
