"""End-to-end record pipeline (batch form): parse -> enrich -> route ->
project -> split (clean / quarantine / ignored).

This is the reference's ``ProcessMessage`` hot path
(/root/reference/alerts_consumer.go:55-231) as one declarative plan:
a single narrow projection chain Catalyst fuses into one
whole-stage-codegen span — the streaming wrapper in
:mod:`.streaming.pipeline` reuses it unchanged via ``foreachBatch`` /
direct stream transformation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .functions.kayvee import parse_lines
from .operators.project import (
    cw_data,
    dd_points,
    project_routes,
    quarantine,
)
from .operators.routing import with_routes


def process_lines(
    df: DataFrame, line_col: str = "value", deploy_env: str = "production"
) -> DataFrame:
    """Raw-line DataFrame -> fully projected record DataFrame with
    ``dd_metrics``/``cw_metrics``/``tag``/``error``/``ignored``."""
    return project_routes(with_routes(parse_lines(df, line_col, deploy_env)))


__all__ = [
    "process_lines",
    "dd_points",
    "cw_data",
    "quarantine",
]
