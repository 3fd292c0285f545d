"""Scalar column-expression helpers (no UDFs in the hot path)."""

from .kayvee import (
    KVMETA_SCHEMA,
    ROUTE_STRUCT,
    parse_lines,
)

__all__ = ["KVMETA_SCHEMA", "ROUTE_STRUCT", "parse_lines"]
