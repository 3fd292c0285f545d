"""Declared query surface: oracle-checked queries over the fixture tables."""

from .declared import DECLARED_QUERIES, ORACLE_OVERRIDES, oracle_sql_for, run_declared

__all__ = ["DECLARED_QUERIES", "ORACLE_OVERRIDES", "oracle_sql_for", "run_declared"]
